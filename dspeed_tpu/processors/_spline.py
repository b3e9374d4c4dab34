"""Natural cubic spline second-derivative solver, scan-parallel.

The reference computes natural-spline second derivatives with a sequential
Numerical-Recipes-style tridiagonal sweep inside numba kernels
(``fixed_time_pickoff.py:104-117``, ``upsampler.py:176-199``). For unit sample
spacing the sweep's pivot coefficients are data-independent, so they are
precomputed on the host; the data-dependent forward/backward substitutions are
first-order affine recurrences evaluated with log-depth
``associative_scan`` — fully parallel on the TPU VPU.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["natural_spline_w2", "affine_recurrence"]


def _affine_combine(a, b):
    (m1, v1), (m2, v2) = a, b
    return m1 * m2, v2 + m2 * v1


def affine_recurrence(mult, add, reverse: bool = False):
    """Solve ``y[i] = mult[i] * y[i-1] + add[i]`` with ``y[-1] = 0``.

    ``mult`` may be a 1-D (per-position) array broadcast over the batch dims
    of ``add``. With ``reverse=True`` the recurrence runs right-to-left.
    """
    mult = jnp.broadcast_to(mult, add.shape)
    _, y = jax.lax.associative_scan(
        _affine_combine, (mult, add), axis=add.ndim - 1, reverse=reverse
    )
    return y


def natural_spline_w2(w, dtype=None):
    """Second derivatives of the natural cubic spline through ``w`` (unit dx).

    Follows the reference recursion exactly:
      p[i] = 0.5*c[i-1] + 2 ;  c[i] = -0.5/p[i]        (host, data-independent)
      u[i] = (3*(w[i+1]-2w[i]+w[i-1]) - 0.5*u[i-1]) / p[i]
      w2[n-1] = 0 ;  w2[i] = c[i]*w2[i+1] + u[i]
    with w2[0] = u[0] = 0 (natural boundary).
    """
    n = w.shape[-1]
    if dtype is None:
        dtype = w.dtype
    w = w.astype(dtype)

    # host: pivot coefficients c[i] (converge geometrically to sqrt(3)-2)
    c = np.zeros(n, dtype=np.float64)
    p = np.full(n, np.inf, dtype=np.float64)
    for i in range(1, n - 1):
        p[i] = 0.5 * c[i - 1] + 2.0
        c[i] = -0.5 / p[i]

    d2 = jnp.zeros_like(w)
    if n > 2:
        inner = w[..., 2:] - 2.0 * w[..., 1:-1] + w[..., :-2]
        d2 = d2.at[..., 1:-1].set(inner)

    a_fwd = jnp.asarray(np.where(np.isfinite(p), -0.5 / p, 0.0), dtype)
    b_fwd = jnp.asarray(np.where(np.isfinite(p), 3.0 / p, 0.0), dtype)
    u = affine_recurrence(a_fwd, b_fwd * d2)

    # backward substitution; force the natural boundaries
    cj = jnp.asarray(c, dtype)
    w2 = affine_recurrence(cj, u, reverse=True)
    w2 = w2.at[..., 0].set(0.0).at[..., n - 1].set(0.0)
    return w2
