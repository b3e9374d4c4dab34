"""Generic IIR filter (reference ``dspeed/processors/recursive_filter.py:21``).

TPU-native reformulation: the numerator (feedforward) is a plain FIR
convolution with ``init_in`` left-padding; the denominator recursion
``y[i] = u[i] - c·y[i-1..i-d]`` becomes a log-depth
``lax.associative_scan`` over (companion-matrix, input-vector) affine pairs —
the order-d generalization of :func:`.._numerics.iir_first_order`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask
from ._kernel import kernel

__all__ = ["recursive_filter", "iir_companion"]


_HI = None


def _highest():
    global _HI
    if _HI is None:
        _HI = jax.lax.Precision.HIGHEST
    return _HI


def _affine_mat_combine(x, y):
    (m1, v1), (m2, v2) = x, y
    m = jnp.einsum("...ij,...jk->...ik", m2, m1, precision=_highest())
    v = v2 + jnp.einsum("...ij,...j->...i", m2, v1, precision=_highest())
    return m, v


def iir_companion(u, c, init_state):
    """Solve ``y[i] = u[i] - sum_j c[j] * y[i-1-j]`` along the last axis.

    ``c`` has shape ``(..., d)``; ``init_state`` is ``[y[-1], ..., y[-d]]``
    shaped ``(..., d)``. Runs at the accumulation dtype of ``u``.
    """
    *lead, n = u.shape
    c = jnp.asarray(c, u.dtype)
    d = c.shape[-1]
    if d == 0:
        return u

    # companion matrix A: top row -c, subdiagonal shift
    top = -c[..., None, :]
    sub = jnp.broadcast_to(
        jnp.eye(d, k=0, dtype=u.dtype)[:-1], (*c.shape[:-1], d - 1, d)
    )
    A = jnp.concatenate([top, sub], axis=-2)  # (..., d, d)

    As = jnp.broadcast_to(A, (n, *lead, d, d))
    vs = jnp.zeros((n, *lead, d), u.dtype)
    vs = vs.at[..., 0].set(jnp.moveaxis(u, -1, 0))

    M, V = jax.lax.associative_scan(_affine_mat_combine, (As, vs), axis=0)
    s0 = jnp.asarray(init_state, u.dtype)
    y = jnp.einsum(
        "n...j,...j->n...", M[..., 0, :], s0, precision=_highest()
    ) + V[..., 0]
    return jnp.moveaxis(y, 0, -1)


def _accum_dtype(dtype):
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def recursive_filter_impl(w_in, a, b, init_in, init_out):
    """Batched recursive-filter body shared with the iir_filter factories."""
    n = w_in.shape[-1]
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    p = a.shape[-1]
    q = b.shape[-1]
    if q == 0:
        raise DSPFatal("b cannot be scalar")
    if n <= q:
        raise DSPFatal(
            f"The length of the waveform must be larger than {q} for the "
            f"filter to work safely"
        )
    acc = _accum_dtype(w_in.dtype)
    w = jnp.asarray(w_in, acc)
    af = jnp.asarray(a, acc)
    bf = jnp.asarray(b, acc)
    init_in_v = jnp.asarray(init_in, acc)
    init_out_v = jnp.asarray(init_out, acc)

    # feedforward: u[i] = sum_j a[j] * (w[i-j], init_in for i-j < 0)
    if init_in_v.ndim:
        pad_block = jnp.broadcast_to(
            init_in_v[..., None], (*w.shape[:-1], p - 1)
        ) if p > 1 else w[..., :0]
    else:
        pad_block = jnp.full((*w.shape[:-1], p - 1), init_in_v, acc)
    wp = jnp.concatenate([pad_block, w], axis=-1) if p > 1 else w
    if p == 1:
        u = af[..., :1] * w if af.ndim else af * w
    else:
        # XLA conv computes correlation: reverse taps to convolve
        lhs = wp.reshape(-1, 1, wp.shape[-1])
        rhs = af[::-1].reshape(1, 1, p) if af.ndim == 1 else None
        if rhs is not None:
            u = jax.lax.conv_general_dilated(
                lhs, rhs, (1,), [(0, 0)],
                dimension_numbers=("NCH", "OIH", "NCH"),
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(*w.shape[:-1], n)
        else:
            # per-event taps: explicit gather-free sliding dot
            idx = jnp.arange(n)[:, None] + jnp.arange(p)[None, :]
            u = jnp.einsum(
                "...nj,...j->...n", wp[..., idx], af[..., ::-1],
                precision=_highest(),
            )

    b0 = bf[..., 0] if bf.ndim else bf
    c = bf[..., 1:] / b0[..., None] if bf.ndim else jnp.zeros((0,), acc)
    u = u / (b0[..., None] if getattr(b0, "ndim", 0) else b0)

    d = q - 1
    if d == 0:
        y = u
    else:
        if init_out_v.ndim:
            s0 = jnp.broadcast_to(init_out_v[..., None], (*w.shape[:-1], d))
        else:
            s0 = jnp.full((*w.shape[:-1], d), init_out_v, acc)
        y = iir_companion(u, c, s0)
    out = y.astype(w_in.dtype)
    bad = (
        isnan_any(w_in, 1)
        | bool(np.any(np.isnan(np.asarray(a))))
        if isinstance(a, np.ndarray)
        else isnan_any(w_in, 1)
    )
    bad = bad | isnan_any(jnp.asarray(init_in)) | isnan_any(jnp.asarray(init_out))
    return nanmask(bad, out)


@kernel("(n),(p),(q),(),()->(n)", ["fddff->f", "ddddd->d"])
def recursive_filter(w_in, a, b, init_in, init_out):
    """Apply a recursive (IIR) filter with feedforward ``a`` and feedback
    ``b`` polynomial coefficients, padding the start with ``init_in`` /
    ``init_out`` (reference ``recursive_filter.py:21``)."""
    return recursive_filter_impl(w_in, a, b, init_in, init_out)
