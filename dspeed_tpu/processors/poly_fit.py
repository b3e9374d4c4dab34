"""Polynomial fits (reference ``dspeed/processors/poly_fit.py``).

``poly_fit`` is a factory: the normal-equation matrix inverse is precomputed
host-side once per configuration (``poly_fit.py:35``); the runtime is a
moment accumulation (one matmul against a Vandermonde) plus a tiny matvec.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ._helpers import isnan_any, nanmask
from ._kernel import Kernel, kernel

__all__ = ["poly_fit", "poly_diff", "poly_exp_rms"]


def poly_fit(length, deg) -> Kernel:
    """Fit the first ``length`` samples to a degree-``deg`` polynomial."""
    length = int(length)
    deg = int(deg)
    i = np.arange(length, dtype="float64")
    vals = np.array([np.sum(i**j) for j in range(2 * deg + 1)])
    mat = np.stack([vals[j : deg + 1 + j] for j in range(deg + 1)])
    inv = np.linalg.inv(mat)
    vander = np.stack([i**j for j in range(deg + 1)], axis=-1)  # (n, m)

    def fn(w_in):
        import jax

        hp = jax.lax.Precision.HIGHEST
        acc = jnp.einsum(
            "...n,nm->...m", w_in.astype(jnp.float64 if w_in.dtype == jnp.float64 else jnp.float32),
            jnp.asarray(vander, w_in.dtype), precision=hp,
        )
        pars = jnp.einsum(
            "km,...m->...k", jnp.asarray(inv, w_in.dtype), acc, precision=hp
        )
        return nanmask(isnan_any(w_in, 1), pars.astype(w_in.dtype))

    return Kernel(fn, "(n)->(m)", ["f->f", "d->d"], name="poly_fitter")


def _poly_eval(pars, n):
    i = jnp.arange(n, dtype=pars.dtype)
    powers = jnp.stack([i**j for j in range(pars.shape[-1])], axis=-1)
    return jnp.einsum("nm,...m->...n", powers, pars)


@kernel("(n),(m)->(),()", ["ff->ff", "dd->dd"])
def poly_diff(w_in, poly_pars):
    """Mean/rms of the residual vs a polynomial (reference ``poly_fit.py:82``;
    the "mean" is the reference's ``sum(residual[i]/(i+1))`` accumulation)."""
    n = w_in.shape[-1]
    resid = w_in - _poly_eval(jnp.asarray(poly_pars, w_in.dtype), n)
    harm = 1.0 / (jnp.arange(n, dtype=w_in.dtype) + 1.0)
    mean = jnp.sum(resid * harm, axis=-1)
    rms = jnp.sqrt(jnp.sum(resid**2, axis=-1) / (n - 1))
    bad = isnan_any(w_in, 1) | isnan_any(poly_pars, 1)
    return nanmask(bad, mean), nanmask(bad, rms)


@kernel("(n),(m)->(),()", ["ff->ff", "dd->dd"])
def poly_exp_rms(w_in, poly_pars):
    """Mean/rms of the residual vs exp(polynomial)
    (reference ``poly_fit.py:119``)."""
    n = w_in.shape[-1]
    resid = w_in - jnp.exp(_poly_eval(jnp.asarray(poly_pars, w_in.dtype), n))
    harm = 1.0 / (jnp.arange(n, dtype=w_in.dtype) + 1.0)
    mean = jnp.sum(resid * harm, axis=-1)
    rms = jnp.sqrt(jnp.sum(resid**2, axis=-1) / (n - 1))
    bad = isnan_any(w_in, 1) | isnan_any(poly_pars, 1)
    return nanmask(bad, mean), nanmask(bad, rms)

# generic row-tile fusion (r5 audit): elementwise/reduce/small-matmul bodies
# with no scans, sorts, FFTs or per-row dynamic gathers — Mosaic-lowerable;
# the two-tile probe compile still guards every group at trace time
poly_diff.tile_safe = True
poly_exp_rms.tile_safe = True
