"""Linear baseline fits (reference ``dspeed/processors/linear_slope_fit.py``).

The reference runs Welford's method plus accumulated regression sums per
sample (:19 ``linear_slope_fit``, :101 ``linear_slope_diff``). Closed-form
moments are mathematically identical; the index sums are evaluated exactly on
the host and the data sums with high-precision dots (float64 or float32 with
HIGHEST matmul precision, per the accumulation policy).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import config
from ._helpers import cdim, isnan_any, nanmask
from ._kernel import kernel

__all__ = ["linear_slope_fit", "linear_slope_diff"]


def _acc_dtype(dtype):
    return jnp.float64 if config.accum_mode() == "f64" else jnp.float32


def _sums(w):
    """Return (sum_y, sum_xy) with high-precision accumulation."""
    acc = _acc_dtype(w.dtype)
    n = w.shape[-1]
    i = jnp.arange(n).astype(acc)  # int iota + convert: Mosaic rejects float iota
    wacc = w.astype(acc)
    sum_y = jnp.sum(wacc, axis=-1)
    sum_xy = jnp.einsum(
        "...n,n->...", wacc, i, precision=jax.lax.Precision.HIGHEST
    )
    return sum_y, sum_xy


@kernel(
    "(n)->(),(),(),()", ["f->ffff", "d->dddd"],
    badrow_arg=0, mask_preserving=True,
)
def linear_slope_fit(w_in, badrow=None):
    """Mean, sample stdev, regression slope and intercept over the window.

    Outputs ``(mean, stdev, slope, intercept)``; reference
    ``linear_slope_fit.py:19``.
    """
    n = w_in.shape[-1]
    acc = _acc_dtype(w_in.dtype)
    sum_y, sum_xy = _sums(w_in)
    mean = sum_y / n
    # sample variance (ddof=1), matching Welford's accumulation
    var = (
        jnp.sum((w_in.astype(acc) - mean[..., None]) ** 2, axis=-1) / (n - 1)
        if n > 1
        else jnp.zeros_like(mean)
    )
    stdev = jnp.sqrt(var)
    sum_x = n * (n - 1) / 2.0
    sum_x2 = (n - 1) * n * (2 * n - 1) / 6.0
    slope = (n * sum_xy - sum_x * sum_y) / (n * sum_x2 - sum_x * sum_x)
    intercept = (sum_y - sum_x * slope) / n
    dtype = w_in.dtype
    bad = isnan_any(w_in, 1) if badrow is None else badrow
    return (
        nanmask(bad, mean.astype(dtype)),
        nanmask(bad, stdev.astype(dtype)),
        nanmask(bad, slope.astype(dtype)),
        nanmask(bad, intercept.astype(dtype)),
    )


@kernel("(n),(),()->(),()", ["fff->ff", "ddd->dd"])
def linear_slope_diff(w_in, slope, intercept):
    """Mean and rms residual after removing a given line
    (reference ``linear_slope_fit.py:101``).

    The reference's "mean" accumulates ``resid[i] / (i + 1)`` — a
    harmonic-weighted sum, not the arithmetic mean. Downstream configs cut on
    the value the reference produces, so that exact weighting is preserved
    here (verified by the ref-oracle parity suite).
    """
    n = w_in.shape[-1]
    acc = _acc_dtype(w_in.dtype)
    i = jnp.arange(n).astype(acc)  # int iota + convert: Mosaic rejects float iota
    resid = w_in.astype(acc) - (cdim(jnp.asarray(slope, acc)) * i + cdim(jnp.asarray(intercept, acc)))
    mean = jnp.einsum(
        "...n,n->...", resid, 1.0 / (i + 1.0), precision=jax.lax.Precision.HIGHEST
    )
    rms = jnp.sqrt(jnp.sum(resid * resid, axis=-1) / (n - 1)) if n > 1 else jnp.zeros_like(mean)
    dtype = w_in.dtype
    bad = isnan_any(w_in, 1) | isnan_any(slope) | isnan_any(intercept)
    return nanmask(bad, mean.astype(dtype)), nanmask(bad, rms.astype(dtype))

# generic row-tile fusion: closed-form sums + one small dot
linear_slope_fit.tile_safe = True
linear_slope_diff.tile_safe = True
