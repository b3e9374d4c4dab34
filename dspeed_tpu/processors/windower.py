"""Waveform windowing (reference ``dspeed/processors/windower.py:17``)."""

from __future__ import annotations

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask
from ._kernel import kernel

__all__ = ["windower"]


@kernel("(n),(),(m)", ["fff", "ddd"], nout=1, uses_dims=True)
def windower(w_in, t0_in, dims):
    """Window of length ``m`` starting at ``t0_in``; out-of-range samples NaN.

    The output length comes from the declared output variable shape
    (signature without ``->``, like the reference).
    """
    n = w_in.shape[-1]
    m = dims["m"]
    if m >= n:
        raise DSPFatal(
            "The windowed waveform must be smaller than the input waveform"
        )
    t0 = jnp.asarray(t0_in)
    if t0.ndim == 0:
        t0 = jnp.broadcast_to(t0, w_in.shape[:-1])
    beg = jnp.minimum(jnp.trunc(t0).astype(jnp.int32), n)
    idx = beg[..., None] + jnp.arange(m)
    valid = (idx >= 0) & (idx < n)
    out = jnp.take_along_axis(w_in, jnp.clip(idx, 0, n - 1), axis=-1)
    out = jnp.where(valid, out, jnp.nan).astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1) | isnan_any(t0), out)
