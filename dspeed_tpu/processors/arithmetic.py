"""Simple arithmetic reductions (reference ``dspeed/processors/arithmetic.py:17``)."""

from __future__ import annotations

import jax.numpy as jnp

from ._helpers import cdim, isnan_any, nanmask
from ._kernel import kernel

__all__ = ["mean_below_threshold"]


@kernel("(n),()->()", ["ff->f", "dd->d"])
def mean_below_threshold(w_in, a_threshold):
    """Mean of the samples strictly below ``a_threshold``; NaN when no sample
    qualifies or inputs contain NaN."""
    thr = cdim(jnp.asarray(a_threshold, w_in.dtype))
    sel = w_in < thr
    cnt = jnp.sum(sel, axis=-1)
    tot = jnp.sum(jnp.where(sel, w_in, 0.0), axis=-1)
    out = jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1), jnp.nan).astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1) | isnan_any(a_threshold), out)

mean_below_threshold.tile_safe = True  # generic row-tile fusion: masked mean
