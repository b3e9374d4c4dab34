"""Waveform extremum statistics (reference ``dspeed/processors/min_max.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ._helpers import cdim, isnan_any, nanmask
from ._kernel import kernel

__all__ = ["min_max", "min_max_norm"]


@kernel(
    "(n)->(),(),(),()", ["f->ffff", "d->dddd"],
    badrow_arg=0, mask_preserving=True,
)
def min_max(w_in, badrow=None):
    """First-occurrence argmin/argmax and min/max values
    (reference ``min_max.py:19``). Outputs ``(t_min, t_max, a_min, a_max)``."""
    t_min = jnp.argmin(w_in, axis=-1)
    t_max = jnp.argmax(w_in, axis=-1)
    a_min = jnp.min(w_in, axis=-1)
    a_max = jnp.max(w_in, axis=-1)
    dtype = w_in.dtype
    bad = isnan_any(w_in, 1) if badrow is None else badrow
    return (
        nanmask(bad, t_min.astype(dtype)),
        nanmask(bad, t_max.astype(dtype)),
        nanmask(bad, a_min.astype(dtype)),
        nanmask(bad, a_max.astype(dtype)),
    )


@kernel("(n),(),()->(n)", ["fff->f", "ddd->d"])
def min_max_norm(w_in, a_min, a_max):
    """Normalize by ``max(|a_min|, |a_max|)`` unless either is zero
    (reference ``min_max.py:93``)."""
    amin = jnp.abs(jnp.asarray(a_min))
    amax = jnp.abs(jnp.asarray(a_max))
    denom = jnp.where(amax >= amin, amax, amin)
    either_zero = (amax == 0) | (amin == 0)
    out = jnp.where(
        cdim(either_zero) if either_zero.ndim else either_zero,
        w_in,
        w_in / cdim(jnp.where(denom == 0, 1.0, denom).astype(w_in.dtype)),
    )
    return nanmask(isnan_any(w_in, 1), out)

# generic row-tile fusion: reductions + masked iota picks
min_max.tile_safe = True
min_max_norm.tile_safe = True
