"""Round/floor/ceil/trunc to a multiple
(reference ``dspeed/processors/round_to_nearest.py:18-162``)."""

from __future__ import annotations

import jax.numpy as jnp

from ._kernel import kernel

__all__ = [
    "round_to_nearest",
    "floor_to_nearest",
    "ceil_to_nearest",
    "trunc_to_nearest",
]

_T = ["B", "H", "I", "L", "b", "h", "i", "l", "f", "d"]
_TYPES = [f"{t}{t}->{t}" for t in _T]


def _apply(val, to_nearest, fn):
    v = jnp.asarray(val)
    t = jnp.asarray(to_nearest, v.dtype)
    out = (t * fn(v / t)).astype(v.dtype)
    if jnp.issubdtype(v.dtype, jnp.floating):
        out = jnp.where(jnp.isnan(v), jnp.nan, out)
    return out


@kernel("(),()->()", _TYPES)
def round_to_nearest(val, to_nearest):
    """Nearest multiple of ``to_nearest`` (banker's rounding, like ``np.rint``
    via python ``round`` in the reference)."""
    return _apply(val, to_nearest, jnp.rint)


@kernel("(),()->()", _TYPES)
def floor_to_nearest(val, to_nearest):
    """Largest multiple of ``to_nearest`` that is <= val."""
    return _apply(val, to_nearest, jnp.floor)


@kernel("(),()->()", _TYPES)
def ceil_to_nearest(val, to_nearest):
    """Smallest multiple of ``to_nearest`` that is >= val."""
    return _apply(val, to_nearest, jnp.ceil)


@kernel("(),()->()", _TYPES)
def trunc_to_nearest(val, to_nearest):
    """Multiple of ``to_nearest`` closest to val, towards zero."""
    return _apply(val, to_nearest, jnp.trunc)

# generic row-tile fusion: elementwise
round_to_nearest.tile_safe = True
floor_to_nearest.tile_safe = True
ceil_to_nearest.tile_safe = True
trunc_to_nearest.tile_safe = True
