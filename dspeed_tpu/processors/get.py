"""Indexed gather processors (reference ``dspeed/processors/get.py:31,72``)."""

from __future__ import annotations

import jax.numpy as jnp

from ._helpers import take_last
from ._kernel import kernel

__all__ = ["get", "get_default"]

_T = ["b", "h", "i", "l", "B", "H", "I", "L", "f", "d", "F", "D"]


@kernel("(n),()->()", [f"{t}l->{t}" for t in _T])
def get(a_in, i):
    """Value at position ``i`` (negative = from the end). Out-of-range
    produces NaN/max-int (the reference raises ``DSPFatal``, impossible
    per-event in a compiled program)."""
    n = a_in.shape[-1]
    idx = jnp.asarray(i, jnp.int32)
    if idx.ndim == 0:
        idx = jnp.broadcast_to(idx, a_in.shape[:-1])
    wrapped = jnp.where(idx < 0, idx + n, idx)
    ok = (idx >= -n) & (idx < n)
    val = take_last(a_in, wrapped)
    if jnp.issubdtype(a_in.dtype, jnp.floating):
        return jnp.where(ok, val, jnp.nan)
    return jnp.where(ok, val, jnp.iinfo(a_in.dtype).max)


def _get_checker(a_in, i):
    """Checked-mode flag: the reference raises ``DSPFatal("i is out of
    range")`` per event (``get.py:45-48``); NaN indices are not possible
    there (the index is typed int64) and are left to the NaN convention."""
    n = a_in.shape[-1]
    idx = jnp.asarray(i)
    bad = (idx < -n) | (idx >= n)
    if jnp.issubdtype(idx.dtype, jnp.floating):
        bad = bad & ~jnp.isnan(idx)
    code = bad.astype(jnp.int32)
    lead = jnp.broadcast_shapes(code.shape, a_in.shape[:-1])
    return jnp.broadcast_to(code, lead)


get.checker = _get_checker
get.check_messages = {1: "i is out of range"}


@kernel("(n),(),()->()", [f"{t}l{t}->{t}" for t in _T])
def get_default(a_in, i, default):
    """Value at position ``i``; ``default`` on out-of-range or NaN
    (reference ``get.py:72``). Backs the parser's ``wf[var]`` subscripts."""
    n = a_in.shape[-1]
    idx = jnp.asarray(i, jnp.int32)
    if idx.ndim == 0:
        idx = jnp.broadcast_to(idx, a_in.shape[:-1])
    wrapped = jnp.where(idx < 0, idx + n, idx)
    ok = (idx >= -n) & (idx < n)
    val = take_last(a_in, wrapped)
    if jnp.issubdtype(a_in.dtype, jnp.floating):
        ok = ok & ~jnp.isnan(val)
    d = jnp.asarray(default, a_in.dtype)
    return jnp.where(ok, val, d)

# generic row-tile fusion: compare-reduce pick
get.tile_safe = True
get_default.tile_safe = True
