"""Shared helpers for batched kernel implementations."""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = [
    "cdim",
    "isnan_any",
    "nanmask",
    "as_int",
    "take_last",
    "static_float",
    "static_int",
]


def cdim(x, n: int = 1):
    """Append ``n`` trailing broadcast dims to an array; pass scalars through.

    Kernels receive scalar params shaped ``(*batch,)`` and array params shaped
    ``(*batch, core...)``; this aligns a scalar against an array operand.
    """
    if hasattr(x, "ndim") and x.ndim > 0:
        return x[(...,) + (None,) * n]
    return x


def isnan_any(x, core_ndim: int = 0):
    """NaN mask reduced over the trailing ``core_ndim`` axes (keepdims=False).

    ``any(isnan(x))`` is evaluated as ``isnan(min(x))`` — a float min
    reduction propagates NaN and is unaffected by inf, so the semantics are
    identical, but the reduction stays in the native float layout instead
    of materializing a packed-pred plane (measurably cheaper on TPU, where
    these whole-waveform scans run once per kernel).
    """
    if not hasattr(x, "dtype"):
        return np.isnan(x)
    if not jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
        return False
    # trace-local memo (generic row-tile fusion): a dozen group members
    # reading the same plane would each re-reduce isnan over it inside the
    # Mosaic kernel — XLA CSEs these in the unfused graph, Mosaic doesn't.
    # Identical values either way; this is sharing, not a semantic change.
    from ._numerics import _TRACE_MEMO

    memo = _TRACE_MEMO
    if memo is not None:
        key = ("isnan", id(x), core_ndim)
        hit = memo.get(key)
        if hit is not None and hit[0] is x:
            return hit[1]
    if core_ndim:
        m = x
        for _ in range(core_ndim):
            m = jnp.min(m, axis=-1)
        out = jnp.isnan(m)
    else:
        out = jnp.isnan(x)
    if memo is not None:
        memo[key] = (x, out)
    return out


def nanmask(bad, out):
    """Poison ``out`` with NaN where ``bad``; rank-matches from the left.

    ``bad`` may be a python/numpy bool (static short-circuit) or a
    batch-shaped array.
    """
    if isinstance(bad, (bool, np.bool_)):
        return jnp.where(bad, jnp.nan, out) if bad else out
    m = bad
    while m.ndim < out.ndim:
        m = m[..., None]
    while m.ndim > out.ndim:
        m = m[..., 0]
    return jnp.where(m, jnp.nan, out)


def as_int(x):
    """Truncate-toward-zero and cast to int32 (matches numba ``int(x)``)."""
    if isinstance(x, (int, np.integer)):
        return int(x)
    if isinstance(x, (float, np.floating)):
        return int(x)
    return jnp.trunc(x).astype(jnp.int32)


def take_last(w, idx):
    """Gather along the last axis with batched integer indices.

    ``idx`` is clipped into range; callers mask invalid entries themselves.
    """
    idxc = jnp.clip(idx, 0, w.shape[-1] - 1)
    return jnp.take_along_axis(w, idxc[..., None], axis=-1)[..., 0]


def take_per_row(w, idx):
    """Per-row pickoff ``w[..., idx[..., k]]`` along the last axis, with
    ``idx`` clipped into range (callers mask invalid entries themselves).

    On accelerators, small index sets route through a broadcast compare
    fused into the sample reduction — TPU gathers serialize (measured on
    v5e: a 20-index pickoff from 16384x1019 rows is ~3x faster this way,
    bit-identical). CPU keeps the native gather.
    """
    import jax

    n = w.shape[-1]
    idxc = jnp.clip(idx, 0, n - 1).astype(jnp.int32)
    if jax.default_backend() != "cpu" and idx.shape[-1] <= 64:
        i = jnp.arange(n, dtype=jnp.int32)
        sel = i == idxc[..., None]  # (..., m, n)
        return jnp.sum(
            jnp.where(sel, w[..., None, :], 0), axis=-1
        ).astype(w.dtype)
    return jnp.take_along_axis(w, idxc, axis=-1)


def static_float(x, name: str, what: str) -> float:
    from ._kernel import require_static

    require_static(x, name, what)
    return float(x)


def static_int(x, name: str, what: str) -> int:
    from ._kernel import require_static

    require_static(x, name, what)
    return int(x)

