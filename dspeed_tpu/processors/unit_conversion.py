"""Coordinate-grid / unit conversions
(reference ``dspeed/processors/unit_conversion.py:20-78``).

All convert ``(x + offset_in) * period_ratio - offset_out`` with float64
offset/ratio arithmetic, in float, int (exactness-checked), or rounded
variants. The chain's :class:`UnitConversionManager` equivalent emits these.
"""

from __future__ import annotations

import jax.numpy as jnp

from ._kernel import kernel

__all__ = [
    "convert",
    "convert_int",
    "convert_round",
    "convert_floor",
    "convert_ceil",
    "convert_trunc",
]

_FT = ["f", "d"]
_IT = ["B", "H", "I", "L", "b", "h", "i", "l"]


def _affine_simple(buf, offset_in, offset_out, ratio):
    """(buf + offset_in) * ratio - offset_out at accumulation precision."""
    import jax

    work = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    x = jnp.asarray(buf).astype(work)

    def align(v):
        v = jnp.asarray(v, work)
        while v.ndim and v.ndim < x.ndim:
            v = v[..., None]
        return v

    return (x + align(offset_in)) * align(ratio) - align(offset_out)


@kernel("(),(),(),()->()", [f"{t}ddd->{t}" for t in _FT])
def convert(buf_in, offset_in, offset_out, period_ratio):
    out = _affine_simple(buf_in, offset_in, offset_out, period_ratio)
    return out.astype(jnp.asarray(buf_in).dtype)


@kernel("(),(),(),()->()", [f"{t}ddd->{t}" for t in _IT])
def convert_int(buf_in, offset_in, offset_out, period_ratio):
    """Integer conversion; non-exact results are poisoned to the max value of
    the dtype (the reference raises ``DSPFatal`` per element — impossible in a
    compiled program, so inexact entries saturate instead)."""
    dtype = jnp.asarray(buf_in).dtype
    tmp = _affine_simple(buf_in, offset_in, offset_out, period_ratio)
    ret = jnp.rint(tmp)
    exact = jnp.abs(tmp - ret) < 1.0e-5
    bad_val = jnp.iinfo(dtype).max
    return jnp.where(exact, ret.astype(dtype), bad_val)


def _conv_round(fn):
    def impl(buf_in, offset_in, offset_out, period_ratio):
        dtype = jnp.asarray(buf_in).dtype
        out = fn(_affine_simple(buf_in, offset_in, offset_out, period_ratio))
        return out.astype(dtype)

    return impl


convert_round = kernel("(),(),(),()->()", [f"{t}ddd->{t}" for t in _IT + _FT], name="convert_round")(
    _conv_round(jnp.rint)
)
convert_floor = kernel("(),(),(),()->()", [f"{t}ddd->{t}" for t in _IT + _FT], name="convert_floor")(
    _conv_round(jnp.floor)
)
convert_ceil = kernel("(),(),(),()->()", [f"{t}ddd->{t}" for t in _IT + _FT], name="convert_ceil")(
    _conv_round(jnp.ceil)
)
convert_trunc = kernel("(),(),(),()->()", [f"{t}ddd->{t}" for t in _IT + _FT], name="convert_trunc")(
    _conv_round(jnp.trunc)
)
