"""Trapezoidal filters.

Reference semantics: ``dspeed/processors/trap_filters.py`` — four-phase
running-sum recursions (:20 ``trap_filter``, :87 ``trap_norm``,
:160 ``asym_trap_filter``, :238 ``trap_pickoff``).

TPU-native reformulation: the recursions telescope exactly into differences
of one inclusive prefix sum ``S`` (with ``S[k<0] = 0``):

    ``trap[i] = S[i] - S[i-rise] - S[i-rise-flat] + S[i-2*rise-flat]``

evaluated at accumulation precision (:mod:`.._numerics`) so the subtraction
of nearby large prefix values does not lose float32 significance.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_int, take_last
from ._kernel import kernel
from ._numerics import PrefixSum, hp_cumsum

__all__ = ["trap_filter", "trap_norm", "asym_trap_filter", "trap_pickoff"]


def _check(name: str, n: int, **sections) -> dict[str, int]:
    out = {}
    for key, val in sections.items():
        iv = static_int(val, name, key)
        if iv < 0:
            raise DSPFatal(
                f"The number of samples in the {key} section must be positive"
            )
        out[key] = iv
    return out


def _trap_sum(w_in, rise: int, flat: int, fall: int) -> jnp.ndarray:
    """``S[i]-S[i-rise] - (S[i-rise-flat]-S[i-rise-flat-fall])`` in hp accum."""
    ps = hp_cumsum(w_in)
    d1 = ps.sub(ps.shift_right(rise)) if rise else jnp.zeros_like(ps.hi)
    d2 = (
        ps.shift_right(rise + flat).sub(ps.shift_right(rise + flat + fall))
        if fall
        else jnp.zeros_like(ps.hi)
    )
    return d1 - d2


@kernel(
    "(n),(),()->(n)", ["fii->f", "dii->d"], badrow_arg=0, mask_preserving=True
)
def trap_filter(w_in, rise, flat, badrow=None):
    """Symmetric trapezoidal filter (reference ``trap_filters.py:20``)."""
    n = w_in.shape[-1]
    p = _check("trap_filter", n, rise=rise, flat=flat)
    if 2 * p["rise"] + p["flat"] > n:
        raise DSPFatal("The trapezoid width is wider than the waveform")
    out = _trap_sum(w_in, p["rise"], p["flat"], p["rise"]).astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1) if badrow is None else badrow, out)


@kernel(
    "(n),(),()->(n)", ["fii->f", "dii->d"], badrow_arg=0, mask_preserving=True
)
def trap_norm(w_in, rise, flat, badrow=None):
    """Symmetric trapezoid normalized by ``rise`` (reference ``trap_filters.py:87``)."""
    n = w_in.shape[-1]
    p = _check("trap_norm", n, rise=rise, flat=flat)
    if 2 * p["rise"] + p["flat"] > n:
        raise DSPFatal("The trapezoid width is wider than the waveform")
    acc = _trap_sum(w_in, p["rise"], p["flat"], p["rise"])
    out = (acc / acc.dtype.type(p["rise"])).astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1) if badrow is None else badrow, out)


@kernel(
    "(n),(),(),()->(n)", ["fiii->f", "diii->d"], badrow_arg=0,
    mask_preserving=True,
)
def asym_trap_filter(w_in, rise, flat, fall, badrow=None):
    """Asymmetric trapezoid normalized per section (reference ``trap_filters.py:160``).

    ``out[i] = avg(rise window ending at i) - avg(fall window ending at
    i-rise-flat)`` with each window normalized by its own length.
    """
    n = w_in.shape[-1]
    p = _check("asym_trap_filter", n, rise=rise, flat=flat, fall=fall)
    if p["rise"] + p["flat"] + p["fall"] > n:
        raise DSPFatal("The trapezoid width is wider than the waveform")
    ps = hp_cumsum(w_in)
    d1 = ps.sub(ps.shift_right(p["rise"]))
    d2 = ps.shift_right(p["rise"] + p["flat"]).sub(
        ps.shift_right(p["rise"] + p["flat"] + p["fall"])
    )
    acc_dtype = d1.dtype
    out = d1 / acc_dtype.type(p["rise"]) - d2 / acc_dtype.type(p["fall"])
    return nanmask(
        isnan_any(w_in, 1) if badrow is None else badrow, out.astype(w_in.dtype)
    )


@kernel("(n),(),(),()->()", ["fiif->f", "diid->d"])
def trap_pickoff(w_in, rise, flat, t_pickoff):
    """Trapezoid evaluated at one pick-off index (reference ``trap_filters.py:238``).

    ``a_out = (sum w[t+1-rise : t+1] - sum w[t+1-2*rise-flat : t+1-rise-flat])
    / rise`` with ``t = int(t_pickoff)``; NaN when the window does not fit.
    """
    n = w_in.shape[-1]
    p = _check("trap_pickoff", n, rise=rise, flat=flat)
    if 2 * p["rise"] + p["flat"] > n:
        raise DSPFatal("The trapezoid width is wider than the waveform")
    t = jnp.asarray(t_pickoff)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, w_in.shape[:-1])
    start = jnp.trunc(t).astype(jnp.int32) + 1
    ps = hp_cumsum(w_in)

    def s_at(k):
        # inclusive prefix S[k], with S[k<0] = 0
        v = take_last(ps.hi, k) + ps.lo_take(k)
        return jnp.where(k < 0, 0.0, v)

    def win_sum(hi_idx, length):
        # sum of w[hi_idx-length : hi_idx] = S[hi_idx-1] - S[hi_idx-length-1]
        return s_at(hi_idx - 1) - s_at(hi_idx - length - 1)

    i1 = win_sum(start, p["rise"])
    i2 = win_sum(start - p["rise"] - p["flat"], p["rise"])
    val = ((i1 - i2) / np.float64(p["rise"])).astype(w_in.dtype)

    in_range = (start >= 2 * p["rise"] + p["flat"]) & (start <= n)
    non_integer = jnp.floor(t) != t
    bad = isnan_any(w_in, 1) | isnan_any(t) | ~in_range | non_integer
    return nanmask(bad, val)


def _trap_pickoff_checker(w_in, rise, flat, t_pickoff):
    """Checked-mode flag: the reference raises on a non-integral pick-off
    index (``trap_filters.py:276-277``); NaN inputs short-circuit to NaN."""
    import jax.numpy as jnp

    from ._helpers import isnan_any

    t = jnp.asarray(t_pickoff)
    lead_shape = jnp.broadcast_shapes(t.shape, w_in.shape[:-1])
    if not jnp.issubdtype(t.dtype, jnp.floating):
        return jnp.zeros(lead_shape, jnp.int32)
    skip = isnan_any(w_in, 1) | jnp.isnan(t)
    code = jnp.where(
        ~skip & (jnp.floor(t) != t), jnp.int32(1), jnp.int32(0)
    )
    return jnp.broadcast_to(code, lead_shape)


trap_pickoff.checker = _trap_pickoff_checker
trap_pickoff.check_messages = {1: "The pick-off index must be an integer"}

# generic row-tile fusion: windowed prefix-sum differences (MXU blocked
# cumsum + static shifts) lower inside a Mosaic row tile
trap_filter.tile_safe = True
trap_norm.tile_safe = True
asym_trap_filter.tile_safe = True
trap_pickoff.tile_safe = True
