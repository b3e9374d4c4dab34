"""Moving-window averages and averaged derivative.

Reference: ``dspeed/processors/moving_windows.py`` — running-average
recursions (:17 ``moving_window_left``, :69 ``moving_window_right``,
:125 ``moving_window_multi``, :211 ``avg_current``).

TPU-native reformulation: the left-window recursion telescopes into prefix
sums — ``out[i] = (S[i]-S[i-L])/L`` for ``i >= L`` and
``w[0] + (S[i]-(i+1)w[0])/L`` in the ramp-in region; the right window is
suffix-sum algebra on the same compensated prefix (``_mwr`` — no reversal).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_float
from ._kernel import kernel
from ._numerics import hp_cumsum, shift_right

__all__ = [
    "moving_window_left",
    "moving_window_right",
    "moving_window_multi",
    "avg_current",
]


def _mwl(w_in, length: float):
    n = w_in.shape[-1]
    li = int(length)
    ps = hp_cumsum(w_in)
    acc = ps.hi.dtype
    s = ps.value()
    w0 = w_in[..., :1].astype(acc)
    i = jnp.arange(n)
    ramp = w0 + (s - (i + 1) * w0) / acc.type(length)
    steady = ps.sub(ps.shift_right(li)) / acc.type(length)
    return jnp.where(i < li, ramp, steady).astype(w_in.dtype)


def _shift_left(x, k: int):
    """``x[..., k:]`` padded with zeros at the end (static slices)."""
    if k <= 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, k)]
    return jnp.pad(x[..., k:], pad)


def _mwr(w_in, length: float):
    """Right-to-left moving average without the time reversal.

    ``flip(_mwl(flip(w)))`` expands analytically to suffix-sum algebra:
    with ``S`` the compensated inclusive prefix sum and
    ``T[i] = S[n-1] - S[i-1]`` the suffix sum,

    - steady (``i <= n-1-L``): ``(S[i+L-1] - S[i-1]) / L``
    - ramp (last ``L-1`` samples): ``w[n-1] + (T[i] - (n-i) w[n-1]) / L``

    Differences are taken on the (hi, lo) pair so the compensation
    carries through exactly like ``_mwl``'s ``ps.sub``. The two ``rev``
    passes (and the MXU flips that replaced them) disappear — this is
    both faster on XLA and the only formulation Mosaic can lower in a
    generic row tile.
    """
    n = w_in.shape[-1]
    li = int(length)
    ps = hp_cumsum(w_in)
    acc = ps.hi.dtype
    hi = ps.hi
    lo = ps._lo_expand()
    hiE = shift_right(hi, 1)  # S[i-1]
    hiL = _shift_left(hi, li - 1) if li > 0 else hi  # S[i+L-1]
    if lo is not None:
        loE = shift_right(lo, 1)
        loL = _shift_left(lo, li - 1) if li > 0 else lo
        steady = (hiL - hiE) + (loL - loE)
        total_hi = hi[..., n - 1 : n]
        total_lo = lo[..., n - 1 : n]
        t_suffix = (total_hi - hiE) + (total_lo - loE)
    else:
        steady = hiL - hiE
        t_suffix = hi[..., n - 1 : n] - hiE
    w_last = w_in[..., n - 1 : n].astype(acc)
    i = jnp.arange(n)
    ramp = w_last + (t_suffix - (n - i) * w_last) / acc.type(length)
    out = jnp.where(i > n - 1 - li, ramp, steady / acc.type(length))
    return out.astype(w_in.dtype)


def _check_len(length, n, name):
    ln = static_float(length, name, "length")
    if not (0 <= ln < n):
        raise DSPFatal(
            "length is out of range, must be between 0 and the length of the waveform"
        )
    return ln


@kernel("(n),()->(n)", ["ff->f", "dd->d"])
def moving_window_left(w_in, length):
    """Left-to-right moving average (reference ``moving_windows.py:17``)."""
    ln = _check_len(length, w_in.shape[-1], "moving_window_left")
    return nanmask(isnan_any(w_in, 1), _mwl(w_in, ln))


@kernel("(n),()->(n)", ["ff->f", "dd->d"])
def moving_window_right(w_in, length):
    """Right-to-left moving average (reference ``moving_windows.py:69``):
    exactly the left window applied to the time-reversed waveform."""
    ln = _check_len(length, w_in.shape[-1], "moving_window_right")
    out = _mwr(w_in, ln)
    return nanmask(isnan_any(w_in, 1), out)


@kernel("(n),(),(),()->(n)", ["fffi->f", "dddi->d"])
def moving_window_multi(w_in, length, num_mw, mw_type):
    """Alternating L/R moving averages (reference ``moving_windows.py:125``).

    ``mw_type``: 0 alternate starting left, 1 only left, 2 only right.
    """
    n = w_in.shape[-1]
    ln = static_float(length, "moving_window_multi", "length")
    if np.floor(ln) != ln:
        raise DSPFatal("The length of the moving window must be an integer")
    num = static_float(num_mw, "moving_window_multi", "num_mw")
    if np.floor(num) != num:
        raise DSPFatal("The number of moving windows must be an integer")
    if not (0 <= int(ln) < n):
        raise DSPFatal("The length of the moving window is out of range")
    if int(num) < 0:
        raise DSPFatal("The number of moving windows much be positive")
    mtype = int(static_float(mw_type, "moving_window_multi", "mw_type"))

    out = w_in
    for it in range(int(num)):
        go_right = ((it % 2 == 1) and (mtype == 0)) or (mtype == 2)
        out = _mwr(out, ln) if go_right else _mwl(out, ln)
    return nanmask(isnan_any(w_in, 1), out)


@kernel("(n),(),(m)", ["fff", "ddd"], nout=1, uses_dims=True)
def avg_current(w_in, length, dims):
    """Length-averaged derivative ``(w[i+L]-w[i])/L``
    (reference ``moving_windows.py:211``); output length ``m = n - L``."""
    n = w_in.shape[-1]
    m = dims["m"]
    ln = static_float(length, "avg_current", "length")
    if not (0 <= ln < n):
        raise DSPFatal(
            "length is out of range, must be between 0 and the length of the waveform"
        )
    li = int(ln)
    diff = (w_in[..., li:] - w_in[..., : n - li]) / w_in.dtype.type(ln)
    if diff.shape[-1] < m:
        pad = [(0, 0)] * (diff.ndim - 1) + [(0, m - diff.shape[-1])]
        diff = jnp.pad(diff, pad, constant_values=jnp.nan)
    else:
        diff = diff[..., :m]
    return nanmask(isnan_any(w_in, 1), diff)

# generic row-tile fusion: blocked-cumsum window sums / shifted differences
moving_window_left.tile_safe = True
moving_window_right.tile_safe = True
moving_window_multi.tile_safe = True
avg_current.tile_safe = True
