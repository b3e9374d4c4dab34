"""Waveform corrections and alignment (reference
``dspeed/processors/inl_correction.py:20``, ``wf_correction.py:18``,
``wf_alignment.py:20``, ``get_wf_centroid.py:20``).

All are gathers / masked arithmetic — directly vectorizable.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_int
from ._kernel import kernel

__all__ = [
    "inl_correction",
    "wf_correction",
    "wf_alignment",
    "get_wf_centroid",
]


@kernel("(n),(p)->(n)", ["if->f", "id->d"])
def inl_correction(w_in, inl):
    """Add the per-ADC-code INL correction: ``w + inl[w]``. Out-of-range
    codes poison the event (the reference raises per-sample)."""
    inl = jnp.asarray(inl)
    p = inl.shape[-1]
    code = jnp.asarray(w_in, jnp.int32)
    ok = jnp.all((code >= 0) & (code < p), axis=-1)
    if inl.ndim == 1:
        corr = inl[jnp.clip(code, 0, p - 1)]
    else:
        corr = jnp.take_along_axis(inl, jnp.clip(code, 0, p - 1), axis=-1)
    out = w_in + corr
    # per-event reduction: a NaN in one event's INL table (batched inl)
    # must poison only that event; a shared 1-D table poisons all
    bad = ~ok | isnan_any(inl, 1)
    return nanmask(bad, out.astype(corr.dtype))


@kernel("(n),(m),(),()->(n)", ["ffii->f", "ddii->d"])
def wf_correction(w_in, w_corr, start_idx, stop_idx):
    """Subtract a correction array over ``[start, stop)``
    (reference ``wf_correction.py:18``)."""
    n = w_in.shape[-1]
    m = jnp.asarray(w_corr).shape[-1]
    start = static_int(start_idx, "wf_correction", "start_idx")
    stop = static_int(stop_idx, "wf_correction", "stop_idx")
    if start < 0:
        raise DSPFatal("start_idx must be positive")
    if start > n:
        raise DSPFatal("start_idx must be shorter than input waveform size")
    if stop < 0:
        raise DSPFatal("stop_idx must be positive")
    if stop > n:
        raise DSPFatal("stop_idx must be shorter than input waveform size")
    if start >= stop:
        raise DSPFatal("start_idx must be smaller than stop_idx")
    if stop - start > m:
        raise DSPFatal("stop_idx - start_idx must be smaller than len(w_corr)")
    corr = jnp.asarray(w_corr, w_in.dtype)
    pos = jnp.arange(n)
    in_win = (pos >= start) & (pos < stop)
    cidx = jnp.clip(pos - start, 0, m - 1)
    cval = corr[..., cidx] if corr.ndim == 1 else jnp.take_along_axis(
        corr, jnp.broadcast_to(cidx, (*corr.shape[:-1], n)), axis=-1
    )
    out = jnp.where(in_win, w_in - cval, w_in)
    return nanmask(isnan_any(w_in, 1) | isnan_any(corr, 1), out)


@kernel("(n),(),(),(),(m)", ["fffff", "ddddd"], nout=1, uses_dims=True)
def wf_alignment(w_in, centroid, shift, size, dims):
    """Center the waveform at ``centroid`` into a fixed-size window
    (reference ``wf_alignment.py:20``)."""
    n = w_in.shape[-1]
    m = dims["m"]
    size_s = static_int(size, "wf_alignment", "size")
    if size_s <= 0:
        raise DSPFatal("size must be positive")
    if size_s > n:
        raise DSPFatal("size must be shorter than input waveform size")
    c = jnp.asarray(centroid)
    if c.ndim == 0:
        c = jnp.broadcast_to(c, w_in.shape[:-1])
    sh = jnp.asarray(shift)

    half = size_s / 2.0
    # case 1: full window fits -> w_in[c - size/2 : c + size/2]
    start1 = jnp.trunc(c - half).astype(jnp.int32)
    idx1 = start1[..., None] + jnp.arange(m)
    case1 = (c >= half) & (c < n - half)
    # case 2: centroid near the left edge -> pad with w_in[0]
    ss = jnp.trunc((size_s + 1) / 2.0 - c).astype(jnp.int32)
    idx2 = jnp.arange(m) - ss[..., None]
    case2 = (c > half - sh) & (c < half)
    # case 3: fall back to the first `size` samples
    idx3 = jnp.broadcast_to(jnp.arange(m), idx1.shape)

    idx = jnp.where(case1[..., None], idx1, jnp.where(case2[..., None], idx2, idx3))
    gather = jnp.take_along_axis(
        jnp.broadcast_to(w_in, (*idx.shape[:-1], n)),
        jnp.clip(idx, 0, n - 1),
        axis=-1,
    )
    out = jnp.where(case2[..., None] & (idx < 0), w_in[..., :1], gather)
    bad = isnan_any(w_in, 1) | isnan_any(c) | isnan_any(sh)
    return nanmask(bad, out.astype(w_in.dtype))


@kernel("(n),()->()", ["ff->f", "dd->d"])
def get_wf_centroid(w_in, shift):
    """Centroid from the sign pattern of a step-convolution product
    (reference ``get_wf_centroid.py:20``): midpoint of the first positive
    and last negative sample between argmin and argmax, plus ``shift``."""
    n = w_in.shape[-1]
    sh = jnp.asarray(shift)
    imin = jnp.argmin(w_in, axis=-1)
    imax = jnp.argmax(w_in, axis=-1)
    pos = jnp.arange(n)
    # window [imin, imax): relative index r = pos - imin
    in_win = (pos >= imin[..., None]) & (pos < imax[..., None])
    rel = pos - imin[..., None]
    pos_mask = in_win & (w_in > 0)
    neg_mask = in_win & (w_in < 0)
    big = n + 1
    first_pos = jnp.min(jnp.where(pos_mask, rel, big), axis=-1)
    last_neg = jnp.max(jnp.where(neg_mask, rel, -1), axis=-1)
    found = (first_pos < big) & (last_neg >= 0)
    c_a = first_pos + imin + sh
    c_b = last_neg + imin + sh
    centroid = jnp.round((c_a + c_b) / 2.0)
    bad = isnan_any(w_in, 1) | isnan_any(sh) | ~found
    return nanmask(bad, centroid.astype(w_in.dtype))


def _float_isnan(x):
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.isnan(x)
    return jnp.zeros(x.shape, bool)


def _centroid_checker(w_in, shift):
    """Checked-mode flags for the reference's shift fatals
    (``get_wf_centroid.py:54-60``; NaN waveforms short-circuit to NaN
    first): 1 = shift nan, 2 = shift negative, 3 = shift out of range."""
    n = w_in.shape[-1]
    sh = jnp.asarray(shift)
    skip = isnan_any(w_in, 1)
    code = jnp.where(
        _float_isnan(sh),
        1,
        jnp.where(sh < 0, 2, jnp.where(sh > n - 1, 3, 0)),
    ).astype(jnp.int32)
    code = jnp.where(skip, 0, code)
    lead = jnp.broadcast_shapes(code.shape, w_in.shape[:-1])
    return jnp.broadcast_to(code, lead)


get_wf_centroid.checker = _centroid_checker
get_wf_centroid.check_messages = {
    1: "shift is nan",
    2: "shift must be positive",
    3: "shift must be shorter than input waveform size",
}


def _alignment_checker(w_in, centroid, shift, size):
    """Checked-mode flags for the reference's centroid/shift fatals
    (``wf_alignment.py:63-71``; NaN waveforms short-circuit first; the
    size checks are static here and raise at trace time): 1 = centroid
    nan, 2 = shift nan, 3 = shift negative, 4 = shift out of range."""
    n = w_in.shape[-1]
    c = jnp.asarray(centroid)
    sh = jnp.asarray(shift)
    skip = isnan_any(w_in, 1)
    code = jnp.where(
        _float_isnan(c),
        1,
        jnp.where(
            _float_isnan(sh),
            2,
            jnp.where(sh < 0, 3, jnp.where(sh > n, 4, 0)),
        ),
    ).astype(jnp.int32)
    code = jnp.where(skip, 0, code)
    lead = jnp.broadcast_shapes(code.shape, w_in.shape[:-1])
    return jnp.broadcast_to(code, lead)


wf_alignment.checker = _alignment_checker
wf_alignment.check_messages = {
    1: "centroid is nan",
    2: "shift is nan",
    3: "shift must be positive",
    4: "shift must be shorter than input waveform size",
}

# generic row-tile fusion (r5 audit): elementwise/reduce/small-matmul bodies
# with no scans, sorts, FFTs or per-row dynamic gathers — Mosaic-lowerable;
# the two-tile probe compile still guards every group at trace time
get_wf_centroid.tile_safe = True
wf_correction.tile_safe = True
