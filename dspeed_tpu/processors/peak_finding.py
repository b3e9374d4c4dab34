"""Multi-peak finding: Billauer peakdet and companions.

Reference semantics: ``dspeed/processors/get_multi_local_extrema.py:20``
(delta-hysteresis max/min finder with 4 search modes),
``peak_snr_threshold.py:19``, ``multi_t_filter.py:22,88``,
``multi_a_filter.py:20``.

TPU-native design: the hysteresis state machine is inherently sequential, so
it becomes a ``lax.scan`` with a small fixed carry — {running argmax/argmin,
find_max flag, slot counters, bounded output slots} — ``vmap``-ed over
events. Everything around it (direction merging, duplicate removal, SNR
windows) is vectorized O(m²) mask algebra over the fixed slot arrays.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import (
    isnan_any,
    nanmask,
    static_float,
    static_int,
    take_last,
    take_per_row,
)
from ._kernel import kernel

__all__ = [
    "get_multi_local_extrema",
    "peak_snr_threshold",
    "multi_t_filter",
    "remove_duplicates",
    "multi_a_filter",
]


def _cdim(x):
    """Append a slot axis to batch-shaped scalars for broadcasting."""
    if hasattr(x, "ndim") and getattr(x, "ndim", 0):
        return jnp.asarray(x)[..., None]
    return x


def _peakdet_scan(w, delta_max, delta_min, abs_max, abs_min, m_max, m_min,
                  reverse=False):
    """One-direction Billauer sweep over batched waveforms ``w`` (B, n).

    ``reverse=True`` runs the right-to-left sweep via ``lax.scan``'s own
    reverse traversal — identical declarations to scanning ``w[:, ::-1]``
    (same visit order, same strict-inequality updates) but without
    materializing a flipped copy of the plane (a 0.22 ms ``reverse`` pass
    at 16384x1019 on v5e, r5), and slots record TRUE sample indices so the
    caller's ``(n-1) - pos`` back-mapping disappears.

    Returns (vt_max (B, m_max), vt_min (B, m_min), n_max (B,), n_min (B,))
    with NaN-padded slot arrays holding *sample indices* in declaration
    order. ``delta``/``abs`` bounds are scalars or (B,).

    TPU formulation: the carry holds the running extremum VALUES (``vx`` /
    ``vn``) alongside their indices, so no scan step ever gathers ``w[imax]``
    (a per-event dynamic gather per step — the single slowest primitive on
    TPU); slot writes are one-hot masked updates of the (B, m) arrays
    instead of scatters; the sweep runs batched over the whole event block
    (the old per-event form vmapped these gathers). Algebraically identical
    to the index-carrying recursion: ``vx == w[imax]`` by induction.
    """
    B, n = w.shape

    def bcast(x):
        v = jnp.asarray(x, w.dtype)
        return jnp.broadcast_to(v, (B,))

    dmax, dmin = bcast(delta_max), bcast(delta_min)
    amax_, amin_ = bcast(abs_max), bcast(abs_min)
    slot_mx = jnp.arange(m_max)[None, :]
    slot_mn = jnp.arange(m_min)[None, :]

    def step(carry, xs):
        vx, ix, vn, im, find_max, nmx, nmn, smax, smin = carry
        wi, i = xs
        newmax = wi > vx
        vx = jnp.where(newmax, wi, vx)
        ix = jnp.where(newmax, i, ix)
        newmin = wi < vn
        vn = jnp.where(newmin, wi, vn)
        im = jnp.where(newmin, i, im)

        decl_max = find_max & (wi < vx - dmax) & (nmx < m_max) & (vx > amax_)
        decl_min = (
            (~find_max) & (wi > vn + dmin) & (nmn < m_min) & (vn < amin_)
        )
        smax = jnp.where(
            decl_max[:, None] & (slot_mx == nmx[:, None]),
            ix[:, None].astype(w.dtype),
            smax,
        )
        smin = jnp.where(
            decl_min[:, None] & (slot_mn == nmn[:, None]),
            im[:, None].astype(w.dtype),
            smin,
        )
        nmx = nmx + decl_max
        nmn = nmn + decl_min
        # a declaration restarts the opposite tracker at the current sample
        vn = jnp.where(decl_max, wi, vn)
        im = jnp.where(decl_max, i, im)
        vx = jnp.where(decl_min, wi, vx)
        ix = jnp.where(decl_min, i, ix)
        find_max = jnp.where(
            decl_max, False, jnp.where(decl_min, True, find_max)
        )
        return (vx, ix, vn, im, find_max, nmx, nmn, smax, smin), None

    init = (
        jnp.full((B,), -jnp.inf, w.dtype),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), jnp.inf, w.dtype),
        jnp.zeros((B,), jnp.int32),
        jnp.ones((B,), bool),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B, m_max), jnp.nan, w.dtype),
        jnp.full((B, m_min), jnp.nan, w.dtype),
    )
    xs = (w.T, jnp.arange(n, dtype=jnp.int32))
    carry, _ = jax.lax.scan(step, init, xs, unroll=8, reverse=reverse)
    (vx, ix, vn, im, fm, nmx, nmn, smax, smin) = carry
    return smax, smin, nmx, nmn


def _compact_keep(vals, keep, m):
    """``keep``-marked entries moved to the front (stable, original order),
    NaN padding, first ``m`` slots — computed arithmetically (prefix-sum
    target positions + a compare-reduce placement) instead of a stable
    argsort: XLA's tiny-array sorts serialize on TPU (a (16384, 20)
    stable argsort measured 3.3 ms in the SiPM chain; this form is
    ~50 us). Bit-identical: a kept NaN value still lands NaN in its slot
    through the masked sum."""
    pos = jnp.cumsum(keep, axis=-1) - 1
    slots = jnp.arange(m)
    onto = (pos[..., None, :] == slots[..., :, None]) & keep[..., None, :]
    filled = slots < jnp.sum(keep, axis=-1, keepdims=True)
    out = jnp.sum(jnp.where(onto, vals[..., None, :], 0.0), axis=-1)
    return jnp.where(filled, out, jnp.nan).astype(vals.dtype)


def _compact_sorted_unique(vals, m):
    """Sorted-unique of a NaN-padded array, NaN-compacted to ``m`` slots."""
    s = jnp.sort(vals)  # NaNs go last
    first = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
    keep = first & ~jnp.isnan(s)
    return _compact_keep(s, keep, m)


def _coincidence(left, right, m):
    """Left values that also appear in right, in left order (mode 2)."""
    eq = left[:, None] == right[None, :]
    keep = jnp.any(eq, axis=1) & ~jnp.isnan(left)
    return _compact_keep(left, keep, m)


@kernel(
    "(n),(),(),(),(),(),(m),(p),(),()",
    ["ffffff" + "ffff", "dddddd" + "dddd"],
    nout=4,
    static=[3],
    uses_dims=True,
)
def get_multi_local_extrema(
    w_in, a_delta_max_in, a_delta_min_in, search_direction, a_abs_max_in,
    a_abs_min_in, dims,
):
    """Billauer peakdet: NaN-padded index lists of local maxima/minima plus
    counts (reference ``get_multi_local_extrema.py:20``). ``search_direction``
    0 = L→R sweep, 1 = R→L, 2 = AND of both, 3 = OR of both.

    Divergence from the reference: mode 2's minima coincidence uses the
    *minima* arrays (the reference indexes ``right_vt_max`` by the minima NaN
    mask — ``get_multi_local_extrema.py:255-256`` — a manifest copy-paste
    slip); mode 3's union is NaN-compacted.
    """
    direction = static_int(
        search_direction, "get_multi_local_extrema", "search_direction"
    )
    if direction not in (0, 1, 2, 3):
        raise DSPFatal("search direction type not found.")
    m_max, m_min = dims["m"], dims["p"]
    n = w_in.shape[-1]
    if m_max >= n or m_min >= n:
        raise DSPFatal(
            "The length of your return array must be smaller than the "
            "length of your waveform"
        )

    def scalar(x):
        v = jnp.asarray(x, w_in.dtype)
        return jnp.broadcast_to(v, w_in.shape[:-1]) if v.ndim == 0 else v

    dmax, dmin = scalar(a_delta_max_in), scalar(a_delta_min_in)
    amax_, amin_ = scalar(a_abs_max_in), scalar(a_abs_min_in)

    lead = w_in.shape[:-1]
    wf = w_in.reshape(-1, n)
    dm, dn, am, an = (x.reshape(-1) for x in (dmax, dmin, amax_, amin_))

    vl_max = vl_min = vr_max = vr_min = None
    if direction in (0, 2, 3):
        vl_max, vl_min, nl_max, nl_min = _peakdet_scan(
            wf, dm, dn, am, an, m_max, m_min
        )
    if direction in (1, 2, 3):
        # right-to-left sweep without materializing a flipped plane; slots
        # already hold true forward indices (see _peakdet_scan)
        vr_max, vr_min, nr_max, nr_min = _peakdet_scan(
            wf, dm, dn, am, an, m_max, m_min, reverse=True
        )
    if direction == 0:
        vmax, vmin, nmx, nmn = vl_max, vl_min, nl_max, nl_min
    elif direction == 1:
        vmax, vmin, nmx, nmn = vr_max, vr_min, nr_max, nr_min
    else:
        if direction == 2:
            vmax = jax.vmap(lambda a, b: _coincidence(a, b, m_max))(
                vl_max, jnp.sort(vr_max, axis=-1)
            )
            vmin = jax.vmap(lambda a, b: _coincidence(a, b, m_min))(
                vl_min, jnp.sort(vr_min, axis=-1)
            )
        else:
            vmax = jax.vmap(lambda a: _compact_sorted_unique(a, m_max))(
                jnp.concatenate([vl_max, vr_max], axis=-1)
            )
            vmin = jax.vmap(lambda a: _compact_sorted_unique(a, m_min))(
                jnp.concatenate([vl_min, vr_min], axis=-1)
            )
        nmx = jnp.sum(~jnp.isnan(vmax), axis=-1).astype(jnp.int32)
        nmn = jnp.sum(~jnp.isnan(vmin), axis=-1).astype(jnp.int32)
    vmax = vmax.reshape(*lead, m_max)
    vmin = vmin.reshape(*lead, m_min)
    nmx = nmx.reshape(lead)
    nmn = nmn.reshape(lead)

    bad = isnan_any(w_in, 1) | isnan_any(dmax) | isnan_any(dmin)
    vmax = nanmask(bad, vmax)
    vmin = nanmask(bad, vmin)
    zero = jnp.zeros_like(nmx)
    nmx = jnp.where(bad, zero, nmx).astype(w_in.dtype)
    nmn = jnp.where(bad, zero, nmn).astype(w_in.dtype)
    return vmax, vmin, nmx, nmn


@kernel("(n),(m),(),(),(m),()", ["fffff" + "f", "ddddd" + "d"], nout=2)
def peak_snr_threshold(w_in, idx_in, ratio_in, width_in):
    """Keep candidate peaks whose windowed-local-min / peak ratio is below
    ``ratio_in`` (reference ``peak_snr_threshold.py:19``)."""
    width = static_int(width_in, "peak_snr_threshold", "width_in")
    n = w_in.shape[-1]
    m = idx_in.shape[-1]
    idx = jnp.nan_to_num(idx_in, nan=0.0).astype(jnp.int32)
    valid = ~jnp.isnan(idx_in)

    a = jnp.clip(idx - width, 0, n - 1)
    b = jnp.clip(idx + width, 0, n - 1)  # exclusive bound clipped like ref
    if jax.default_backend() != "cpu":
        # windowed min as a broadcast compare fused into the sample
        # reduction: TPU gathers serialize, costing 76% of the whole SiPM
        # chain; this form never materializes (B, m, n), reads w_in m
        # times from VMEM-resident tiles, and is bit-identical (measured
        # v5e @ 16384x1019, m=20: 145ms gather -> 32ms)
        i = jnp.arange(n, dtype=jnp.int32)
        wrow = w_in[..., None, :]  # (..., 1, n) vs masks (..., m, n)
        in_win = (i >= a[..., None]) & (i < b[..., None])
        wmin = jnp.min(jnp.where(in_win, wrow, jnp.inf), axis=-1)
        # empty window (b <= a) -> min at a, like the reference's init
        wa = jnp.min(jnp.where(i == a[..., None], wrow, jnp.inf), axis=-1)
        wmin = jnp.minimum(wmin, wa)
        peak = take_per_row(w_in, idx)
    else:
        # CPU: the gather is the fast path
        # window positions a..a+2w-1, masked to < b (ref loops range(a, b))
        offs = jnp.arange(2 * width)
        pos = a[..., None] + offs  # (..., m, 2w)
        in_win = pos < b[..., None]
        wvals = jnp.take_along_axis(
            jnp.broadcast_to(w_in[..., None, :], (*pos.shape[:-1], n)),
            jnp.clip(pos, 0, n - 1),
            axis=-1,
        )
        wvals = jnp.where(in_win, wvals, jnp.inf)
        # empty window (b <= a) -> min at a, like the reference's init
        wmin = jnp.minimum(
            jnp.min(wvals, axis=-1), jnp.take_along_axis(w_in, a, axis=-1)
        )
        peak = jnp.take_along_axis(w_in, jnp.clip(idx, 0, n - 1), axis=-1)
    passing = valid & (jnp.abs(wmin / peak) < _cdim(ratio_in))
    idx_out = _compact_keep(idx_in, passing, idx_in.shape[-1])
    n_out = jnp.sum(passing, axis=-1).astype(w_in.dtype)
    return idx_out, n_out


@kernel("(n),(n)->(n)", ["ff->f", "dd->d"])
def remove_duplicates(t_in, vt_min_in):
    """De-duplicate time points, replacing repeats with the matching minima
    (reference ``multi_t_filter.py:22``); shifts out a leading index 0."""
    m = t_in.shape[-1]
    i1 = jnp.arange(m)
    eq = (t_in[..., :, None] == t_in[..., None, :]) & (i1[:, None] < i1[None, :])
    # last i1 < i2 with equal values wins (reference loop order)
    src = jnp.where(eq, i1[:, None], -1)
    best = jnp.max(src, axis=-2)
    dup = best >= 0
    repl = jnp.take_along_axis(vt_min_in, jnp.clip(best, 0, m - 1), axis=-1)
    t_out = jnp.where(dup, repl, jnp.where(jnp.isnan(t_in), jnp.nan, t_in))
    # if the first entry is index 0, shift everything left
    shift = t_out[..., 0] == 0
    shifted = jnp.concatenate(
        [t_out[..., 1:], jnp.full_like(t_out[..., :1], jnp.nan)], axis=-1
    )
    t_out = jnp.where(shift[..., None], shifted, t_out)
    all_nan = jnp.all(jnp.isnan(t_in), axis=-1) & jnp.all(
        jnp.isnan(vt_min_in), axis=-1
    )
    return nanmask(all_nan, t_out)


@kernel("(n),(),(m),(m),(m)", ["fffff", "ddddd"], nout=1)
def multi_t_filter(w_in, a_threshold_in, vt_max_in, vt_min_in):
    """Leading-edge times for each found maximum: vectorized
    ``time_point_thresh`` walking back from each maximum, then duplicate
    removal (reference ``multi_t_filter.py:88``)."""
    from .time_point_thresh import time_point_thresh

    m = vt_max_in.shape[-1]
    n = w_in.shape[-1]
    if m > n:
        raise DSPFatal(
            "The length of your return array must be smaller than the "
            "length of your waveform"
        )
    (tp,) = time_point_thresh(
        w_in[..., None, :], _cdim(a_threshold_in), vt_max_in, 0
    )
    (t_out,) = remove_duplicates(tp, vt_min_in)
    bad = isnan_any(w_in, 1) | isnan_any(a_threshold_in)
    return nanmask(bad, t_out)


@kernel("(n),(m)->(m)", ["ff->f", "dd->d"])
def multi_a_filter(w_in, vt_max_in):
    """Amplitudes at the found maxima (reference ``multi_a_filter.py:20``)."""
    n = w_in.shape[-1]
    idx = jnp.nan_to_num(vt_max_in, nan=0.0).astype(jnp.int32)
    valid = ~jnp.isnan(vt_max_in) & (idx >= 0) & (idx < n)
    vals = take_per_row(w_in, idx)
    out = jnp.where(valid, vals, jnp.nan).astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1), out)

# generic row-tile fusion: compare-reduce picks (the extrema scan and the
# take_along_axis-based peak_snr_threshold stay out of groups)
multi_a_filter.tile_safe = True
