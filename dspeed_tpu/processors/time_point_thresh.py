"""Threshold-crossing time-point finders.

Reference: ``dspeed/processors/time_point_thresh.py`` — sequential early-exit
walks (:20 ``time_point_thresh``, :103 ``interpolated_time_point_thresh``,
:233 ``multi_time_point_thresh``, :412
``bi_level_zero_crossing_time_points``).

TPU-native reformulation: the "first crossing from ``t_start`` in direction
``d``" searches become masked argmax/argmin reductions over a vectorized
crossing predicate — no data-dependent control flow, fixed shapes.

Divergence from the reference: data-dependent ``DSPFatal`` conditions
(non-integer or out-of-range ``t_start``) yield NaN for the affected event
instead of aborting, since a compiled TPU program cannot raise per-event.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import cdim, isnan_any, nanmask, static_int, take_last
from ._kernel import kernel

__all__ = [
    "time_point_thresh",
    "interpolated_time_point_thresh",
    "multi_time_point_thresh",
]


def _first_true_from(mask, start, direction):
    """Index of first true in ``mask`` walking from ``start`` (inclusive) in
    ``direction`` (+1/-1); returns (idx, found).

    Implemented as min/max reductions over a masked iota instead of
    ``argmax`` on a reversed copy — the ``[..., ::-1]`` flip materializes a
    full waveform-sized intermediate on TPU; a masked reduction fuses into
    one pass.
    """
    n = mask.shape[-1]
    pos = jnp.arange(n, dtype=jnp.int32)
    if direction > 0:
        valid = mask & (pos >= start[..., None])
        idx = jnp.min(jnp.where(valid, pos, n), axis=-1)
        found = idx < n
        idx = jnp.where(found, idx, 0)  # argmax returns 0 when none true
    else:
        valid = mask & (pos <= start[..., None])
        # last true <= start
        idx = jnp.max(jnp.where(valid, pos, -1), axis=-1)
        found = idx >= 0
        idx = jnp.where(found, idx, n - 1)
    return idx, found


def _crossing_masks(w_in, a):
    """Forward/backward threshold-crossing predicates.

    fwd[i] (i in [0, n-2]): crossing between samples i and i+1, either
    direction; reported index is i (reference ``time_point_thresh.py:76-83``).
    bwd[i] (i in [1, n-1]): crossing between i-1 and i with the reference's
    strict/inclusive orientation (``:85-92``); reported index is i.
    """
    a = a[..., None] if hasattr(a, "ndim") and a.ndim else a
    w0 = w_in[..., :-1]
    w1 = w_in[..., 1:]

    def pad_mask(m, side):
        # pad in int32, not bool: Mosaic cannot bitcast padded i1 vregs
        # (generic row-tile fusion) — the int round-trip is free in XLA
        mi = jnp.pad(
            m.astype(jnp.int32), [(0, 0)] * (w_in.ndim - 1) + [side]
        )
        return mi != 0

    up = (w0 <= a) & (a < w1)
    dn = (w0 >= a) & (a > w1)
    fwd = pad_mask(up | dn, (0, 1))
    upb = (w0 < a) & (a <= w1)
    dnb = (w0 > a) & (a >= w1)
    bwd = pad_mask(upb | dnb, (1, 0))
    return fwd, bwd


@kernel("(n),(),(),()->()", ["ffff->f", "dddd->d"], badrow_arg=0)
def time_point_thresh(w_in, a_threshold, t_start, walk_forward, badrow=None):
    """Index just before the threshold crossing, walking fwd/back from
    ``t_start`` (reference ``time_point_thresh.py:20``)."""
    n = w_in.shape[-1]
    a = jnp.asarray(a_threshold, w_in.dtype)
    t = jnp.asarray(t_start)
    ti = jnp.trunc(t).astype(jnp.int32)
    if ti.ndim == 0:
        ti = jnp.broadcast_to(ti, w_in.shape[:-1])
    if a.ndim == 0:
        a = jnp.broadcast_to(a, w_in.shape[:-1])

    fwd, bwd = _crossing_masks(w_in, a)
    # forward walk scans i in [t_start, n-2]
    idx_f, found_f = _first_true_from(fwd, ti, +1)
    # backward walk scans i in [t_start, 1] reporting i (mask index i means
    # crossing between i-1 and i)
    idx_b, found_b = _first_true_from(bwd, ti, -1)

    if isinstance(walk_forward, (int, float, np.integer, np.floating)):
        idx, found = (idx_f, found_f) if int(walk_forward) == 1 else (idx_b, found_b)
    else:
        forward = jnp.asarray(walk_forward) == 1
        idx = jnp.where(forward, idx_f, idx_b)
        found = jnp.where(forward, found_f, found_b)

    val = idx.astype(w_in.dtype)
    in_range = (ti >= 0) & (ti < n)
    integral = jnp.trunc(t) == t
    bad = (
        (isnan_any(w_in, 1) if badrow is None else badrow)
        | jnp.isnan(a)
        | isnan_any(t)
        | ~in_range
        | ~integral
        | ~found
    )
    return nanmask(bad, val)


def _start_index_checker(w_in, a, t, nan_extra=None):
    """Shared checked-mode flag for the reference's per-event start-index
    fatals (``time_point_thresh.py:66-74``, NaN inputs short-circuit to NaN
    outputs first): 1 = non-integral start, 2 = start out of range."""
    n = w_in.shape[-1]
    t = jnp.asarray(t)
    skip = isnan_any(w_in, 1) | isnan_any(jnp.asarray(a)) | isnan_any(t)
    if nan_extra is not None:
        skip = skip | nan_extra
    if jnp.issubdtype(t.dtype, jnp.floating):
        nonint = jnp.floor(t) != t
    else:
        nonint = jnp.zeros(t.shape, bool)
    ti = jnp.floor(t).astype(jnp.int32)
    oor = (ti < 0) | (ti >= n)
    code = jnp.where(nonint, 1, jnp.where(oor, 2, 0)).astype(jnp.int32)
    code = jnp.where(skip, 0, code)
    lead = jnp.broadcast_shapes(code.shape, w_in.shape[:-1])
    return jnp.broadcast_to(code, lead)


def _tpt_checker(w_in, a_threshold, t_start, walk_forward, badrow=None):
    return _start_index_checker(w_in, a_threshold, t_start)


time_point_thresh.checker = _tpt_checker
time_point_thresh.check_messages = {
    1: "The starting index must be an integer",
    2: "The starting index is out of range",
}


@kernel("(n),(),(),(),()->()", ["fffib->f", "dddlb->d"], static=[4])
def interpolated_time_point_thresh(w_in, a_threshold, t_start, walk_forward, mode_in):
    """Crossing time with sub-sample interpolation
    (reference ``time_point_thresh.py:103``)."""
    mode = static_int(mode_in, "interpolated_time_point_thresh", "mode_in")
    if mode not in tuple(ord(c) for c in "iabrnlfc"):
        raise DSPFatal("Unrecognized interpolation mode")
    n = w_in.shape[-1]
    a = jnp.asarray(a_threshold, w_in.dtype)
    t = jnp.asarray(t_start)
    ti = jnp.trunc(t).astype(jnp.int32)
    if ti.ndim == 0:
        ti = jnp.broadcast_to(ti, w_in.shape[:-1])
    if a.ndim == 0:
        a = jnp.broadcast_to(a, w_in.shape[:-1])

    fwd, bwd = _crossing_masks(w_in, a)
    idx_f, found_f = _first_true_from(fwd, ti, +1)
    # reference backward loop stops at i=2 (range(int(t_start), 1, -1)),
    # reporting i_cross = i-1; mask index i covers i>=1 → restrict to i>=2
    pos = jnp.arange(n)
    bwd = bwd & (pos >= 2)
    idx_b, found_b = _first_true_from(bwd, ti, -1)
    idx_b = idx_b - 1

    wf = jnp.asarray(walk_forward)
    if wf.ndim == 0 and isinstance(walk_forward, (int, float, np.integer, np.floating)):
        if walk_forward > 0:
            i_cross, found = idx_f, found_f
        else:
            i_cross, found = idx_b, found_b
    else:
        cond = wf > 0
        i_cross = jnp.where(cond, idx_f, idx_b)
        found = jnp.where(cond, found_f, found_b)

    w_c = take_last(w_in, i_cross)
    w_c1 = take_last(w_in, i_cross + 1)
    ch = chr(mode)
    if ch == "i":
        val = i_cross.astype(w_in.dtype)
    elif ch in ("a", "f"):
        val = (i_cross + 1).astype(w_in.dtype)
    elif ch in ("b", "c"):
        val = i_cross.astype(w_in.dtype)
    elif ch == "r":
        val = jnp.where(
            jnp.abs(a - w_c) < jnp.abs(a - w_c1), i_cross, i_cross + 1
        ).astype(w_in.dtype)
    elif ch == "n":
        val = i_cross.astype(w_in.dtype) + w_in.dtype.type(0.5)
    else:  # 'l'
        val = i_cross.astype(w_in.dtype) + (a - w_c) / (w_c1 - w_c)

    in_range = (t >= 0) & (t < n)
    bad = isnan_any(w_in, 1) | jnp.isnan(a) | isnan_any(t) | ~in_range | ~found
    return nanmask(bad, val)


@kernel("(n),(m),(),(),()->(m)", ["ffffb->f", "ddddb->d"], static=[4])
def multi_time_point_thresh(w_in, a_threshold, t_start, polarity, mode_in):
    """All thresholds in one sweep (reference ``time_point_thresh.py:233``).

    For each threshold, the reference walks away from ``t_start`` (up-side
    thresholds walk along ``polarity``, down-side against it) and records the
    first monotone crossing ``w[i] <= thr < w[i+polarity]``. Vectorized here
    as two masked reductions per threshold.
    """
    mode = static_int(mode_in, "multi_time_point_thresh", "mode_in")
    if mode not in tuple(ord(c) for c in "iabrnlfc"):
        raise DSPFatal("Unrecognized interpolation mode")
    n = w_in.shape[-1]
    a = jnp.asarray(a_threshold, w_in.dtype)
    t = jnp.asarray(t_start)
    ti = jnp.trunc(t).astype(jnp.int32)
    if ti.ndim == 0:
        ti = jnp.broadcast_to(ti, w_in.shape[:-1])

    pol = polarity
    if isinstance(pol, (int, float, np.integer, np.floating)):
        if pol == 0:
            raise DSPFatal("polarity cannot be 0")
        pol = 1 if pol > 0 else -1
        pols = (pol,)
    else:
        pols = None

    a_start = take_last(w_in, ti)

    def search(pol_static):
        """Chained walk over sorted thresholds (time_point_thresh.py:316-399).

        The reference sorts the thresholds, splits them at ``w[t_start]``
        into an up-side suffix and a down-side prefix, and walks each group
        *sequentially*: threshold k+1 continues from threshold k's crossing
        position (the ``while`` re-checks the same ``i_wf``), and if any
        threshold in a group is never found, every later one in that group
        stays NaN. A per-threshold independent first-crossing search is NOT
        equivalent on non-monotone waveforms, so this runs a ``lax.scan``
        over the sorted thresholds (m is small and static) with carry
        (position, alive).

        Walk ranges mirror the reference exactly, including its wrap-around
        artifacts: for ``polarity=-1`` the up-side walk reaches ``i_wf=0``
        where ``w_in[i_wf - 1]`` Python-negative-indexes to ``w_in[n-1]``
        (handled by the roll), and the down-side walk starts at
        ``i_wf = t_start - 1 = -1`` when ``t_start == 0``, reading
        ``w_in[-1]/w_in[-2]`` and recording ``-1`` (the virtual slot below)
        — unintended upstream, but user-visible behavior and hence the spec.
        """
        from jax import lax

        m = a.shape[-1]
        bshape = jnp.broadcast_shapes(w_in.shape[:-1], a.shape[:-1], ti.shape)
        w = jnp.broadcast_to(w_in, (*bshape, n))
        ab = jnp.broadcast_to(a, (*bshape, m))
        tib = jnp.broadcast_to(ti, bshape)
        # roll wraps exactly like the reference's negative indexing
        w_next = jnp.roll(w, -pol_static, axis=-1)
        pos = jnp.arange(n, dtype=jnp.int32)

        order = jnp.argsort(ab, axis=-1, stable=True)
        a_sorted = jnp.take_along_axis(ab, order, axis=-1)
        up_sorted = a_sorted >= jnp.broadcast_to(a_start, bshape)[..., None]

        # scan axes lead: [m, *bshape]
        thr_seq = jnp.moveaxis(a_sorted, -1, 0)
        up_seq = jnp.moveaxis(up_sorted, -1, 0)

        def chain(thr_xs, active_xs, p0, increasing, virtual_minus1):
            def step(carry, x):
                p, alive = carry
                thr, active = x
                tcol = thr[..., None]
                crossk = (w <= tcol) & (tcol < w_next)
                if increasing:
                    valid = (
                        crossk
                        & (pos >= jnp.maximum(p, 0)[..., None])
                        & (pos <= n - 2)
                    )
                    idxk = jnp.min(jnp.where(valid, pos, n), axis=-1)
                    foundk = idxk < n
                    idxk = jnp.where(foundk, idxk, 0)
                    if virtual_minus1:
                        vhit = (p <= -1) & crossk[..., n - 1]
                        idxk = jnp.where(vhit, -1, idxk)
                        foundk = foundk | vhit
                else:
                    valid = crossk & (pos <= p[..., None])
                    idxk = jnp.max(jnp.where(valid, pos, -1), axis=-1)
                    foundk = idxk >= 0
                    idxk = jnp.where(foundk, idxk, 0)
                hit = active & alive & foundk
                return (
                    (jnp.where(hit, idxk, p), alive & (foundk | ~active)),
                    (jnp.where(hit, idxk, 0), hit),
                )

            alive0 = jnp.ones(bshape, bool)
            _, (idxs, hits) = lax.scan(
                step, (p0, alive0), (thr_xs, active_xs)
            )
            return idxs, hits

        # up-side: ascending thresholds from i_start, walk from t_start
        # along polarity (range(ts, n-1) resp. range(ts, -1, -1))
        up_idx, up_hit = chain(
            thr_seq, up_seq, tib, increasing=pol_static > 0,
            virtual_minus1=False,
        )
        # down-side: descending thresholds from i_start-1, walk from
        # t_start-1 against polarity (range(ts-1, -1, -1) resp.
        # range(ts-1, n-1), the latter with the i_wf=-1 virtual start)
        dn_idx_r, dn_hit_r = chain(
            thr_seq[::-1], ~up_seq[::-1], tib - 1,
            increasing=pol_static < 0, virtual_minus1=pol_static < 0,
        )
        dn_idx, dn_hit = dn_idx_r[::-1], dn_hit_r[::-1]

        idx_sorted = jnp.moveaxis(
            jnp.where(up_seq, up_idx, dn_idx), 0, -1
        )
        found_sorted = jnp.moveaxis(
            jnp.where(up_seq, up_hit, dn_hit), 0, -1
        )
        inv = jnp.argsort(order, axis=-1)
        idx = jnp.take_along_axis(idx_sorted, inv, axis=-1)
        found = jnp.take_along_axis(found_sorted, inv, axis=-1)
        return idx, found

    if pols is not None:
        idx, found = search(pols[0])
        pol_val = pols[0]
    else:
        raise DSPFatal("multi_time_point_thresh requires a static polarity")

    def gather_m(i):
        # gather per-threshold indices (..., m) from the waveform (..., n);
        # mod-n wrap matches the reference's negative indexing at idx+pol=-1
        wb = jnp.broadcast_to(w_in[..., None, :], (*i.shape, n))
        return jnp.take_along_axis(
            wb, jnp.mod(i, n)[..., None], axis=-1
        )[..., 0]

    w_c = gather_m(idx)
    w_cp = gather_m(idx + pol_val)
    ch = chr(mode)
    fi = idx.astype(w_in.dtype)
    if ch == "i":
        val = fi
    elif ch in ("a", "f"):
        val = fi if pol_val < 0 else fi + 1
    elif ch in ("b", "c"):
        val = fi if pol_val > 0 else fi - 1
    elif ch == "r":
        val = jnp.where(a - w_c < w_cp - a, fi, fi + pol_val)
    elif ch == "n":
        val = fi + 0.5 * pol_val
    else:  # 'l'
        val = fi + (a - w_c) / (w_cp - w_c)

    in_range = (t >= 0) & (t < n)
    bad = (
        isnan_any(w_in, 1)
        | isnan_any(a, 1)
        | isnan_any(t)
        | ~in_range
    )
    val = jnp.where(found, val, jnp.nan)
    return nanmask(bad, val)


@kernel(
    "(n),(),(),(),(),(),(m),(m)",
    ["fffff" + "Iff", "ddddd" + "Idd"],
    nout=3,
    uses_dims=True,
)
def bi_level_zero_crossing_time_points(
    w_in, a_pos_threshold_in, a_neg_threshold_in, gate_time_in, t_start_in, dims
):
    """Gated bipolar-threshold zero-crossing trigger finder (reference
    ``time_point_thresh.py:412``): find zero crossings that are bracketed by
    a crossing of one threshold and a return through the opposite threshold
    within ``gate_time`` samples. Companion of the RC-CR² filter for pileup.

    Outputs ``(n_crossings, polarity (m,), t_trig_times (m,))``; counts keep
    incrementing past the slot capacity, matching the reference.

    TPU-native form: the five-flag state machine becomes a ``lax.scan`` whose
    carry holds {above/below activation indices, zero-crossed flag,
    candidates, count, slot arrays}. The sweep runs batched over the whole
    event block with consecutive sample pairs as scan xs (no per-step
    dynamic slices) and one-hot masked slot writes (no scatters) — the same
    gather-free formulation as the Billauer scan in ``peak_finding``.
    """
    import jax

    m = dims["m"]
    n = w_in.shape[-1]
    gate = jnp.asarray(gate_time_in)
    tstart = jnp.asarray(t_start_in)
    pos_th = jnp.asarray(a_pos_threshold_in, w_in.dtype)
    neg_th = jnp.asarray(a_neg_threshold_in, w_in.dtype)

    lead = w_in.shape[:-1]
    wf = w_in.reshape(-1, n)
    B = wf.shape[0]

    def bshape(x):
        x = jnp.broadcast_to(x, lead) if getattr(x, "ndim", 0) == 0 else x
        return x.reshape(-1)

    gt = jnp.trunc(bshape(gate)).astype(jnp.int32)
    tsi = jnp.trunc(bshape(tstart)).astype(jnp.int32)
    pos = bshape(pos_th)
    neg = bshape(neg_th)
    slots = jnp.arange(m)[None, :]

    def slot_set(arr, emit, nc, val):
        return jnp.where(
            emit[:, None] & (slots == nc[:, None]), val[:, None], arr
        )

    def step(c, xs):
        above, below, crossed, pos_cand, neg_cand, nc, pol, trig = c
        w0, w1, i = xs
        act = i >= tsi
        below_on = below >= 0
        zneg = below_on & (w0 <= 0) & (0 < w1)
        crossed = crossed | (act & zneg)
        neg_cand = jnp.where(act & zneg, i, neg_cand)

        # positive-threshold crossing
        pcross = act & (w0 <= pos) & (pos < w1)
        emit_neg = pcross & crossed & below_on & ((i - below) < gt)
        retrig_a = pcross & crossed & below_on & ~((i - below) < gt)
        plain_a = pcross & ~(crossed & below_on)
        fit = emit_neg & (nc < m)
        pol = slot_set(pol, fit, nc, jnp.zeros_like(pol[:, 0]))
        trig = slot_set(trig, fit, nc, neg_cand.astype(wf.dtype))
        nc = nc + emit_neg
        above = jnp.where(retrig_a | plain_a, i, above)
        below = jnp.where(pcross & crossed & below_on, -1, below)
        crossed = jnp.where(pcross & below_on, False, crossed)

        above_on = above >= 0
        zpos = act & above_on & (w0 >= 0) & (0 > w1)
        crossed = crossed | zpos
        pos_cand = jnp.where(zpos, i, pos_cand)

        # negative-threshold crossing
        ncross = act & (w0 >= neg) & (neg > w1)
        emit_pos = ncross & crossed & above_on & ((i - above) < gt)
        retrig_b = ncross & crossed & above_on & ~((i - above) < gt)
        plain_b = ncross & ~(crossed & above_on)
        fit = emit_pos & (nc < m)
        pol = slot_set(pol, fit, nc, jnp.ones_like(pol[:, 0]))
        trig = slot_set(trig, fit, nc, pos_cand.astype(wf.dtype))
        nc = nc + emit_pos
        below = jnp.where(retrig_b | plain_b, i, below)
        above = jnp.where(ncross & crossed & above_on, -1, above)
        crossed = jnp.where(ncross & above_on, False, crossed)

        return (above, below, crossed, pos_cand, neg_cand, nc, pol, trig), None

    init = (
        jnp.full((B,), -1, jnp.int32),
        jnp.full((B,), -1, jnp.int32),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), jnp.int32),
        jnp.full((B, m), jnp.nan, wf.dtype),
        jnp.full((B, m), jnp.nan, wf.dtype),
    )
    xs = (wf.T[:-1], wf.T[1:], jnp.arange(n - 1, dtype=jnp.int32))
    (_, _, _, _, _, nc, pol, trig), _ = jax.lax.scan(
        step, init, xs, unroll=8
    )
    nc = nc.reshape(lead)
    pol = pol.reshape(*lead, m)
    trig = trig.reshape(*lead, m)

    tstart_f = jnp.broadcast_to(jnp.asarray(t_start_in, jnp.float64 if w_in.dtype == jnp.float64 else jnp.float32), lead)
    bad = (
        isnan_any(w_in, 1)
        | isnan_any(pos_th)
        | isnan_any(neg_th)
        | isnan_any(gate)
        | isnan_any(tstart)
        | (jnp.floor(tstart_f) != tstart_f)
        | (jnp.trunc(tstart_f).astype(jnp.int32) < 0)
        | (jnp.trunc(tstart_f).astype(jnp.int32) >= n)
    )
    pol = nanmask(bad, pol)
    trig = nanmask(bad, trig)
    nc_out = jnp.where(bad, 0, nc).astype(jnp.uint32)
    return nc_out, pol, trig


def _bilevel_checker(
    w_in, a_pos_threshold_in, a_neg_threshold_in, gate_time_in, t_start_in,
    dims=None,
):
    """Checked-mode flag mirroring the reference's per-event start-index
    fatals (``time_point_thresh.py:478-483``); NaN thresholds/waveforms
    short-circuit to NaN outputs first."""
    nan_extra = isnan_any(jnp.asarray(a_neg_threshold_in))
    return _start_index_checker(
        w_in, a_pos_threshold_in, t_start_in, nan_extra=nan_extra
    )


bi_level_zero_crossing_time_points.checker = _bilevel_checker
bi_level_zero_crossing_time_points.check_messages = {
    1: "The starting index must be an integer",
    2: "The starting index is out of range",
}


def tp_from_cross_mask(walk_forward: int) -> "Kernel":
    """Factory: finish a ``time_point_thresh`` whose crossing predicates a
    fused front emitted as a uint8 bitplane (bit 0 = forward crossing at
    ``i``, bit 1 = backward crossing at ``i+1`` — exactly
    :func:`_crossing_masks`' positions). Bit-identical to
    ``time_point_thresh(trap, a, t_start, walk)``: a NaN-poisoned row or
    NaN threshold arrives as an all-zero plane (not-found -> NaN), and the
    start-index checks here mirror the original kernel. Substituted by the
    engine's energy-front fusion for searches over traps the front holds
    in VMEM (the flagship's ``tp_0_atrap``)."""
    from ._kernel import Kernel

    wf = int(walk_forward)

    def fn(mask_in, t_start):
        n = mask_in.shape[-1]
        t = jnp.asarray(t_start)
        ti = jnp.trunc(t).astype(jnp.int32)
        if ti.ndim == 0:
            ti = jnp.broadcast_to(ti, mask_in.shape[:-1])
        bit = 1 if wf == 1 else 2
        m = (mask_in & bit) != 0
        idx, found = _first_true_from(m, ti, +1 if wf == 1 else -1)
        in_range = (ti >= 0) & (ti < n)
        integral = jnp.trunc(t) == t
        bad = isnan_any(t) | ~in_range | ~integral | ~found
        return nanmask(bad, idx.astype(jnp.float32))

    return Kernel(
        fn, "(n),()->()", ["Bf->f", "Bd->d"], name="tp_from_cross_mask"
    )


def _mtpt_checker(w_in, a_threshold, t_start, polarity, mode_in):
    """Checked-mode flag for the reference's polarity fatal
    (``time_point_thresh.py:313-314``): 1 = polarity is 0. NaN inputs and
    an out-of-range ``t_start`` short-circuit to NaN outputs first
    (``:302-307``), so they must not flag."""
    n = w_in.shape[-1]
    a = jnp.asarray(a_threshold)
    t = jnp.asarray(t_start)
    skip = isnan_any(w_in, 1) | isnan_any(a, 1) | isnan_any(t)
    skip = skip | (t < 0) | (t >= n)
    pol = jnp.asarray(polarity)
    code = jnp.where(~skip & (pol == 0), 1, 0).astype(jnp.int32)
    lead = jnp.broadcast_shapes(code.shape, w_in.shape[:-1])
    return jnp.broadcast_to(code, lead)


multi_time_point_thresh.checker = _mtpt_checker
multi_time_point_thresh.check_messages = {1: "polarity cannot be 0"}

# generic row-tile fusion: masked-iota min/max searches (the multi/bi_level
# variants run lax.scan + argsort — excluded)
time_point_thresh.tile_safe = True
interpolated_time_point_thresh.tile_safe = True
