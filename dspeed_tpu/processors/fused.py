"""Fused multi-stage processors (TPU fast paths).

``fused_energy_filter`` collapses the energy front of the HPGe chain —
baseline subtraction, pole-zero, trapezoid, trapezoid maximum — into one
VMEM-resident Pallas kernel on TPU (:mod:`._pallas`), with an equivalent
XLA composition as the fallback. Numerics match the unfused processors to
~1e-6 relative (see tests/processors/test_pallas.py).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_float, static_int
from ._kernel import Kernel, kernel
from ._pallas import fused_current, fused_energy, pallas_available

__all__ = [
    "fused_energy_filter",
    "fused_energy_front",
    "fused_current_front",
    "fused_conv_bank",
    "fused_t0_front",
]


def fused_conv_bank(kernels, lo: int, p: int, n_in: int | None = None) -> Kernel:
    """Factory: several constant-kernel convolutions of ONE input sharing a
    single banded-matmul window read.

    Auto-substituted by the fusion pass for parallel ``fft_convolve_wf`` /
    ``convolve_wf`` steps that read the same array with same-length kernels
    and the same mode window — the CUSP + ZAC energy pair in the flagship
    chain (reference ``convolutions.py:81``; each unfused step re-reads the
    full waveform from HBM for its own matmul). ``lo``/``p`` are the mode
    window into the full convolution. With ``n_in``, the convolutions read
    only ``w[..., :n_in]`` of a wider input — the fusion pass passes the
    unsliced source so the engine's ``var[0:n_in]`` view (a full HBM
    materialization before a Pallas custom call) disappears. Returns a
    kernel ``(w,) -> (out_1, ..., out_k)`` whose every column is computed
    by the same contraction as the single-kernel banded matmul.
    """
    import os

    import jax

    from .convolutions import _conv_banded_matmul, _conv_banded_matmul_bank

    kerns = [np.asarray(k) for k in kernels]
    if len(kerns) < 2:
        raise DSPFatal("fused_conv_bank needs at least two kernels")
    m = kerns[0].shape[-1]
    if any(k.ndim != 1 or k.shape[-1] != m for k in kerns):
        raise DSPFatal("fused_conv_bank kernels must be 1-D and same-length")
    kern_nan = [bool(np.isnan(k).any()) for k in kerns]
    lo = int(lo)
    p = int(p)
    nk = len(kerns)

    def fn(w_in, badrow=None):
        route = os.getenv("DSPEED_TPU_CONV_BANK", "auto")
        if route == "auto" and not any(kern_nan):
            from ._pallas import banded_conv_multi, pallas_available

            if pallas_available():
                outs = banded_conv_multi(w_in, kerns, lo, p, n_in=n_in)
                if outs is not None:
                    # rows already NaN-poisoned in VMEM; kernels NaN-free
                    return tuple(o.astype(w_in.dtype) for o in outs)
        if n_in is not None and w_in.shape[-1] > n_in:
            w_in = w_in[..., :n_in]  # XLA materializes the view lazily here
        # NaN rows poison every output column through the matmul itself;
        # nanmask below makes the rows canonical (all-NaN), matching the
        # unfused kernels' poisoning
        bad = isnan_any(w_in, 1) if badrow is None else badrow
        # the merged matmul's columns round ~2e-7 differently from the
        # single-kernel matmuls (the backend retiles the contraction for the
        # wider N); keep the CPU path bit-identical to the unfused steps by
        # running per-kernel there — the shared-window read only pays on TPU
        if route == "split" or (
            route == "auto" and jax.default_backend() == "cpu"
        ):
            outs = [_conv_banded_matmul(w_in, k, lo, p) for k in kerns]
        else:
            outs = _conv_banded_matmul_bank(w_in, kerns, lo, p)
        return tuple(
            nanmask(bad | knan, o) for o, knan in zip(outs, kern_nan)
        )

    sig = "(n)->" + ",".join(["(p)"] * nk)
    return Kernel(
        fn,
        sig,
        ["f->" + "f" * nk, "d->" + "d" * nk],
        name="fused_conv_bank",
        badrow_arg=0,
        mask_preserving=True,
    )


def fused_current_front(
    n_up: int, ratio: int, length: int, num_mw: int, mw_type: int,
    need: tuple = (True,) * 4,
) -> Kernel:
    """Factory: the A/E current branch — ``upsampler(ratio)`` ->
    ``moving_window_multi(length, num_mw, mw_type)`` -> ``min_max`` — as one
    VMEM pass (:func:`._pallas.fused_current`). Returns a kernel
    ``(curr,) -> (t_min, t_max, a_min, a_max)``; the upsampled intermediates
    never reach HBM. The XLA fallback composes the original kernel bodies
    (bit-identical to the unfused steps, which the fusion pass relies on).

    Requires an integer ``ratio`` whose replication map covers every output
    slot (``half + n_up <= n * ratio``, checked at trace time) and
    ``length <= 128`` (the in-VMEM box-window scheme spans at most two
    128-sample blocks).
    """
    n_up = int(n_up)
    ratio = int(ratio)
    length = int(length)
    num_mw = int(num_mw)
    mw_type = int(mw_type)
    half = ratio // 2
    if length > 128:
        raise DSPFatal("fused_current_front requires length <= 128")
    if mw_type not in (0, 1, 2):
        raise DSPFatal("Invalid mw_type")
    # dead-output elision: the fusion pass clears entries of `need`
    # (t_min, t_max, a_min, a_max) whose variables have no readers; the
    # Pallas kernels skip those reductions and emit zeros. The XLA
    # fallback always computes everything (bit-identity with the unfused
    # steps for any output that IS read).
    need = tuple(bool(x) for x in need)
    if len(need) != 4:
        raise DSPFatal("need must have four entries")

    def fn(c_in):
        n = c_in.shape[-1]
        if not (0 <= length < n_up):
            raise DSPFatal("The length of the moving window is out of range")
        if half + n_up > n * ratio:
            raise DSPFatal(
                "fused_current_front requires an all-valid upsample map"
            )
        bad = isnan_any(c_in, 1)
        if pallas_available():
            t_min, t_max, a_min, a_max = fused_current(
                c_in, ratio, half, n_up, length, num_mw, mw_type, need=need
            )
        else:
            from .min_max import min_max
            from .moving_windows import moving_window_multi
            from .upsampler import upsampler

            (up,) = upsampler(c_in, float(ratio), dims={"m": n_up})
            (av,) = moving_window_multi(
                up, float(length), float(num_mw), np.int32(mw_type)
            )
            t_min, t_max, a_min, a_max = min_max(av)
        dt = c_in.dtype
        return (
            nanmask(bad, t_min.astype(dt)),
            nanmask(bad, t_max.astype(dt)),
            nanmask(bad, a_min.astype(dt)),
            nanmask(bad, a_max.astype(dt)),
        )

    return Kernel(
        fn,
        "(n)->(),(),(),()",
        ["f->ffff", "d->dddd"],
        name="fused_current_front",
    )


def fused_t0_front(
    kernel_arr, curr_spec=None, atrap_spec=None, need: tuple = (True,) * 4
) -> Kernel:
    """Factory: the t0/pileup branch — ``convolve_wf(w, kern, 's')`` ->
    ``min_max`` -> ``time_point_thresh(conv, a_std, tp_start, 0)``
    (reference ``convolutions.py:24``, ``min_max.py:19``,
    ``time_point_thresh.py:20`` chained by the icpc config) — as one
    VMEM pass (:func:`._pallas.fused_t0`). Returns a kernel
    ``(w, a_std) -> (t_min, t_max, a_min, a_max, tp_0)``; the filtered
    waveform never reaches HBM (three full-array passes become one). With
    ``curr_spec = (win_m, avg_len, n_curr)`` the A/E current
    ``avg_current(windower(w, tp_0, win_m), avg_len)`` (reference
    ``windower.py:17``, ``moving_windows.py:211``) is absorbed as a sixth
    output, so ``wf_pz`` is not re-read and ``wf_le`` never exists. With
    ``atrap_spec`` (a ``("norm", rise, flat)`` / ``("asym", rise, flat,
    fall)`` trap tuple) the pileup trapezoid + its backward threshold
    search ``time_point_thresh(trap(w), a_std, tp_start, 0)`` (reference
    ``trap_filters.py:160``, ``time_point_thresh.py:20``) is absorbed as a
    final scalar output — the trap plane never reaches HBM and the
    search's full-array re-read disappears. The XLA fallback composes the
    original kernel bodies (bit-identical to the unfused steps, which the
    fusion pass relies on)."""
    kern_arr = np.asarray(kernel_arr)
    if kern_arr.ndim != 1 or np.isnan(kern_arr).any():
        raise DSPFatal("fused_t0_front needs a 1-D NaN-free kernel")
    if curr_spec is not None:
        curr_spec = tuple(int(x) for x in curr_spec)
        if len(curr_spec) != 3 or curr_spec[1] <= 0:
            raise DSPFatal("curr_spec must be (win_m, avg_len, n_curr)")
    if atrap_spec is not None:
        if atrap_spec[0] == "norm":
            atrap_spec = ("norm", int(atrap_spec[1]), int(atrap_spec[2]))
        elif atrap_spec[0] == "asym":
            atrap_spec = (
                "asym", int(atrap_spec[1]), int(atrap_spec[2]),
                int(atrap_spec[3]),
            )
        else:
            raise DSPFatal(f"unknown trap spec kind {atrap_spec[0]!r}")
    # dead-output elision for (t_min, t_max, a_min, a_max) — see
    # fused_current_front; the XLA fallback always computes everything
    need = tuple(bool(x) for x in need)
    if len(need) != 4:
        raise DSPFatal("need must have four entries")

    def fn(w_in, a_std, badrow=None):
        from ._pallas import fused_t0

        n = w_in.shape[-1]
        if kern_arr.shape[-1] > n:
            raise DSPFatal("The filter is longer than the input waveform")
        if pallas_available():
            outs = fused_t0(
                w_in, kern_arr, a_std, curr_spec=curr_spec,
                atrap_spec=atrap_spec, need=need,
            )
            if outs is not None:  # None: geometry too big for VMEM
                return tuple(o.astype(w_in.dtype) for o in outs)
        from .convolutions import convolve_wf
        from .min_max import min_max
        from .time_point_thresh import time_point_thresh

        (c,) = convolve_wf(w_in, kern_arr, np.int8(ord("s")), dims={"p": n})
        t_min, t_max, a_min, a_max = min_max(c)
        (tp0,) = time_point_thresh(c, a_std, t_max, 0)
        res = [t_min, t_max, a_min, a_max, tp0]
        if curr_spec is not None:
            from .moving_windows import avg_current
            from .windower import windower

            win_m, avg_len, n_curr = curr_spec
            (wle,) = windower(w_in, tp0, dims={"m": win_m})
            (curr,) = avg_current(wle, float(avg_len), dims={"m": n_curr})
            res.append(curr)
        if atrap_spec is not None:
            from .trap_filters import asym_trap_filter, trap_norm

            if atrap_spec[0] == "norm":
                (atr,) = trap_norm(w_in, atrap_spec[1], atrap_spec[2])
            else:
                (atr,) = asym_trap_filter(
                    w_in, atrap_spec[1], atrap_spec[2], atrap_spec[3]
                )
            (tpa,) = time_point_thresh(atr, a_std, t_max, 0)
            res.append(tpa)
        return tuple(res)

    nout = 5 + (curr_spec is not None) + (atrap_spec is not None)
    sig = (
        "(n),()->(),(),(),(),()"
        + (",(p)" if curr_spec else "")
        + (",()" if atrap_spec else "")
    )
    return Kernel(
        fn,
        sig,
        ["ff->" + "f" * nout, "dd->" + "d" * nout],
        name="fused_t0_front",
        badrow_arg=0,
    )


def fused_energy_front(
    tau, trap_specs, emax_for=(0,), emit_blsub=False, emit_minmax=False,
    slope_specs=(), mask_specs=(),
) -> Kernel:
    """Factory: one VMEM pass producing the pole-zero waveform, every
    trapezoid read off it, and the requested trapezoid maxima.

    ``trap_specs`` is a list of ``("norm", rise, flat)`` /
    ``("asym", rise, flat, fall)`` tuples; ``emax_for`` indexes the traps
    whose maxima are emitted (in-VMEM reductions — each one replaces a
    full-array HBM re-read by an unfused amax step). With ``emit_blsub``
    the baseline-subtracted waveform is appended as a final output — the
    fusion pass sets it when other processors read ``wf_blsub``, deleting
    the separate ``bl_subtract`` step's full re-read of the waveform. With
    ``emit_minmax`` the RAW waveform's ``min_max`` quadruple is absorbed
    too (masked by waveform NaN only, like the standalone kernel), and
    ``slope_specs`` — tuples ``(src, start, stop)`` with src 0 = blsub,
    1 = pz — absorb ``linear_slope_fit`` steps over static slices of the
    resident arrays (reference ``linear_slope_fit.py:19``).
    Returns a kernel ``(w_in, a_baseline) -> (pz, trap_0, ...,
    trap_{k-1}, emax..., [mean, stdev, slope, intercept]*, [t_min, t_max,
    a_min, a_max], [blsub])``.
    The XLA fallback composes the original kernel bodies (bit-identical to
    the unfused steps); on TPU the Pallas kernel computes every trap from
    one in-VMEM prefix-sum pair (:mod:`._pallas`).
    """
    tau = float(tau)
    specs = []
    for s in trap_specs:
        kind = s[0]
        if kind == "norm":
            specs.append(("norm", int(s[1]), int(s[2])))
        elif kind == "asym":
            specs.append(("asym", int(s[1]), int(s[2]), int(s[3])))
        else:
            raise DSPFatal(f"unknown trap spec kind {kind!r}")
    specs = tuple(specs)
    k = len(specs)
    if k == 0:
        raise DSPFatal("fused_energy_front needs at least one trap spec")
    emax_for = tuple(int(i) for i in emax_for)
    if not emax_for or any(not (0 <= i < k) for i in emax_for):
        raise DSPFatal("emax_for must index trap_specs")
    slope_specs = tuple(
        (int(src), int(a0), int(b0)) for src, a0, b0 in slope_specs
    )
    if any(src not in (0, 1) or b0 <= a0 for src, a0, b0 in slope_specs):
        raise DSPFatal("slope_specs entries must be (0|1, start, stop)")
    # mask_specs: (trap spec, slope index, quadruple index, need_fwd,
    # need_bwd) — a trapezoid whose ONLY reader is a time_point_thresh
    # against one of the absorbed slope outputs emits a uint8
    # crossing-bitmask plane (bit 0 = fwd crossing at i, bit 1 = bwd at
    # i+1, exactly _crossing_masks' positions) instead of a full f32
    # plane; tp_from_cross_mask finishes the search bit-identically.
    norm_masks = []
    for sp, si, oi, ff, bb in mask_specs:
        sp = tuple(sp)
        if sp[0] == "norm":
            sp = ("norm", int(sp[1]), int(sp[2]))
        elif sp[0] == "asym":
            sp = ("asym", int(sp[1]), int(sp[2]), int(sp[3]))
        else:
            raise DSPFatal(f"unknown trap spec kind {sp[0]!r}")
        if not (0 <= int(si) < len(slope_specs)) or not (0 <= int(oi) < 4):
            raise DSPFatal("mask_specs must index a slope output")
        norm_masks.append((sp, int(si), int(oi), bool(ff), bool(bb)))
    mask_specs = tuple(norm_masks)

    def fn(w_in, a_baseline):
        n = w_in.shape[-1]
        for s in specs:
            width = 2 * s[1] + s[2] if s[0] == "norm" else s[1] + s[2] + s[3]
            if width > n:
                raise DSPFatal("The trapezoid width is wider than the waveform")
        from . import _pallas

        blsub = None
        mm = ()
        slopes = ()
        masks = ()
        if pallas_available() and n % _pallas._EN_BLK == 0:
            # the kernel NaN-poisons in VMEM (row scan + selects are free
            # there; an XLA-side nanmask re-reads and re-writes every (B, n)
            # output from HBM) — static False short-circuits nanmask below
            bad = False
            outs = fused_energy(
                w_in, a_baseline, tau, trap_specs=specs, emax_for=emax_for,
                emit_blsub=emit_blsub, emit_minmax=emit_minmax,
                slope_specs=slope_specs, mask_specs=mask_specs,
            )
            pz, traps, emaxes = outs[:3]
            rest = list(outs[3:])
            if slope_specs:
                nsl = 4 * len(slope_specs)
                slopes, rest = tuple(rest[:nsl]), rest[nsl:]
            if emit_minmax:
                mm, rest = tuple(rest[:4]), rest[4:]
            if emit_blsub:
                blsub, rest = rest[0], rest[1:]
            if mask_specs:
                masks = tuple(rest[: len(mask_specs)])
        else:
            bad = isnan_any(w_in, 1) | isnan_any(jnp.asarray(a_baseline))
            from .bl_subtract import bl_subtract
            from .pole_zero import pole_zero
            from .trap_filters import asym_trap_filter, trap_norm

            (wsub,) = bl_subtract(w_in, a_baseline)
            (pz,) = pole_zero(wsub, tau)
            if emit_blsub:
                blsub = wsub
            if slope_specs:
                from .linear_slope_fit import linear_slope_fit

                slopes = tuple(
                    o
                    for src, a0, b0 in slope_specs
                    for o in linear_slope_fit(
                        (wsub if src == 0 else pz)[..., a0:b0]
                    )
                )
            if emit_minmax:
                from .min_max import min_max

                mm = min_max(w_in)
            traps = []
            done = {}

            def one_trap(s):
                if s in done:
                    return done[s]
                if s[0] == "norm":
                    (t,) = trap_norm(pz, s[1], s[2])
                else:
                    (t,) = asym_trap_filter(pz, s[1], s[2], s[3])
                done[s] = t
                return t

            for s in specs:
                traps.append(one_trap(s))
            emaxes = [jnp.max(traps[i], axis=-1) for i in emax_for]
            if mask_specs:
                from .time_point_thresh import _crossing_masks

                mlist = []
                for sp, si, oi, ff, bb in mask_specs:
                    tr = one_trap(sp)
                    a = slopes[4 * si + oi]
                    fwd, bwd = _crossing_masks(tr, jnp.asarray(a, tr.dtype))
                    bits = jnp.zeros(tr.shape, jnp.uint8)
                    if ff:
                        bits = bits | fwd.astype(jnp.uint8)
                    if bb:
                        bits = bits | (bwd.astype(jnp.uint8) << 1)
                    badm = bad
                    while getattr(badm, "ndim", 0) < bits.ndim:
                        badm = badm[..., None]
                    mlist.append(jnp.where(badm, jnp.uint8(0), bits))
                masks = tuple(mlist)
        outs = [nanmask(bad, pz.astype(w_in.dtype))]
        outs += [nanmask(bad, t.astype(w_in.dtype)) for t in traps]
        outs += [nanmask(bad, e.astype(w_in.dtype)) for e in emaxes]
        # slope fits self-mask on their slice (== bad rows after poisoning)
        outs += [s.astype(w_in.dtype) for s in slopes]
        # min_max outputs carry their own (waveform-only) NaN mask
        outs += [m.astype(w_in.dtype) for m in mm]
        if emit_blsub:
            outs.append(nanmask(bad, blsub.astype(w_in.dtype)))
        # crossing bitmasks are uint8 (bad rows already zeroed)
        outs += list(masks)
        return tuple(outs)

    sig = (
        "(n),()->(n),"
        + ",".join(["(n)"] * k)
        + "," + ",".join(["()"] * len(emax_for))
        + ",(),(),(),()" * len(slope_specs)
        + (",(),(),(),()" if emit_minmax else "")
        + (",(n)" if emit_blsub else "")
        + ",(n)" * len(mask_specs)
    )
    nouts = (
        k + 1 + len(emax_for) + 4 * len(slope_specs)
        + 4 * bool(emit_minmax) + bool(emit_blsub)
    )
    nm = len(mask_specs)
    types = [
        "ff->" + "f" * nouts + "B" * nm,
        "dd->" + "d" * nouts + "B" * nm,
    ]
    kern = Kernel(fn, sig, types, name="fused_energy_front")
    # the fusion matcher chains a second energy front off this one's
    # emitted wf_blsub (the bl_subtract step it replaced is gone); the NaN
    # threading pass must NOT treat the absorbed min_max outputs as
    # poisoned-on-bad-rows (they carry a waveform-only mask), and the
    # trailing crossing-bitmask outputs are uint8 (never NaN)
    kern.emits_blsub = bool(emit_blsub)
    kern.emits_minmax = bool(emit_minmax)
    kern.n_mask_outputs = nm
    return kern


@kernel(
    "(n),(),(),(),()->(n),(n),()",
    ["fffff->fff", "ddddd->ddd"],
    static=[2, 3, 4],
)
def fused_energy_filter(w_in, a_baseline, t_tau, rise, flat):
    """bl_subtract + pole_zero(tau) + trap_norm(rise, flat) + amax in one
    pass: returns ``(wf_pz, wf_trap, trapEmax)``."""
    n = w_in.shape[-1]
    tau = static_float(t_tau, "fused_energy_filter", "t_tau")
    r = static_int(rise, "fused_energy_filter", "rise")
    f = static_int(flat, "fused_energy_filter", "flat")
    if 2 * r + f > n:
        raise DSPFatal("The trapezoid width is wider than the waveform")

    from . import _pallas

    if pallas_available() and n % _pallas._EN_BLK == 0:
        bad = False  # kernel NaN-poisons in VMEM (see fused_energy_front)
        pz, trap, emax = fused_energy(w_in, a_baseline, tau, r, f)
    else:
        bad = isnan_any(w_in, 1) | isnan_any(jnp.asarray(a_baseline))
        # XLA fallback: compose the ORIGINAL kernel bodies so the fused
        # step is bit-identical to the unfused pole_zero -> trap_norm ->
        # amax chain it replaces (the fusion pass relies on this)
        from .bl_subtract import bl_subtract
        from .pole_zero import pole_zero
        from .trap_filters import trap_norm

        (wsub,) = bl_subtract(w_in, a_baseline)
        (pz,) = pole_zero(wsub, tau)
        (trap,) = trap_norm(pz, r, f)
        emax = jnp.max(trap, axis=-1)
    return (
        nanmask(bad, pz.astype(w_in.dtype)),
        nanmask(bad, trap.astype(w_in.dtype)),
        nanmask(bad, emax.astype(w_in.dtype)),
    )
