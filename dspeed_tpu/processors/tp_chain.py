"""Chained threshold time-point cascade in one kernel.

The canonical HPGe timing block (e.g. the LEGEND icpc config, reference
``tests/configs/icpc-dsp-config.json``) computes ~10 rise-time points as a
*cascade* of :func:`.time_point_thresh` calls: ``tp_100``/``tp_99`` walk
forward from ``tp_0_est``, then each lower threshold walks backward from the
previous time point. Run as separate processors this re-reads the waveform
(and re-materializes crossing masks) once per threshold — on TPU that is
~40 HBM passes for pure latency-bound reductions.

:func:`chained_time_point_thresh` is the TPU-native formulation: a factory
that takes the whole cascade structure (threshold scale factors, walk
directions, and which earlier time point each search starts from) and returns
a single kernel computing every time point in one call. Each link reproduces
:func:`.time_point_thresh` semantics exactly (same crossing predicates, same
NaN propagation), so the outputs are bit-identical to the cascade of separate
calls — there is simply one kernel for XLA to fuse instead of ten.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask
from ._kernel import Kernel
from .time_point_thresh import _crossing_masks, _first_true_from

__all__ = ["chained_time_point_thresh"]


def chained_time_point_thresh(factors, walk_forward, start_from) -> Kernel:
    """Build a kernel computing a cascade of threshold time points.

    Parameters
    ----------
    factors
        length-``m`` sequence; threshold ``k`` is ``factors[k] * a_base``.
    walk_forward
        length-``m`` sequence of 0/1 walk directions (as in
        :func:`.time_point_thresh`).
    start_from
        length-``m`` sequence; entry ``k`` is ``-1`` to start search ``k``
        from ``t_start``, or ``j < k`` to start from time point ``j``'s
        result (the cascade link).

    Returns a kernel ``(w_in, a_base, t_start) -> (tp_0, ..., tp_{m-1})``.
    """
    factors = [float(f) for f in factors]
    dirs = [int(d) for d in walk_forward]
    starts = [int(s) for s in start_from]
    m = len(factors)
    if not (len(dirs) == len(starts) == m):
        raise DSPFatal("factors/walk_forward/start_from must have equal length")
    for k, s in enumerate(starts):
        if s >= k:
            raise DSPFatal("start_from must reference an earlier time point")

    def fn(w_in, a_base, t_start, badrow=None):
        n = w_in.shape[-1]
        if m <= 15 and jnp.asarray(w_in).dtype == jnp.float32:
            # TPU: the whole cascade in one Pallas VMEM pass — the XLA
            # route below materializes one (B, n) mask plane per link in
            # HBM. Bit-identical (the row-bad scan the kernel runs in VMEM
            # is the same reduction `badrow` carries). f64 inputs (the
            # kernel's declared d->d type under x64) stay on the XLA route:
            # the kernel compares in f32 and would flip crossings.
            from ._pallas import cascade_tp, pallas_available

            if pallas_available():
                res = cascade_tp(w_in, a_base, t_start, factors, dirs, starts)
                if res is not None:
                    return tuple(r.astype(w_in.dtype) for r in res)
        base = jnp.asarray(a_base, w_in.dtype)
        t = jnp.asarray(t_start)
        ti0 = jnp.trunc(t).astype(jnp.int32)
        if ti0.ndim == 0:
            ti0 = jnp.broadcast_to(ti0, w_in.shape[:-1])
        if base.ndim == 0:
            base = jnp.broadcast_to(base, w_in.shape[:-1])
        in_range = (ti0 >= 0) & (ti0 < n)
        integral = jnp.trunc(t) == t
        row = isnan_any(w_in, 1) if badrow is None else badrow
        root_bad = row | isnan_any(t) | ~in_range | ~integral

        # python-float scales match the engine's weak-typed `0.99*trapTmax`
        # expression arithmetic bit-for-bit
        a_list = [
            factors[k] * base if factors[k] != 1.0 else base for k in range(m)
        ]

        if m <= 127:
            # Rank-plane formulation: every link's crossing predicate is a
            # comparison of the waveform against its own threshold, so ONE
            # fused pass computes R1[i] = #{a_j < w[i]} / R2[i] = #{a_j <=
            # w[i]}, and each link tests its threshold's per-event rank
            # against the planes instead of re-reading the float waveform —
            # the links' HBM traffic halves and the per-link float compares
            # disappear. Exactly equivalent (incl. ties):
            #   w0 <= a_k       <=>  R1[i]  <= srank_k   (srank = #{a_j < a_k})
            #   a_k <  w1       <=>  srank_k < R1[i+1]
            #   a_k <= w0       <=>  crank_k <= R2[i]    (crank = #{a_j <= a_k})
            #   a_k >  w1       <=>  R2[i+1] < crank_k
            # NaN thresholds/waveforms give different raw predicates than
            # float compares, but every such row/link is NaN-masked below,
            # so outputs stay bit-identical to the float cascade.
            A = jnp.stack(a_list, axis=-1)  # (..., m)
            wexp = w_in[..., None, :]
            if m <= 15:
                # both ranks fit a nibble: pack P = R1 + 16*R2 so ONE uint8
                # plane (one reduction over the float waveform, one plane of
                # HBM traffic for all links) carries the whole cascade
                P = jnp.sum(
                    (A[..., :, None] < wexp).astype(jnp.uint8)
                    + ((A[..., :, None] <= wexp).astype(jnp.uint8) << 4),
                    axis=-2,
                    dtype=jnp.uint8,
                )
                Pa, Pb = P[..., :-1], P[..., 1:]
                R1a, R1b = Pa & 15, Pb & 15
                R2a, R2b = Pa >> 4, Pb >> 4
                rank_dtype = jnp.uint8
            else:
                R = jnp.sum((A[..., :, None] < wexp), axis=-2, dtype=jnp.int8)
                R2 = jnp.sum(
                    (A[..., :, None] <= wexp), axis=-2, dtype=jnp.int8
                )
                R1a, R1b = R[..., :-1], R[..., 1:]
                R2a, R2b = R2[..., :-1], R2[..., 1:]
                rank_dtype = jnp.int8
            srank = jnp.sum(
                A[..., :, None] > A[..., None, :], axis=-1, dtype=rank_dtype
            )  # srank[..., k] = #{a_j < a_k}
            crank = jnp.sum(
                A[..., :, None] >= A[..., None, :], axis=-1, dtype=rank_dtype
            )  # crank[..., k] = #{a_j <= a_k}
            pad_r = [(0, 0)] * (w_in.ndim - 1) + [(0, 1)]
            pad_l = [(0, 0)] * (w_in.ndim - 1) + [(1, 0)]

            def masks(k):
                sk = srank[..., k : k + 1]
                ck = crank[..., k : k + 1]
                if dirs[k] == 1:
                    up = (R1a <= sk) & (sk < R1b)
                    dn = (ck <= R2a) & (R2b < ck)
                    return jnp.pad(up | dn, pad_r, constant_values=False), +1
                upb = (ck > R2a) & (ck <= R2b)
                dnb = (sk < R1a) & (sk >= R1b)
                return jnp.pad(upb | dnb, pad_l, constant_values=False), -1
        else:

            def masks(k):
                fwd, bwd = _crossing_masks(w_in, a_list[k])
                return (fwd, +1) if dirs[k] == 1 else (bwd, -1)

        results, bads = [], []
        for k in range(m):
            if starts[k] < 0:
                s, sbad = ti0, root_bad
            else:
                prev = results[starts[k]]
                s = jnp.trunc(prev).astype(jnp.int32)
                sbad = bads[starts[k]]
            mask, sgn = masks(k)
            idx, found = _first_true_from(mask, s, sgn)
            bad = sbad | jnp.isnan(a_list[k]) | ~found
            results.append(nanmask(bad, idx.astype(w_in.dtype)))
            bads.append(bad)
        return tuple(results)

    sig = "(n),(),()->" + ",".join(["()"] * m)
    types = ["f" * 3 + "->" + "f" * m, "d" * 3 + "->" + "d" * m]
    return Kernel(
        fn, sig, types, name="chained_time_point_thresh", badrow_arg=0
    )
