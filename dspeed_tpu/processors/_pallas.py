"""Pallas TPU kernels for hot DSP ops.

Currently: the fused energy front (``fused_energy``) — baseline subtraction,
pole-zero, every trapezoid, and the energy maximum in one VMEM-resident pass
per row block, with the cumulative sums as in-block triangular matmuls on
the MXU. One HBM read of the waveform replaces the unfused chain's
per-processor passes.

Enabled on TPU backends; ``DSPEED_TPU_PALLAS=0`` disables, and the one-time
smoke compile in :func:`pallas_available` guards against environments where
the kernel does not build (callers then use the bit-identical XLA
composition in :mod:`.fused`).

(A shift-FMA FIR convolution kernel lived here in round 1; it lost to both
the matmul-FFT and the banded-matmul convolution at every length on v5e and
was removed.)
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)

__all__ = [
    "pallas_available", "fused_energy", "fused_current", "banded_conv_multi",
]

_SMOKE_OK: bool | None = None


def pallas_available() -> bool:
    """True when Pallas kernels should be used: TPU backend, not disabled,
    and a one-time tiny kernel actually compiles and runs (an exception at
    XLA compile time would escape the per-call fallback try/except)."""
    global _SMOKE_OK
    if os.getenv("DSPEED_TPU_PALLAS", "1") in ("0", "false"):
        return False
    try:
        if jax.default_backend() in ("cpu",):
            return False
    except Exception:
        return False
    if _SMOKE_OK is None:
        try:
            # exercise the kernels actually routed in production: a failure
            # to compile EITHER must disable the whole Pallas path, or the
            # chain trace would die at driver time with no fallback
            w = jnp.ones((_EN_TILE_B, _EN_BLK), jnp.float32)
            bl = jnp.ones((_EN_TILE_B, 1), jnp.float32)
            omc = jnp.full((1, 1), 1e-4, jnp.float32)
            outs = _fused_energy_call(
                w, bl, omc, (("norm", 4, 2), ("asym", 3, 2, 5))
            )
            jax.block_until_ready(outs)
            c = jnp.ones((_CUR_TILE_B, 600), jnp.float32)
            outs = _fused_current_call(
                c, half=0, n_up=600, L=48, num=3, mtype=0
            )
            jax.block_until_ready(outs)
            cp = jnp.ones((_POLY_TILE_B, 40), jnp.float32)
            assert _poly_plan(40, 16, 8, 600, 48, 3, 0) is not None
            outs = _fused_current_poly_call(
                cp, n_curr=40, ratio=16, half=8, n_up=600, L=48, num=3,
                mtype=0,
            )
            jax.block_until_ready(outs)
            import numpy as np

            wc = jnp.ones((_BC_TILE_B, 256), jnp.float32)
            outs = banded_conv_multi(
                wc, [np.ones(33, np.float64)], lo=16, p=256
            )
            assert outs is not None
            jax.block_until_ready(outs)
            wt = jnp.ones((_T0_TILE_B, 256), jnp.float32)
            outs = fused_t0(wt, np.ones(33, np.float64), jnp.ones(_T0_TILE_B))
            jax.block_until_ready(outs)
            _SMOKE_OK = True
        except Exception:
            _SMOKE_OK = False
    return _SMOKE_OK


# ---------------------------------------------------------------------------
# fused energy pipeline: bl_subtract -> pole_zero -> trapezoid -> max
# ---------------------------------------------------------------------------
#
# Scan-free formulation. With S = cumsum(w) and S2 = cumsum(S) (both exact
# running sums with S[k<0] = 0), the pole-zero output telescopes to
#     pz[i] = w[i] + omc * (S[i] - w[i])          (omc = -expm1(-1/tau))
# so its prefix sum is
#     Spz[i] = (1 - omc) * S[i] + omc * S2[i]
# and the trapezoid is the 4-term difference
#     T[i] = Spz[i] - Spz[i-r] - Spz[i-r-f] + Spz[i-2r-f].
# Both cumsums are per-block triangular matmuls (MXU) with matmul-computed
# carries — no sequential scan anywhere.

_EN_TILE_B = 8
_EN_BLK = 128  # tuned on v5e: 128-wide HIGHEST tri matmuls beat 512 by ~20%
# Cumsum tri-matmul precision. Mosaic lowers only DEFAULT and HIGHEST;
# HIGH (bf16x3) raises NotImplementedError in the Mosaic dot lowering
# (checked jax 0.9, r4). _split3_k below hand-rolls something strictly
# better than HIGH for the big prefix matmuls: their constant operand is
# integer <= _EN_BLK (exact in bf16), so splitting only the data operand
# into three bf16 components keeps every product exact, and stacking the
# components along K makes it ONE DEFAULT MXU op (3 passes vs HIGHEST's
# 6; separate dots + VPU adds measured slower than HIGHEST on v5e).
# DSPEED_TPU_EN_SPLIT3=0 ablates back to HIGHEST.
_EN_PRECISION = jax.lax.Precision.HIGHEST
_EN_SPLIT3 = os.getenv("DSPEED_TPU_EN_SPLIT3", "1") not in ("0", "false")
# Short trap windows (<= 32 taps, summed directly for accuracy — see
# _trap_windows) built by binary doubling (D_2k = D_k + shift(D_k, k)):
# ceil(log2 L) + popcount(L) - 1 shifted adds instead of L - 1. The
# flagship's 8-sample atrap rise drops from 7 shifted adds to 3.
# DSPEED_TPU_EN_WINLOG=0 ablates back to the sequential sum.
_EN_WINLOG = os.getenv("DSPEED_TPU_EN_WINLOG", "1") not in ("0", "false")


def _split3_k(x):
    """f32 ``x`` as three bf16 components concatenated along the last
    (contraction) axis: x == x1 + x2 + x3 to < eps_f32 * |x| per element
    (x1/x2 leave <= 2^-16 |x|; the residual after x3 is < 2^-24 |x|).
    NaN propagates through x1."""
    x1 = x.astype(jnp.bfloat16)
    r = x - x1.astype(jnp.float32)
    x2 = r.astype(jnp.bfloat16)
    x3 = (r - x2.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([x1, x2, x3], axis=-1)


def _blocked_prefix(x, tri, tri8x, tb, n):
    """Inclusive prefix sum along rows: per-block triangular matmul (MXU)
    plus matmul-computed carries — no sequential scan. ``tri`` is the
    (BLK, BLK) inclusive lower-triangular ones (transposed), ``tri8x`` the
    (nb, nb) strictly-upper ones for the exclusive block carry."""
    nb = n // _EN_BLK
    xb = x.reshape(tb * nb, _EN_BLK)
    hp = _EN_PRECISION  # default (bf16) would round the ~1e8 sums
    if _EN_SPLIT3:
        local = jnp.dot(_split3_k(xb), jnp.concatenate(
            [tri.astype(jnp.bfloat16)] * 3, axis=0),
            preferred_element_type=jnp.float32)
    else:
        local = jnp.dot(xb, tri, preferred_element_type=jnp.float32,
                        precision=hp)
    sums = local[:, _EN_BLK - 1].reshape(tb, nb)
    carry = jnp.dot(sums, tri8x, preferred_element_type=jnp.float32,
                    precision=hp)
    return (local.reshape(tb, nb, _EN_BLK)
            + carry[:, :, None]).reshape(tb, n)


def _trap_windows(x, xsum, specs, tb, n):
    """Trapezoids from a value plane ``x`` and its prefix plane ``xsum``
    (both ``(tb, n)``), one per spec with spec-identical traps deduped —
    the same short/long window policy as the fused energy front (short
    windows add the samples directly: prefix differences of the
    ~1e8-magnitude sums would leave eps*|sum| ~ O(1) absolute error that a
    short normalization cannot hide; long windows amortize the rounding
    and use the prefix difference)."""

    # (r5 measured negative: collapsing the per-offset pad+concat copies
    # into one zero-extended plane + static slices was FLAT — 18.07 vs
    # 18.10 ms/iter whole-chain — Mosaic already folds these moves into
    # the consuming adds. Kept in the simpler per-offset form.)
    def shifted(k):
        # xsum[i-k] with zero fill for i < k
        if k == 0:
            return xsum
        pad = jnp.zeros((tb, k), jnp.float32)
        return jnp.concatenate([pad, xsum[:, : n - k]], axis=1)

    def x_shift(k):
        if k == 0:
            return x
        pad = jnp.zeros((tb, k), jnp.float32)
        return jnp.concatenate([pad, x[:, : n - k]], axis=1)

    dbl = {1: x}  # doubling cache: dbl[p][:, i] = sum of x[i-p+1 .. i]

    def doubling(p):
        if p not in dbl:
            h = doubling(p // 2)
            pad = jnp.zeros((tb, p // 2), jnp.float32)
            dbl[p] = h + jnp.concatenate(
                [pad, h[:, : n - p // 2]], axis=1
            )
        return dbl[p]

    def window_sum(length, off):
        """Sum of x over ``[t-off-length+1, t-off]`` per output t."""
        if length <= 32:
            if not _EN_WINLOG:
                acc = x_shift(off)
                for k in range(off + 1, off + length):
                    acc = acc + x_shift(k)
                return acc
            # binary doubling: split the window into power-of-two runs
            # (largest first), each a cached D_p plane shifted into place.
            # Zero-fill boundary semantics match the sequential sum
            # (x_shift zero-fills), only the f32 addition tree differs.
            acc = None
            pos, rem = off, length
            while rem:
                p = 1 << (rem.bit_length() - 1)
                d = doubling(p)
                if pos:
                    pad = jnp.zeros((tb, pos), jnp.float32)
                    d = jnp.concatenate([pad, d[:, : n - pos]], axis=1)
                acc = d if acc is None else acc + d
                pos += p
                rem -= p
            return acc
        return shifted(off) - shifted(off + length)

    done = {}
    traps = []
    for spec in specs:
        if spec in done:
            traps.append(done[spec])
            continue
        if spec[0] == "norm":
            rise, flat = spec[1], spec[2]
            trap = (
                window_sum(rise, 0) - window_sum(rise, rise + flat)
            ) * (1.0 / rise)
        else:  # asym: per-section normalization
            rise, flat, fall = spec[1], spec[2], spec[3]
            trap = window_sum(rise, 0) * (1.0 / rise) - window_sum(
                fall, rise + flat
            ) * (1.0 / fall)
        done[spec] = trap
        traps.append(trap)
    return traps


def _blocked_prefix2(x, tri, tri2, tri8x, tb, n):
    """(S, S2) = (prefix(x), prefix(prefix(x))) with the two in-block
    matmuls INDEPENDENT: S2's local part is ``x @ (tri·tri)`` (integer
    entries <= BLK, exact in bf16) plus carries derived from block sums —
    breaking the serial local -> local2 MXU dependency chain measured at
    ~0.5 ms per 16384x4096 events on v5e, with the max error vs a float64
    oracle unchanged (1.74e-7 on the probe)."""
    nb = n // _EN_BLK
    xb = x.reshape(tb * nb, _EN_BLK)
    hp = _EN_PRECISION
    if _EN_SPLIT3:
        # both locals in ONE bf16 dot: exact split stacked along K, tri
        # and tri2 (integer entries <= BLK, exact in bf16) stacked along N
        ab = jnp.concatenate(
            [tri.astype(jnp.bfloat16), tri2.astype(jnp.bfloat16)], axis=1
        )
        both = jnp.dot(
            _split3_k(xb), jnp.concatenate([ab, ab, ab], axis=0),
            preferred_element_type=jnp.float32,
        )
        local, local2 = both[:, :_EN_BLK], both[:, _EN_BLK:]
    else:
        local = jnp.dot(xb, tri, preferred_element_type=jnp.float32,
                        precision=hp)
        local2 = jnp.dot(xb, tri2, preferred_element_type=jnp.float32,
                         precision=hp)
    sums = local[:, _EN_BLK - 1].reshape(tb, nb)
    carry = jnp.dot(sums, tri8x, preferred_element_type=jnp.float32,
                    precision=hp)
    S = (local.reshape(tb, nb, _EN_BLK)
         + carry[:, :, None]).reshape(tb, n)
    # S's block totals: last col of the double prefix + BLK * carry-in
    s_bsum = local2[:, _EN_BLK - 1].reshape(tb, nb) + _EN_BLK * carry
    carry_s = jnp.dot(s_bsum, tri8x, preferred_element_type=jnp.float32,
                      precision=hp)
    jpos = jax.lax.broadcasted_iota(
        jnp.int32, (1, nb, _EN_BLK), 2
    ).astype(jnp.float32) + 1.0
    S2 = (local2.reshape(tb, nb, _EN_BLK)
          + jpos * carry[:, :, None]
          + carry_s[:, :, None]).reshape(tb, n)
    return S, S2


def _fused_energy_kernel(w_ref, bl_ref, tri_ref, tri2_ref, tri8_ref, omc_ref,
                         *refs, trap_specs: tuple, n: int,
                         emax_for: tuple = (0,), emit_blsub: bool = False,
                         emit_minmax: bool = False,
                         slope_specs: tuple = (), mask_specs: tuple = ()):
    pz_ref = refs[0]
    k = len(trap_specs)
    ke = len(emax_for)
    ns = len(slope_specs)
    trap_refs = refs[1 : 1 + k]
    emax_refs = refs[1 + k : 1 + k + ke]
    slope_refs = refs[1 + k + ke : 1 + k + ke + 4 * ns]
    mask_refs = refs[len(refs) - len(mask_specs):] if mask_specs else ()
    nb = n // _EN_BLK
    raw = w_ref[:]
    w = raw - bl_ref[:]  # (TB, n) baseline-subtracted
    if emit_minmax:
        # min_max of the RAW waveform (absorbed step): masked by waveform
        # NaN only — a NaN baseline must NOT poison these four outputs
        # (matches the standalone min_max's isnan_any(w_in))
        tmin_ref, tmax_ref, amin_ref, amax_ref = refs[
            1 + k + ke + 4 * ns : 5 + k + ke + 4 * ns
        ]
        bad_w = jnp.max((raw != raw).astype(jnp.int32), axis=1,
                        keepdims=True) > 0
        nanw = jnp.float32(jnp.nan)
        iota = jax.lax.broadcasted_iota(jnp.int32, (raw.shape[0], n), 1)
        rmin = jnp.min(raw, axis=1, keepdims=True)
        rmax = jnp.max(raw, axis=1, keepdims=True)
        tmin = jnp.min(jnp.where(raw == rmin, iota, n), axis=1, keepdims=True)
        tmax = jnp.min(jnp.where(raw == rmax, iota, n), axis=1, keepdims=True)
        tmin_ref[:] = jnp.where(bad_w, nanw, tmin.astype(jnp.float32))
        tmax_ref[:] = jnp.where(bad_w, nanw, tmax.astype(jnp.float32))
        amin_ref[:] = jnp.where(bad_w, nanw, rmin)
        amax_ref[:] = jnp.where(bad_w, nanw, rmax)
    omc = omc_ref[0, 0]
    # NaN poisoning in-kernel: the row is already resident in VMEM, so the
    # scan + the per-output selects are VPU-only — the XLA-side nanmask
    # would re-read and re-write every (B, n) output from HBM (~4 ms/iter
    # at 16384 events, measured). NaN in the baseline poisons w, so one
    # check covers both inputs. Explicit x != x (int max reduce) rather
    # than relying on NaN propagation through a float min.
    bad = jnp.max((w != w).astype(jnp.int32), axis=1, keepdims=True) > 0
    nanv = jnp.float32(jnp.nan)

    def poison(x):
        return jnp.where(bad, nanv, x)

    tri = tri_ref[:]  # (BLK, BLK) inclusive lower-triangular ones
    tri8x = tri8_ref[:]  # (nb, nb) strictly-lower ones: exclusive carry
    S, S2 = _blocked_prefix2(w, tri, tri2_ref[:], tri8x, _EN_TILE_B, n)

    pz = w + omc * (S - w)
    pz_ref[:] = poison(pz)
    spz = (1.0 - omc) * S + omc * S2

    traps = _trap_windows(pz, spz, trap_specs, _EN_TILE_B, n)
    for trap, t_ref in zip(traps, trap_refs):
        t_ref[:] = poison(trap)
    emax_done = {}
    for ti, e_ref in zip(emax_for, emax_refs):
        if ti not in emax_done:
            emax_done[ti] = jnp.max(traps[ti], axis=1, keepdims=True)
        e_ref[:] = poison(emax_done[ti])
    slope_vals = []
    for si, (src, a0, b0) in enumerate(slope_specs):
        # absorbed linear_slope_fit over a static slice of blsub (src 0)
        # or pz (src 1): closed-form mean/stdev/slope/intercept, the same
        # f32 formulas as the standalone kernel (linear_slope_fit.py)
        x = (w if src == 0 else pz)[:, a0:b0]
        L = b0 - a0
        icol = jax.lax.broadcasted_iota(
            jnp.int32, (L, 1), 0
        ).astype(jnp.float32)
        sum_y = jnp.sum(x, axis=1, keepdims=True)
        sum_xy = jnp.dot(x, icol, preferred_element_type=jnp.float32,
                         precision=_EN_PRECISION)
        mean = sum_y / L
        if L > 1:
            var = jnp.sum((x - mean) ** 2, axis=1, keepdims=True) / (L - 1)
        else:
            var = jnp.zeros_like(mean)
        stdev = jnp.sqrt(var)
        sum_x = L * (L - 1) / 2.0
        sum_x2 = (L - 1) * L * (2 * L - 1) / 6.0
        slope = (L * sum_xy - sum_x * sum_y) / (L * sum_x2 - sum_x * sum_x)
        intercept = (sum_y - sum_x * slope) / L
        quad = (mean, stdev, slope, intercept)
        slope_vals.append(quad)
        for oi, val in enumerate(quad):
            slope_refs[4 * si + oi][:] = poison(val)
    if emit_blsub:
        # the baseline-subtracted rows are already resident: emitting them
        # here deletes the separate bl_subtract step's full re-read of the
        # waveform when other processors (slope fit, CUSP/ZAC slices) read it
        blsub_ref = refs[1 + k + ke + 4 * ns + 4 * emit_minmax]
        blsub_ref[:] = poison(w)
    for (spec, si, oi, need_fwd, need_bwd), m_ref in zip(
        mask_specs, mask_refs
    ):
        # absorbed trapezoid + its threshold-crossing BITMASK: the only
        # reader is a time_point_thresh against one of the slope outputs
        # (the flagship's tp_0_atrap vs bl_std), so instead of a 268 MB
        # f32 plane + a full-array search fusion, emit one uint8 plane
        # whose bits exactly encode _crossing_masks' fwd (bit 0, crossing
        # between i and i+1 at i) / bwd (bit 1, at i+1) predicates —
        # tp_from_cross_mask reproduces the search bit-for-bit. Bad rows
        # zero out (not-found -> NaN downstream, same as the poisoned
        # trap); a NaN threshold compares false everywhere, same as the
        # float kernel.
        (tr,) = _trap_windows(pz, spz, (spec,), _EN_TILE_B, n)
        a = slope_vals[si][oi]  # (TB, 1)
        tr0 = tr[:, :-1]
        tr1 = tr[:, 1:]
        zcol = jnp.zeros((_EN_TILE_B, 1), jnp.int32)
        bits = None
        if need_fwd:
            fwd = ((tr0 <= a) & (a < tr1)) | ((tr0 >= a) & (a > tr1))
            bits = jnp.concatenate([fwd.astype(jnp.int32), zcol], axis=1)
        if need_bwd:
            bwd = ((tr0 < a) & (a <= tr1)) | ((tr0 > a) & (a >= tr1))
            b2 = jnp.concatenate([zcol, bwd.astype(jnp.int32) * 2], axis=1)
            bits = b2 if bits is None else bits | b2
        m_ref[:] = jnp.where(bad, 0, bits).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "trap_specs", "emax_for", "emit_blsub", "emit_minmax", "slope_specs",
        "mask_specs", "interpret",
    ),
)
def _fused_energy_call(w, bl, omc, trap_specs, emax_for=(0,),
                       emit_blsub=False, emit_minmax=False, slope_specs=(),
                       mask_specs=(), interpret=False):
    import numpy as np

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = w.shape
    nb = n // _EN_BLK
    lt = np.tril(np.ones((_EN_BLK, _EN_BLK), np.float32))
    tri = jnp.asarray(lt.T)
    tri2 = jnp.asarray((lt @ lt).T)  # double prefix (exact: ints <= BLK)
    # (row j) -> sum of full blocks before j: strictly upper in (sums @ M)
    tri8 = jnp.asarray(np.triu(np.ones((nb, nb), np.float32), 1))

    kern = functools.partial(
        _fused_energy_kernel, trap_specs=trap_specs, n=n, emax_for=emax_for,
        emit_blsub=emit_blsub, emit_minmax=emit_minmax,
        slope_specs=slope_specs, mask_specs=mask_specs,
    )
    grid = (b // _EN_TILE_B,)
    k = len(trap_specs)
    ke = len(emax_for)
    n_scalar = ke + 4 * len(slope_specs) + 4 * emit_minmax

    def row_spec(width):
        return pl.BlockSpec(
            (_EN_TILE_B, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kern,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((b, n), jnp.float32)] * (1 + k)
            + [jax.ShapeDtypeStruct((b, 1), jnp.float32)] * n_scalar
            + [jax.ShapeDtypeStruct((b, n), jnp.float32)] * emit_blsub
            + [jax.ShapeDtypeStruct((b, n), jnp.uint8)] * len(mask_specs)
        ),
        grid=grid,
        in_specs=[
            row_spec(n),
            row_spec(1),
            pl.BlockSpec((_EN_BLK, _EN_BLK), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_EN_BLK, _EN_BLK), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(
            [row_spec(n)] * (1 + k) + [row_spec(1)] * n_scalar
            + [row_spec(n)] * (emit_blsub + len(mask_specs))
        ),
        interpret=interpret,
    )(w, bl, tri, tri2, tri8, omc)


# ---------------------------------------------------------------------------
# fused current pipeline: upsample -> moving_window_multi -> min_max
# ---------------------------------------------------------------------------
#
# The A/E branch of the HPGe chain (upsampler x16 -> three alternating
# 48-sample moving averages -> min_max) costs ~3 ms/4096 events unfused: the
# upsampled [B, ~4.8k] intermediates make ~10 HBM passes (three blocked
# cumsums with pad-slices, two reversal copies, the upsample materialization).
# Here the whole branch runs in one VMEM pass per row block, reading the
# SHORT current waveform (~300 samples/row) and writing four scalars — the
# upsampled signal never touches HBM.
#
# No global prefix sums are needed: a length-L (<=128) box window spans at
# most two 128-sample blocks, so window sums come from in-block triangular-
# matmul cumsums plus the previous block's sum — rounding stays bounded by
# in-block magnitudes (no large-S cancellation, no compensation required).

_CUR_TILE_B = 16  # tuned on v5e (8: +18%, 32: +25% slower)
_CUR_BLK = 128


def _mw_apply(x, tri, sup, triL, L, num, mtype, n_up, n_pad, tb):
    """Apply the ``moving_window_multi`` cascade (``num`` alternating
    ``L``-sample moving averages, ``mtype`` as in the unfused kernel) to
    ``x`` of shape ``(tb, n_pad)`` whose first ``n_up`` lanes are valid
    (rest zero). VMEM-resident; shared by the up-domain kernel and the
    polyphase kernel's edge windows."""
    blk = _CUR_BLK
    nb = n_pad // blk

    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, n_pad), 1) % blk
    # Mosaic only supports integer iota — build f32 lane indices by cast
    iotaL = jax.lax.broadcasted_iota(jnp.int32, (tb, L), 1).astype(jnp.float32)
    invL = 1.0 / L

    def box_back(x):
        """``B[i] = sum x[i-L+1..i]``; for ``i < L`` this is the inclusive
        prefix ``S[i]`` — exactly what the moving-average ramp needs. A
        window spans at most two 128-blocks, so only in-block triangular-
        matmul cumsums plus the previous block's sum are involved (rounding
        bounded by in-block magnitudes; no global prefix, no compensation).
        """
        loc2 = jnp.dot(
            x.reshape(tb * nb, blk), tri,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        bs = loc2[:, blk - 1].reshape(tb, nb)
        # bs of the PREVIOUS block at each slot (superdiagonal matmul)
        bsp = jnp.dot(
            bs, sup, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        loc = loc2.reshape(tb, n_pad)
        bsp_full = (
            jnp.zeros((tb, nb, blk), jnp.float32) + bsp[:, :, None]
        ).reshape(tb, n_pad)
        # loc at linear position i-L (flat shift crosses block boundaries)
        locL = jnp.concatenate(
            [jnp.zeros((tb, L), jnp.float32), loc[:, : n_pad - L]], axis=1
        )
        return loc - locL + jnp.where(lane < L, bsp_full, 0.0)

    # ramps only touch L lanes at one end: patch them by concatenation
    # instead of full-width selects (saves several VPU passes per stage)
    def mwl(x):
        box = box_back(x)
        x0 = x[:, :1]
        # i < L: box == S[i] (in-block prefix of block 0)
        ramp = x0 + (box[:, :L] - (iotaL + 1.0) * x0) * invL
        return jnp.concatenate([ramp, box[:, L:] * invL], axis=1)

    def mwr(x):
        box = box_back(x)
        # forward window sum x[i..i+L-1] = box at i+L-1 (shift left by L-1)
        steady = box[:, L - 1 :] * invL  # value at i for i <= n_pad-L
        # ramp over the last L samples: R[i] = sum x[i..n_up-1] (<= L terms)
        tail = x[:, n_up - L : n_up]  # (TB, L)
        tailS = jnp.dot(
            tail, triL, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        R = tailS[:, L - 1 :] - tailS + tail  # suffix sums of the tail
        xlast = x[:, n_up - 1 : n_up]
        ramp = xlast + (R - (L - iotaL) * xlast) * invL
        parts = [steady[:, : n_up - L], ramp]
        if n_pad > n_up:  # Mosaic rejects zero-size vectors
            parts.append(jnp.zeros((tb, n_pad - n_up), jnp.float32))
        return jnp.concatenate(parts, axis=1)

    for it in range(num):
        go_right = ((it % 2 == 1) and (mtype == 0)) or (mtype == 2)
        x = mwr(x) if go_right else mwl(x)
    return x


def _fused_current_kernel(
    rep_ref, tri_ref, sup_ref, triL_ref, *out_refs,
    half: int, n_up: int, L: int, num: int, mtype: int,
    need: tuple = (True,) * 4,
):
    t_min_ref, t_max_ref, a_min_ref, a_max_ref = out_refs
    need_tmin, need_tmax, need_amin, need_amax = need
    tb = _CUR_TILE_B
    blk = _CUR_BLK
    nb = -(-n_up // blk)
    n_pad = nb * blk
    # slice the replicated waveform to the upsampler's window in VMEM (an
    # XLA-side slice would cost a full extra HBM pass) and zero-pad to the
    # block grid
    x = rep_ref[:][:, half : half + n_up]
    if n_pad > n_up:
        x = jnp.concatenate(
            [x, jnp.zeros((tb, n_pad - n_up), jnp.float32)], axis=1
        )
    x = _mw_apply(
        x, tri_ref[:], sup_ref[:], triL_ref[:], L, num, mtype, n_up,
        n_pad, tb,
    )

    xv = x[:, :n_up]
    zc = jnp.zeros((tb, 1), jnp.float32)
    iota = (
        jax.lax.broadcasted_iota(jnp.int32, (tb, n_up), 1)
        if need_tmin or need_tmax else None
    )
    # dead-output elision (see the polyphase kernel): un-needed extrema
    # skip their reductions entirely and write zeros
    if need_tmin or need_amin:
        a_min = jnp.min(xv, axis=1, keepdims=True)
        a_min_ref[:] = a_min
        if need_tmin:
            t_min = jnp.min(
                jnp.where(xv == a_min, iota, n_up), axis=1, keepdims=True
            )
            t_min_ref[:] = t_min.astype(jnp.float32)
        else:
            t_min_ref[:] = zc
    else:
        a_min_ref[:] = zc
        t_min_ref[:] = zc
    if need_tmax or need_amax:
        a_max = jnp.max(xv, axis=1, keepdims=True)
        a_max_ref[:] = a_max
        if need_tmax:
            t_max = jnp.min(
                jnp.where(xv == a_max, iota, n_up), axis=1, keepdims=True
            )
            t_max_ref[:] = t_max.astype(jnp.float32)
        else:
            t_max_ref[:] = zc
    else:
        a_max_ref[:] = zc
        t_max_ref[:] = zc


@functools.partial(
    jax.jit,
    static_argnames=("half", "n_up", "L", "num", "mtype", "need",
                     "interpret"),
)
def _fused_current_call(rep, half, n_up, L, num, mtype, need=(True,) * 4,
                        interpret=False):
    import numpy as np

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n_rep = rep.shape
    nb = -(-n_up // _CUR_BLK)
    tri = jnp.asarray(
        np.tril(np.ones((_CUR_BLK, _CUR_BLK), np.float32)).T
    )
    sup = jnp.asarray(np.eye(nb, k=1, dtype=np.float32))
    triL = jnp.asarray(np.tril(np.ones((L, L), np.float32)).T)
    kern = functools.partial(
        _fused_current_kernel, half=half, n_up=n_up, L=L, num=num,
        mtype=mtype, need=need,
    )
    grid = (b // _CUR_TILE_B,)

    def row_spec(width):
        return pl.BlockSpec(
            (_CUR_TILE_B, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def const_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, 1), jnp.float32) for _ in range(4)
        ),
        grid=grid,
        in_specs=[
            row_spec(n_rep),
            const_spec((_CUR_BLK, _CUR_BLK)),
            const_spec((nb, nb)),
            const_spec((L, L)),
        ],
        out_specs=tuple(row_spec(1) for _ in range(4)),
        interpret=interpret,
    )(rep, tri, sup, triL)


# --- polyphase formulation -------------------------------------------------
#
# Away from the edges the whole cascade is LTI: out = h * x_up with
# h = the convolution of the ``num`` boxes. Since x_up[j] = c[(j+half)//ratio]
# is a replication, out[ratio*t + p] = sum_q H_p[q] c[t + q] with ~len(h)/
# ratio-tap per-phase filters H_p — so the interior collapses to small
# banded MXU matmuls on the SHORT current waveform, ~10x fewer FLOPs than
# running the box cascade at upsampled width (which is what the up-domain
# kernel above does). Only two ``_POLY_W``-wide windows at the true edges
# still run the exact staged cascade (the ramps are not LTI); host-side
# margin analysis (:func:`_poly_plan`) proves which output ranges each
# method owns, and falls back to the up-domain kernel when the geometry's
# margins don't hold.

_POLY_TILE_B = 256  # r4 sweep on v5e: 64 -> 3.9 ms, 128 -> 3.2, 256 ->
# 3.0 standalone at flagship shapes (512 exceeds VMEM); fewer grid steps
# amortize the per-step latency of this tiny-input, compute-heavy kernel
_POLY_W = 2 * _CUR_BLK  # edge-window width (samples, up-domain)
_POLY_T = 32  # interior block width (samples, c-domain)


def _poly_plan(n_curr, ratio, half, n_up, L, num, mtype):
    """Host-side constants for the polyphase kernel, or ``None`` when the
    geometry's edge margins don't hold (caller uses the up-domain kernel).
    All entries are numpy/int — safe to build at trace time."""
    import numpy as np

    W, T = _POLY_W, _POLY_T
    if n_up < W or L >= W // 2 or half + n_up > n_curr * ratio:
        return None
    stages = [
        ((it % 2 == 1) and (mtype == 0)) or (mtype == 2)
        for it in range(num)
    ]
    # composite interior filter: out[j] = sum_s h[s] x_up[j - s]
    h = np.ones(1)
    s_min = 0
    for right in stages:
        h = np.convolve(h, np.full(L, 1.0 / L))
        if right:
            s_min -= L - 1
    s_max = s_min + len(h) - 1

    # LEFT edge window [0, W): a mwr stage's right ramp is globally wrong
    # here — track the lowest corrupted local index (mwl introduces nothing:
    # its left ramp IS the global edge)
    c_lo = W
    for right in stages:
        if right:
            c_lo = min(c_lo - (L - 1), W - L)
    EL = ratio * -(-max(s_max, 1) // ratio)  # interior start (mult of ratio)
    need_hi = EL  # dependency cone of outputs [0, EL)
    for right in reversed(stages):
        if right:
            need_hi += L - 1
    if not (0 < EL <= c_lo and need_hi <= W):
        return None

    # RIGHT edge window [n_up - W, n_up): mwl's left ramp is globally wrong
    # here — track the exclusive upper bound of corruption from the left
    c_hi = 0
    for right in stages:
        if not right:
            c_hi = max(c_hi + (L - 1) if c_hi else 0, L)
    j_end = ratio * ((n_up + s_min) // ratio)  # interior validity bound
    ERW = n_up - j_end
    need_lo = W - ERW
    for right in reversed(stages):
        if not right:
            need_lo -= L - 1
    if not (W - ERW >= c_hi and need_lo >= 0 and EL < j_end):
        return None

    # per-phase filters H_p[q] (q in [q_min, q_max], c-domain taps)
    s_idx = np.arange(s_min, s_max + 1)
    qs = [(p - s_idx + half) // ratio for p in range(ratio)]
    q_min = int(min(q.min() for q in qs))
    q_max = int(max(q.max() for q in qs))
    nq = q_max - q_min + 1
    Hm = np.zeros((ratio, nq))
    for p in range(ratio):
        np.add.at(Hm[p], (qs[p] - q_min).astype(int), h)

    # interior block geometry (c-domain t units)
    t0_base = EL // ratio
    total_t = (j_end - EL) // ratio
    nblk = -(-total_t // T)
    T_last = total_t - (nblk - 1) * T
    # every block's c reads must be in range
    if t0_base + q_min < 0:
        return None
    if t0_base + (nblk - 1) * T + T_last - 1 + q_max >= n_curr:
        return None

    def build_A(Tb):
        span = Tb + nq - 1
        A = np.zeros((span, ratio * Tb))
        for tl in range(Tb):
            A[tl : tl + nq, ratio * tl : ratio * (tl + 1)] = Hm.T
        return A.astype(np.float32)

    def build_sel(j0):
        R = np.zeros((n_curr, W), np.float32)
        src = (j0 + np.arange(W) + half) // ratio
        if src.min() < 0 or src.max() >= n_curr:
            return None
        R[src, np.arange(W)] = 1.0
        return R

    RL = build_sel(0)
    RR = build_sel(n_up - W)
    if RL is None or RR is None:
        return None
    return dict(
        A=build_A(T), A_last=build_A(T_last), RL=RL, RR=RR,
        EL=EL, ERW=ERW, nq=nq, q_min=q_min, t0_base=t0_base,
        nblk=nblk, T_last=T_last,
    )


def _fused_current_poly_kernel(
    c_ref, tri_ref, supW_ref, triL_ref, rl_ref, rr_ref, a_ref, alast_ref,
    *out_refs, n_curr: int, ratio: int, half: int, n_up: int, L: int,
    num: int, mtype: int, EL: int, ERW: int, nq: int, q_min: int,
    t0_base: int, nblk: int, T_last: int, need: tuple = (True,) * 4,
):
    t_min_ref, t_max_ref, a_min_ref, a_max_ref = out_refs
    tb = _POLY_TILE_B
    W = _POLY_W
    T = _POLY_T
    hp = jax.lax.Precision.HIGHEST
    c = c_ref[:]  # (TB, n_curr)
    big = jnp.int32(1 << 30)
    # dead-output elision: the fusion pass clears `need` entries whose
    # variables have no readers (not chain outputs, read by no step), and
    # the per-region VPU reductions below are this kernel's dominant cost
    # (the flagship reads only tp_aoe_max/A_max — the min side is skipped)
    need_tmin, need_tmax, need_amin, need_amax = need
    nmin = need_tmin or need_amin
    nmax = need_tmax or need_amax

    def region(vals, j0, state):
        """Fold a region's (first-occurrence) extrema into the running
        state; regions arrive in ascending-j order, so strict comparisons
        keep the earliest index on ties — global first-occurrence.
        Un-needed extrema stay ``None`` through the fold."""
        wdt = vals.shape[1]
        iota = (
            jax.lax.broadcasted_iota(jnp.int32, (tb, wdt), 1) + j0
            if need_tmin or need_tmax else None
        )
        v_mn = jnp.min(vals, axis=1, keepdims=True) if nmin else None
        v_mx = jnp.max(vals, axis=1, keepdims=True) if nmax else None
        i_mn = (
            jnp.min(jnp.where(vals == v_mn, iota, big), axis=1,
                    keepdims=True)
            if need_tmin else None
        )
        i_mx = (
            jnp.min(jnp.where(vals == v_mx, iota, big), axis=1,
                    keepdims=True)
            if need_tmax else None
        )
        if state is None:
            return v_mn, i_mn, v_mx, i_mx
        vmin, jmin, vmax, jmax = state
        if nmin:
            tk = v_mn < vmin
            vmin = jnp.where(tk, v_mn, vmin)
            if need_tmin:
                jmin = jnp.where(tk, i_mn, jmin)
        if nmax:
            tx = v_mx > vmax
            vmax = jnp.where(tx, v_mx, vmax)
            if need_tmax:
                jmax = jnp.where(tx, i_mx, jmax)
        return vmin, jmin, vmax, jmax

    # left edge: exact staged cascade on a W-wide window
    xl = jnp.dot(c, rl_ref[:], preferred_element_type=jnp.float32,
                 precision=hp)
    yl = _mw_apply(xl, tri_ref[:], supW_ref[:], triL_ref[:], L, num,
                   mtype, W, W, tb)
    state = region(yl[:, :EL], 0, None)

    # interior: banded polyphase matmuls on the short waveform
    # (concatenating the block outputs into ONE region() fold measured
    # SLOWER — the concat copy exceeds the serial-fold savings)
    A = a_ref[:]
    span = T + nq - 1
    for i in range(nblk):
        lo = t0_base + i * T + q_min
        if i < nblk - 1:
            y = jnp.dot(c[:, lo : lo + span], A,
                        preferred_element_type=jnp.float32, precision=hp)
        else:
            span_l = T_last + nq - 1
            y = jnp.dot(c[:, lo : lo + span_l], alast_ref[:],
                        preferred_element_type=jnp.float32, precision=hp)
        state = region(y, EL + i * T * ratio, state)

    # right edge: exact staged cascade aligned to the global end (skipped
    # when the interior is valid to the very end — ERW == 0 would make a
    # zero-size region, which Mosaic rejects anyway)
    if ERW > 0:
        xr = jnp.dot(c, rr_ref[:], preferred_element_type=jnp.float32,
                     precision=hp)
        yr = _mw_apply(xr, tri_ref[:], supW_ref[:], triL_ref[:], L, num,
                       mtype, W, W, tb)
        state = region(yr[:, W - ERW :], n_up - ERW, state)

    vmin, jmin, vmax, jmax = state
    zc = jnp.zeros((tb, 1), jnp.float32)
    a_min_ref[:] = vmin if vmin is not None else zc
    a_max_ref[:] = vmax if vmax is not None else zc
    t_min_ref[:] = jmin.astype(jnp.float32) if jmin is not None else zc
    t_max_ref[:] = jmax.astype(jnp.float32) if jmax is not None else zc


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_curr", "ratio", "half", "n_up", "L", "num", "mtype", "need",
        "interpret",
    ),
)
def _fused_current_poly_call(
    c, n_curr, ratio, half, n_up, L, num, mtype, need=(True,) * 4,
    interpret=False,
):
    import numpy as np

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = _poly_plan(n_curr, ratio, half, n_up, L, num, mtype)
    b = c.shape[0]
    W = _POLY_W
    nbW = W // _CUR_BLK
    tri = jnp.asarray(np.tril(np.ones((_CUR_BLK, _CUR_BLK), np.float32)).T)
    supW = jnp.asarray(np.eye(nbW, k=1, dtype=np.float32))
    triL = jnp.asarray(np.tril(np.ones((L, L), np.float32)).T)
    kern = functools.partial(
        _fused_current_poly_kernel, n_curr=n_curr, ratio=ratio, half=half,
        n_up=n_up, L=L, num=num, mtype=mtype, EL=plan["EL"],
        ERW=plan["ERW"], nq=plan["nq"], q_min=plan["q_min"],
        t0_base=plan["t0_base"], nblk=plan["nblk"], T_last=plan["T_last"],
        need=need,
    )

    def row_spec(width):
        return pl.BlockSpec(
            (_POLY_TILE_B, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    consts = [tri, supW, triL, jnp.asarray(plan["RL"]),
              jnp.asarray(plan["RR"]), jnp.asarray(plan["A"]),
              jnp.asarray(plan["A_last"])]
    return pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, 1), jnp.float32) for _ in range(4)
        ),
        grid=(b // _POLY_TILE_B,),
        in_specs=[row_spec(n_curr)] + [const_spec(x.shape) for x in consts],
        out_specs=tuple(row_spec(1) for _ in range(4)),
        interpret=interpret,
    )(c, *consts)


# ---------------------------------------------------------------------------
# banded convolution: mode-sliced constant-kernel conv as in-VMEM matmuls
# ---------------------------------------------------------------------------
#
# The XLA banded matmul (convolutions._conv_banded_matmul) must materialize
# the stacked overlapping windows in HBM, which caps its useful block width
# (measured on v5e: the t0-filter 'same' conv is window-traffic-bound at
# every block size, 3.2 ms/16384 events at the 512 optimum). Here the row
# stays resident in VMEM, so the per-output-block window slices are free and
# the block width drops to 128 — ~2.5x fewer matmul FLOPs
# (p*(blk+m-1) total MACs) with zero window re-materialization. NaN rows
# poison in-kernel (the XLA-side nanmask would re-read and re-write the
# full (B, p) output from HBM).

_BC_TILE_B = int(os.getenv("DSPEED_TPU_BCONV_TILE_B", "128"))
_BC_BLK = 128
_BC_VMEM_BYTES = int(os.getenv("DSPEED_TPU_BCONV_VMEM", str(10 * 2**20)))


def _banded_conv_body(w, A, *, tb, span, blk, nblk, base, pad_l, pad_r):
    """In-VMEM banded conv on loaded values: zero-pad the rows, one matmul
    per output block against the shared band matrix ``A``. Shared by the
    standalone banded-conv kernel and the fused t0 front."""
    parts = []
    if pad_l:
        parts.append(jnp.zeros((tb, pad_l), jnp.float32))
    parts.append(w)
    if pad_r:
        parts.append(jnp.zeros((tb, pad_r), jnp.float32))
    wp = jnp.concatenate(parts, axis=1) if len(parts) > 1 else w
    hp = jax.lax.Precision.HIGHEST  # bf16 default rounds the long-tap sums
    cols = [
        jnp.dot(
            jax.lax.slice_in_dim(wp, base + k * blk, base + k * blk + span,
                                 axis=1),
            A, preferred_element_type=jnp.float32, precision=hp,
        )
        for k in range(nblk)
    ]
    return jnp.concatenate(cols, axis=1) if nblk > 1 else cols[0]


def _banded_conv_kernel(w_ref, A_ref, o_ref, *, tb, span, blk, nblk, base,
                        pad_l, pad_r, mask_from=None):
    w = w_ref[:]
    if mask_from is not None:
        # loaded block is 128-aligned and wider than the absorbed [0:n_in]
        # view; zero the tail columns (== the view's right zero-padding)
        col = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
        w = jnp.where(col < mask_from, w, jnp.float32(0))
    bad = jnp.max((w != w).astype(jnp.int32), axis=1, keepdims=True) > 0
    out = _banded_conv_body(
        w, A_ref[:], tb=tb, span=span, blk=blk, nblk=nblk, base=base,
        pad_l=pad_l, pad_r=pad_r,
    )
    o_ref[:] = jnp.where(bad, jnp.float32(jnp.nan), out)


@functools.partial(
    jax.jit,
    static_argnames=("tb", "span", "blk", "nblk", "base", "pad_l", "pad_r",
                     "n_eff", "interpret"),
)
def _banded_conv_call(w2, A, tb, span, blk, nblk, base, pad_l, pad_r,
                      n_eff=None, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = w2.shape
    # absorb a leading [0:n_eff] slice of a wider operand: the row BlockSpec
    # DMAs only the first columns, so the slice never exists in HBM. Mosaic
    # wants the block width 128-aligned (or the full array width); load the
    # aligned cover of n_eff and zero the tail columns in VMEM
    mask_from = None
    if n_eff is not None and n_eff < n:
        n_load = min(n, -(-n_eff // 128) * 128)
        if n_load > n_eff:
            mask_from = n_eff
            # the in-VMEM zeros [n_eff, n_load) stand in for right padding
            pad_r = max(0, pad_r - (n_load - n_eff))
        n = n_load
    W = A.shape[1]
    kern = functools.partial(
        _banded_conv_kernel, tb=tb, span=span, blk=blk, nblk=nblk, base=base,
        pad_l=pad_l, pad_r=pad_r, mask_from=mask_from,
    )

    def row_spec(width):
        return pl.BlockSpec(
            (tb, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, nblk * W), jnp.float32),
        grid=(b // tb,),
        in_specs=[
            row_spec(n),
            pl.BlockSpec((span, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=row_spec(nblk * W),
        interpret=interpret,
    )(w2, A)


def banded_conv_multi(w, kerns, lo, p, n_in=None, interpret: bool = False):
    """``full_conv(w[..., :n_in], k_j)[..., lo:lo+p]`` per kernel, as one
    VMEM-resident banded-matmul pass; NaN rows are poisoned in-kernel.

    ``kerns`` are same-length 1-D NaN-free numpy arrays (the band matrices
    concatenate along the output columns, so a bank shares the one window
    read). ``n_in`` absorbs a leading slice of a wider input: the row
    BlockSpec reads only the first ``n_in`` columns, so the engine's
    ``var[0:n_in]`` view never materializes in HBM (the fusion pass passes
    the unsliced source). Returns a list of ``(..., p)`` float32 arrays, or
    ``None`` when the geometry does not fit the kernel (caller falls back
    to XLA).
    """
    import numpy as np

    from .convolutions import _band_matrix

    nk = len(kerns)
    m = int(kerns[0].shape[-1])
    *lead, n_full = w.shape
    n = n_full if n_in is None else int(n_in)
    if n > n_full:
        return None
    # single block when the bank's total width stays MXU-friendly; else
    # 128-wide blocks (minimum window redundancy at full lane utilization)
    blk = p if nk * p <= 640 else _BC_BLK
    nblk = -(-p // blk)
    p_pad = nblk * blk
    span = blk + m - 1
    pad_l = max(0, m - 1 - lo)
    pad_r = max(0, lo + p_pad - n)
    base = lo - (m - 1) + pad_l
    tb = _BC_TILE_B
    W = nk * blk

    def vmem_bytes(tb):
        # input block + padded copy + band matrix + out block + col concat
        return 4 * (
            2 * tb * (n + pad_l + pad_r) + span * W + 2 * tb * nblk * W
        )

    while tb > 8 and vmem_bytes(tb) > _BC_VMEM_BYTES:
        tb //= 2
    if vmem_bytes(tb) > _BC_VMEM_BYTES:
        return None

    w2 = jnp.asarray(w, jnp.float32).reshape(-1, n_full)
    b = w2.shape[0]
    pad_b = (-b) % tb
    if pad_b:
        w2 = jnp.pad(w2, ((0, pad_b), (0, 0)))
    A = jnp.asarray(_band_matrix(kerns, blk).astype(np.float32))
    out = _banded_conv_call(
        w2, A, tb=tb, span=span, blk=blk, nblk=nblk, base=base,
        pad_l=pad_l, pad_r=pad_r,
        n_eff=None if n == n_full else n, interpret=interpret,
    )
    # columns are laid out (block k, kernel j, in-block i)
    out = out.reshape(-1, nblk, nk, blk)
    out = jnp.moveaxis(out, -2, -3).reshape(-1, nk, p_pad)
    return [out[:b, j, :p].reshape(*lead, p) for j in range(nk)]


# ---------------------------------------------------------------------------
# fused t0 front: t0-filter conv -> min_max -> backward time_point_thresh
# ---------------------------------------------------------------------------
#
# The pileup/t0 branch of the HPGe chain reads the pole-zero waveform three
# times from HBM (conv writes wf_t0_filter, min_max re-reads it, the
# threshold search re-reads it again) to produce FIVE scalars. Here the
# branch is one VMEM pass per row tile: banded conv, extrema with
# first-occurrence indices, and the backward crossing search all on the
# resident rows — wf_t0_filter never exists in HBM.

_T0_TILE_B = int(os.getenv("DSPEED_TPU_T0_TILE_B", "64"))


def _fused_t0_kernel(w_ref, A_ref, std_ref, *refs, tb, n, span, blk, nblk,
                     base, pad_l, pad_r, curr_spec=None, atrap_spec=None,
                     need=(True,) * 4):
    if atrap_spec is not None:
        tri_ref, tri8_ref, *refs = refs
    tmin_ref, tmax_ref, amin_ref, amax_ref, tp0_ref, *refs = refs
    w = w_ref[:]
    bad = jnp.max((w != w).astype(jnp.int32), axis=1, keepdims=True) > 0
    nanv = jnp.float32(jnp.nan)

    def poison(x):
        return jnp.where(bad, nanv, x)

    c = _banded_conv_body(
        w, A_ref[:], tb=tb, span=span, blk=blk, nblk=nblk, base=base,
        pad_l=pad_l, pad_r=pad_r,
    )[:, :n]

    # t_max/a_max are always computed — the absorbed search starts from
    # t_max; the min side elides when the fusion pass found no readers
    need_tmin, _nt, need_amin, _na = need
    iota = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)
    a_min = (
        jnp.min(c, axis=1, keepdims=True)
        if need_tmin or need_amin else None
    )
    a_max = jnp.max(c, axis=1, keepdims=True)
    # first occurrence, like argmin/argmax
    t_min = (
        jnp.min(jnp.where(c == a_min, iota, n), axis=1, keepdims=True)
        if need_tmin else None
    )
    t_max = jnp.min(jnp.where(c == a_max, iota, n), axis=1, keepdims=True)

    # time_point_thresh(c, std, t_max, walk=0): backward crossing search —
    # mask index i means a crossing between samples i-1 and i, last true
    # with i <= t_start wins (reference time_point_thresh.py:85-92).
    # Mosaic note: a SLICED broadcasted_iota (iota[:, 1:]) aborts the TPU
    # compiler ("limits <= dim(i)"); generate the shifted iota directly.
    a = std_ref[:]  # (tb, 1)
    c0 = c[:, :-1]
    c1 = c[:, 1:]
    cross = ((c0 < a) & (a <= c1)) | ((c0 > a) & (a >= c1))
    iota1 = jax.lax.broadcasted_iota(jnp.int32, (tb, n - 1), 1) + 1
    valid = cross & (iota1 <= t_max)
    idx = jnp.max(jnp.where(valid, iota1, -1), axis=1, keepdims=True)
    found = idx >= 0
    tp0 = jnp.where(found & ~jnp.isnan(a), idx.astype(jnp.float32), nanv)

    zc = jnp.zeros((tb, 1), jnp.float32)
    tmin_ref[:] = poison(t_min.astype(jnp.float32)) if need_tmin else zc
    tmax_ref[:] = poison(t_max.astype(jnp.float32))
    amin_ref[:] = poison(a_min) if need_amin else zc
    amax_ref[:] = poison(a_max)
    tp0_ref[:] = poison(tp0)

    if atrap_spec is not None:
        # absorbed trapezoid + backward threshold search off the SAME rows
        # (the flagship's tp_0_atrap: asym_trap_filter(wf_pz) ->
        # time_point_thresh(wf_atrap, bl_std, tp_start, 0)) — the trap
        # plane never exists in HBM and the separate search fusion's full
        # re-read disappears. Same prefix-sum trap formulation as the
        # energy front; the search mirrors the conv search above.
        tpa_ref = refs[-1]
        S = _blocked_prefix(w, tri_ref[:], tri8_ref[:], tb, n)
        (atr,) = _trap_windows(w, S, (atrap_spec,), tb, n)
        at0 = atr[:, :-1]
        at1 = atr[:, 1:]
        cross_a = ((at0 < a) & (a <= at1)) | ((at0 > a) & (a >= at1))
        valid_a = cross_a & (iota1 <= t_max)
        idx_a = jnp.max(jnp.where(valid_a, iota1, -1), axis=1, keepdims=True)
        tpa = jnp.where(
            (idx_a >= 0) & ~jnp.isnan(a), idx_a.astype(jnp.float32), nanv
        )
        tpa_ref[:] = poison(tpa)

    if curr_spec is not None:
        # absorbed windower(w, tp0, win_m) -> avg_current(., avg_len): the
        # rows are resident and tp0 is in-register, so the A/E current
        # never re-reads wf_pz from HBM. Same semantics as the standalone
        # kernels: out-of-range window slots are NaN, and any NaN in the
        # window poisons the whole current row (chain-wide convention).
        from .windower import _window_rows

        win_m, avg_len, n_curr = curr_spec
        curr_ref = refs[0]
        tp0_bad = jnp.isnan(tp0)
        beg = jnp.minimum(
            jnp.where(tp0_bad, 0.0, tp0).astype(jnp.int32), n
        )  # (tb, 1)
        wrow = _window_rows(w, beg[:, 0], n, win_m)
        pos = beg + jax.lax.broadcasted_iota(jnp.int32, (tb, win_m), 1)
        ok = (pos >= 0) & (pos < n)
        wle = jnp.where(ok & ~tp0_bad & ~bad, wrow, nanv)
        curr = (wle[:, avg_len:] - wle[:, : win_m - avg_len]) / jnp.float32(
            avg_len
        )
        if n_curr > win_m - avg_len:
            curr = jnp.concatenate(
                [curr, jnp.full((tb, n_curr - (win_m - avg_len)), nanv)],
                axis=1,
            )
        else:
            curr = curr[:, :n_curr]
        bad_c = jnp.max((wle != wle).astype(jnp.int32), axis=1,
                        keepdims=True) > 0
        curr_ref[:] = jnp.where(bad_c, nanv, curr)


@functools.partial(
    jax.jit,
    static_argnames=("tb", "n", "span", "blk", "nblk", "base", "pad_l",
                     "pad_r", "curr_spec", "atrap_spec", "need",
                     "interpret"),
)
def _fused_t0_call(w2, A, std, tb, n, span, blk, nblk, base, pad_l, pad_r,
                   curr_spec=None, atrap_spec=None, need=(True,) * 4,
                   interpret=False):
    import numpy as np

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = w2.shape[0]
    kern = functools.partial(
        _fused_t0_kernel, tb=tb, n=n, span=span, blk=blk, nblk=nblk,
        base=base, pad_l=pad_l, pad_r=pad_r, curr_spec=curr_spec,
        atrap_spec=atrap_spec, need=need,
    )

    def row_spec(width):
        return pl.BlockSpec(
            (tb, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    in_specs = [
        row_spec(w2.shape[1]),
        pl.BlockSpec((span, blk), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        row_spec(1),
    ]
    args = [w2, A, std]
    if atrap_spec is not None:
        nb = n // _EN_BLK
        tri = jnp.asarray(
            np.tril(np.ones((_EN_BLK, _EN_BLK), np.float32)).T
        )
        tri8 = jnp.asarray(np.triu(np.ones((nb, nb), np.float32), 1))
        in_specs += [
            pl.BlockSpec((_EN_BLK, _EN_BLK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [tri, tri8]
    out_shape = [jax.ShapeDtypeStruct((b, 1), jnp.float32)] * 5
    out_specs = [row_spec(1)] * 5
    if curr_spec is not None:
        out_shape.append(
            jax.ShapeDtypeStruct((b, curr_spec[2]), jnp.float32)
        )
        out_specs.append(row_spec(curr_spec[2]))
    if atrap_spec is not None:
        out_shape.append(jax.ShapeDtypeStruct((b, 1), jnp.float32))
        out_specs.append(row_spec(1))
    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        grid=(b // tb,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*args)


def fused_t0(w, kern_arr, a_std, curr_spec=None, atrap_spec=None,
             need: tuple = (True,) * 4, interpret: bool = False):
    """Fused ``convolve_wf(w, kern, 's') -> min_max -> time_point_thresh(
    ..., a_std, tp_start, 0)``: returns ``(t_min, t_max, a_min, a_max,
    tp_0)`` per row, with ``wf_t0_filter`` never leaving VMEM — or ``None``
    when the geometry does not fit VMEM (caller composes the XLA kernels).

    With ``curr_spec = (win_m, avg_len, n_curr)`` the A/E current branch
    ``avg_current(windower(w, tp_0, win_m), avg_len)`` is absorbed too and
    a sixth ``(..., n_curr)`` output is appended — wf_pz is never re-read
    for the window, and ``wf_le`` never exists in HBM. With ``atrap_spec``
    (a ``("norm", rise, flat)`` / ``("asym", rise, flat, fall)`` trap
    tuple) the pileup trapezoid + its backward threshold search
    ``time_point_thresh(trap(w), a_std, tp_start, 0)`` is absorbed as a
    final scalar output — the trap plane never reaches HBM."""
    import numpy as np

    from .convolutions import _band_matrix

    *lead, n = w.shape
    m = int(kern_arr.shape[-1])
    if atrap_spec is not None:
        atrap_spec = tuple(atrap_spec)
        if n % _EN_BLK != 0:
            return None  # the absorbed trap's blocked prefix needs 128 | n
    lo = (m - 1) // 2  # numpy 'same' window
    blk = _BC_BLK
    nblk = -(-n // blk)
    p_pad = nblk * blk
    span = blk + m - 1
    pad_l = max(0, m - 1 - lo)
    pad_r = max(0, lo + p_pad - n)
    base = lo - (m - 1) + pad_l
    if curr_spec is not None:
        curr_spec = tuple(int(x) for x in curr_spec)
    win_m = curr_spec[0] if curr_spec is not None else 0

    def vmem_bytes(tb):
        # input block + padded copy + band matrix + conv cols/result +
        # crossing masks/iota intermediates (~2 more row-width planes) +
        # the windower's log-shift working set + the absorbed trap's
        # prefix/trap/mask planes
        return 4 * (
            2 * tb * (n + pad_l + pad_r)
            + span * blk
            + tb * (nblk * blk + n)
            + 2 * tb * n
            + 3 * tb * (n + 2 * win_m)
            + (4 * tb * n if atrap_spec is not None else 0)
        )

    tb = _T0_TILE_B
    while tb > 8 and vmem_bytes(tb) > _BC_VMEM_BYTES:
        tb //= 2
    if vmem_bytes(tb) > _BC_VMEM_BYTES:
        return None

    w2 = jnp.asarray(w, jnp.float32).reshape(-1, n)
    b = w2.shape[0]
    std = jnp.broadcast_to(
        jnp.asarray(a_std, jnp.float32), tuple(lead)
    ).reshape(-1)[:, None]
    pad_b = (-b) % tb
    if pad_b:
        w2 = jnp.pad(w2, ((0, pad_b), (0, 0)))
        std = jnp.pad(std, ((0, pad_b), (0, 0)))
    A = jnp.asarray(_band_matrix([kern_arr], blk).astype(np.float32))
    outs = _fused_t0_call(
        w2, A, std, tb=tb, n=n, span=span, blk=blk, nblk=nblk, base=base,
        pad_l=pad_l, pad_r=pad_r, curr_spec=curr_spec,
        atrap_spec=atrap_spec, need=tuple(bool(x) for x in need),
        interpret=interpret,
    )
    res = [o[:b, 0].reshape(lead) for o in outs[:5]]
    pos = 5
    if curr_spec is not None:
        res.append(outs[pos][:b].reshape(*lead, curr_spec[2]))
        pos += 1
    if atrap_spec is not None:
        res.append(outs[pos][:b, 0].reshape(lead))
    return tuple(res)


def fused_current(
    c, ratio: int, half: int, n_up: int, L: int, num: int, mtype: int,
    need: tuple = (True,) * 4, interpret: bool = False,
):
    """Fused upsample(replicate, ``ratio``) -> ``num`` alternating
    ``L``-sample moving averages (``mtype`` as in ``moving_window_multi``)
    -> min_max. Returns ``(t_min, t_max, a_min, a_max)`` per row.

    Preferred route: the polyphase kernel (interior as banded per-phase
    matmuls on the short waveform + exact staged cascades on two edge
    windows — see ``_poly_plan``). Falls back to the up-domain kernel
    (replicate via XLA broadcast, cascade at upsampled width in VMEM) when
    the geometry's edge margins don't hold. Requires ``L <= 128`` and an
    all-valid replication map (``half + n_up <= n_curr * ratio``).

    Index-stability caveat (ADVICE r2): the interior banded matmuls and the
    edge-window cascades round differently, so a *degenerate* waveform whose
    global extremum near-ties (within ~1 ulp) across a region boundary can
    report a ``t_min``/``t_max`` that differs from the unfused kernel by
    whole samples — an integer discrepancy the ~1e-6 amplitude tolerance
    does not cover. Amplitudes (``a_min``/``a_max``, hence A/E) stay within
    the normal tolerance; downstream cuts on A/E *timing* should treat the
    index as ±1 upsampled sample on near-tied waveforms.
    """
    *lead, n_curr = c.shape
    ratio, half = int(ratio), int(half)
    n_up, L, num, mtype = int(n_up), int(L), int(num), int(mtype)
    c2 = jnp.asarray(c, jnp.float32).reshape(-1, n_curr)
    b = c2.shape[0]
    if _poly_plan(n_curr, ratio, half, n_up, L, num, mtype) is not None:
        pad_b = (-b) % _POLY_TILE_B
        if pad_b:
            c2 = jnp.pad(c2, ((0, pad_b), (0, 0)))
        outs = _fused_current_poly_call(
            c2, n_curr, ratio, half, n_up, L, num, mtype,
            need=tuple(bool(x) for x in need), interpret=interpret,
        )
        return tuple(o[:b, 0].reshape(lead) for o in outs)
    pad_b = (-b) % _CUR_TILE_B
    if pad_b:
        c2 = jnp.pad(c2, ((0, pad_b), (0, 0)))
    # curr_up[j] = curr[(j+half)//ratio] — replicate; the window slice
    # happens inside the kernel (VMEM), not as an extra HBM pass
    rep = jnp.repeat(c2, int(ratio), axis=-1)
    if half + n_up > rep.shape[-1]:
        rep = jnp.pad(rep, ((0, 0), (0, half + n_up - rep.shape[-1])))
    outs = _fused_current_call(
        rep, int(half), int(n_up), int(L), int(num), int(mtype),
        need=tuple(bool(x) for x in need), interpret=interpret,
    )
    return tuple(o[:b, 0].reshape(lead) for o in outs)


def fused_energy(
    w, baseline, tau, rise: int | None = None, flat: int | None = None,
    trap_specs=None, emax_for=(0,), emit_blsub: bool = False,
    emit_minmax: bool = False, slope_specs=(), mask_specs=(),
    interpret: bool = False,
):
    """Fused bl_subtract -> pole_zero(tau) -> trapezoids -> amaxes.

    With ``rise``/``flat``: legacy single-trap form returning
    ``(wf_pz, wf_trap, trapEmax)``. With ``trap_specs`` (tuple of
    ``("norm", rise, flat)`` / ``("asym", rise, flat, fall)``): returns
    ``(wf_pz, [traps...], [emaxes...])`` with one maximum per entry of
    ``emax_for`` (indices into ``trap_specs`` — the in-VMEM reduction
    replaces a full-array HBM re-read per amax step). One HBM read of the
    waveform replaces the unfused chain's per-processor passes; ``n`` must
    be a multiple of ``_EN_BLK``.
    """
    import numpy as np

    legacy = trap_specs is None
    if legacy:
        trap_specs = (("norm", int(rise), int(flat)),)
    trap_specs = tuple(tuple(s) for s in trap_specs)
    emax_for = tuple(int(i) for i in emax_for)

    *lead, n = w.shape
    w2 = jnp.asarray(w, jnp.float32).reshape(-1, n)
    b = w2.shape[0]
    pad_b = (-b) % _EN_TILE_B
    if pad_b:
        w2 = jnp.pad(w2, ((0, pad_b), (0, 0)))
    bl = jnp.broadcast_to(
        jnp.asarray(baseline, jnp.float32).reshape(-1)[:, None], (b, 1)
    )
    if pad_b:
        bl = jnp.pad(bl, ((0, pad_b), (0, 0)))
    omc = jnp.full((1, 1), -np.expm1(-1.0 / float(tau)), jnp.float32)
    slope_specs = tuple(tuple(int(v) for v in s) for s in slope_specs)
    mask_specs = tuple(
        (tuple(sp), int(si), int(oi), bool(ff), bool(bb))
        for sp, si, oi, ff, bb in mask_specs
    )
    outs = _fused_energy_call(
        w2, bl, omc, trap_specs, emax_for=emax_for, emit_blsub=emit_blsub,
        emit_minmax=emit_minmax, slope_specs=slope_specs,
        mask_specs=mask_specs, interpret=interpret,
    )
    k = len(trap_specs)
    ke = len(emax_for)
    pz = outs[0][:b].reshape(*lead, n)
    traps = [t[:b].reshape(*lead, n) for t in outs[1 : 1 + k]]
    emaxes = [e[:b, 0].reshape(lead) for e in outs[1 + k : 1 + k + ke]]
    if legacy:
        return pz, traps[0], emaxes[0]
    extras = []
    pos = 1 + k + ke
    for o in outs[pos : pos + 4 * len(slope_specs) + 4 * emit_minmax]:
        extras.append(o[:b, 0].reshape(lead))
    pos += 4 * len(slope_specs) + 4 * emit_minmax
    if emit_blsub:
        extras.append(outs[pos][:b].reshape(*lead, n))
        pos += 1
    for o in outs[pos : pos + len(mask_specs)]:
        extras.append(o[:b].reshape(*lead, n))
    if extras:
        return (pz, traps, emaxes, *extras)
    return pz, traps, emaxes


# ---------------------------------------------------------------------------
# chained time-point cascade: rank planes + every link's masked-iota search
# in one VMEM pass (reference semantics: time_point_thresh.py:34-120 chained
# per tests/configs/icpc-dsp-config.json; see processors/tp_chain.py)

_TP_TILE_B = int(os.getenv("DSPEED_TPU_TP_TILE_B", "128"))


def _cascade_kernel(w_ref, base_ref, t_ref, *out_refs, tb, n, factors, dirs,
                    starts):
    m = len(factors)
    w = w_ref[:]                     # (tb, n) f32
    base = base_ref[:]               # (tb, 1) f32
    t = t_ref[:]                     # (tb, 1) f32
    nanv = jnp.float32(jnp.nan)

    wnan = jnp.max((w != w).astype(jnp.int32), axis=1, keepdims=True) > 0
    ti0 = jnp.trunc(t).astype(jnp.int32)
    in_range = (ti0 >= 0) & (ti0 < n)
    integral = jnp.trunc(t) == t
    root_bad = wnan | (t != t) | ~in_range | ~integral  # (tb, 1)

    # python-float scales match the engine's weak-typed expression
    # arithmetic bit-for-bit (tp_chain.py builds thresholds the same way)
    a = [
        jnp.float32(factors[k]) * base if factors[k] != 1.0 else base
        for k in range(m)
    ]

    # Rank planes R1[i] = #{a_j < w[i]}, R2[i] = #{a_j <= w[i]}, then ONE
    # link-bitmask plane per walk direction via shift arithmetic: with
    # s_k = #{a_j < a_k} (the per-event sorted rank), every float predicate
    # translates exactly — including ties among thresholds and between a
    # threshold and the waveform (proof: a_k < w  <=>  R1 > s_k, and
    # a_k <= w  <=>  R2 > s_k; both directions hold with duplicates):
    #   fwd crossing at i:  s in [R1a, R1b)  |  s in [R2b, R2a)
    #   bwd crossing at i+1: s in [R2a, R2b) |  s in [R1b, R1a)
    # Each link then tests ONE bit of the direction plane — the per-link
    # full-width work drops from four rank compares + three boolean ops to
    # a shift and a mask (the v1 kernel measured 5.6 ms at flagship shapes,
    # this form 2.0 ms, bit-identical).
    R1 = jnp.zeros((tb, n), jnp.int32)
    R2 = jnp.zeros((tb, n), jnp.int32)
    for k in range(m):
        R1 = R1 + (a[k] < w).astype(jnp.int32)
        R2 = R2 + (a[k] <= w).astype(jnp.int32)
    ones = jnp.int32(-1)
    E1 = ones << R1   # bit s set  <=>  s >= R1
    E2 = ones << R2
    E1a, E1b = E1[:, :-1], E1[:, 1:]
    E2a, E2b = E2[:, :-1], E2[:, 1:]
    mfwd = (E1a & ~E1b) | (E2b & ~E2a)
    mbwd = (E2a & ~E2b) | (E1b & ~E1a)

    # per-link sorted ranks (tb, 1) — m^2 tiny vector ops
    srank = []
    for k in range(m):
        sk = jnp.zeros((tb, 1), jnp.int32)
        for j in range(m):
            sk = sk + (a[j] < a[k]).astype(jnp.int32)
        srank.append(sk)

    iota = jax.lax.broadcasted_iota(jnp.int32, (tb, n - 1), 1)
    iota1 = iota + 1
    results, bads = [], []
    for k in range(m):
        if starts[k] < 0:
            s, sbad = ti0, root_bad
        else:
            s = jnp.trunc(results[starts[k]]).astype(jnp.int32)
            sbad = bads[starts[k]]
        sk = srank[k]
        if dirs[k] == 1:
            # crossing between samples i and i+1 reported at i (the XLA
            # route's right-padded position n-1 is always False — dropped)
            tst = ((mfwd >> sk) & 1) != 0
            idx = jnp.min(
                jnp.where(tst & (iota >= s), iota, n), axis=1, keepdims=True
            )
            found = idx < n
        else:
            # crossing between i-1 and i reported at i: positions 1..n-1
            tst = ((mbwd >> sk) & 1) != 0
            idx = jnp.max(
                jnp.where(tst & (iota1 <= s), iota1, -1), axis=1,
                keepdims=True,
            )
            found = idx >= 0
        # not-found rows are NaN-masked below, so idx needs no fallback
        bad = sbad | (a[k] != a[k]) | ~found
        results.append(jnp.where(bad, nanv, idx.astype(jnp.float32)))
        bads.append(bad)

    for k in range(m):
        out_refs[k][:] = results[k]


@functools.partial(
    jax.jit,
    static_argnames=("tb", "n", "factors", "dirs", "starts", "interpret"),
)
def _cascade_call(w2, base, t, tb, n, factors, dirs, starts,
                  interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = w2.shape[0]
    m = len(factors)
    kern = functools.partial(
        _cascade_kernel, tb=tb, n=n, factors=factors, dirs=dirs,
        starts=starts,
    )

    def row_spec(width):
        return pl.BlockSpec(
            (tb, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, 1), jnp.float32) for _ in range(m)
        ),
        grid=(b // tb,),
        in_specs=[row_spec(n), row_spec(1), row_spec(1)],
        out_specs=tuple(row_spec(1) for _ in range(m)),
        interpret=interpret,
    )(w2, base, t)


def cascade_tp(w, a_base, t_start, factors, dirs, starts,
               interpret: bool = False):
    """Whole threshold cascade in one VMEM pass — the XLA route materializes
    one (B, n) boolean mask plane per link in HBM (~0.26 ms/link at flagship
    shapes); here the packed rank plane and every link's masked-iota search
    stay on the resident rows. Returns the m per-row time points, or ``None``
    when the geometry doesn't fit (caller falls back to the XLA body, which
    is bit-identical)."""
    *lead, n = w.shape
    m = len(factors)
    if m > 15 or n % 128 != 0 or n < 256:
        return None
    # w + two rank planes + two shift planes + two direction bitmask planes
    # resident, plus iota and ~1 transient mask plane per link pass (the
    # coefficient matches the compiler's measured scoped-vmem footprint:
    # tb=128 at n=4096 wants ~17 MB and aborts, tb=64 fits)
    tb = _TP_TILE_B
    while tb > 8 and 4 * tb * n * 8 > _BC_VMEM_BYTES:
        tb //= 2
    if 4 * tb * n * 8 > _BC_VMEM_BYTES:
        return None

    w2 = jnp.asarray(w, jnp.float32).reshape(-1, n)
    b = w2.shape[0]
    # broadcast to the full leading batch shape first (mirrors the XLA
    # route): partially-broadcastable shapes like (C, 1) vs (C, B, n)
    # stacked channels must expand, not just flatten
    base = jnp.broadcast_to(
        jnp.asarray(a_base, jnp.float32), tuple(lead)
    ).reshape(-1)[:, None]
    t = jnp.broadcast_to(
        jnp.asarray(t_start, jnp.float32), tuple(lead)
    ).reshape(-1)[:, None]
    pad_b = (-b) % tb
    if pad_b:
        w2 = jnp.pad(w2, ((0, pad_b), (0, 0)))
        base = jnp.pad(base, ((0, pad_b), (0, 0)))
        t = jnp.pad(t, ((0, pad_b), (0, 0)))
    outs = _cascade_call(
        w2, base, t, tb=tb, n=n, factors=tuple(factors), dirs=tuple(dirs),
        starts=tuple(starts), interpret=interpret,
    )
    return tuple(o[:b, 0].reshape(lead) for o in outs)


# ---------------------------------------------------------------------------
# generic row-tile fusion: run an arbitrary composition of tile-safe step
# bodies over VMEM-resident row tiles (the pattern-free fusion pass,
# processing_chain._fuse_generic). No reference analogue — the reference
# interprets one processor at a time over numpy buffers
# (/root/reference/src/dspeed/processing_chain.py:1144-1163); here the whole
# group's intermediate planes never touch HBM.

_GEN_TILE_B = int(os.getenv("DSPEED_TPU_GENERIC_TILE_B", "32"))  # r5 sweep on v5e: 8 -> 303k, 16 -> 343k, 32 -> 367k, 64 -> 270k wf/s
_GEN_VMEM_BYTES = int(os.getenv("DSPEED_TPU_GENERIC_VMEM", str(10 * 2**20)))

# True while generic_rows traces a group body: kernels with standalone
# Pallas fast paths (banded conv, rank-plane cascade) must route to their
# XLA form instead — a pallas_call cannot nest inside another kernel
_IN_TILE = False


def in_tile() -> bool:
    """True when the caller is being traced inside a generic row tile."""
    return _IN_TILE


_GEN_COMPILE_OK: dict = {}


def _gen_probe_compile(
    kern, in_specs, out_specs, out_info, ops, tb, closed, n_tiled
):
    """One-time single-tile Mosaic compile of a group body.

    ``tile_safe`` predicates are necessarily approximate — Mosaic's op
    support can't be fully predicted from the traced jaxpr. The real
    ``pallas_call`` lowers inside the chain's outer jit, where a
    ``NotImplementedError`` (or a scoped-VMEM OOM) would escape
    ``generic_rows``' fallback and kill the whole chain compile; probing a
    two-tile clone here (memoized per body structure) turns that into a
    clean XLA fallback instead. Grid must be ≥2: a single-step grid skips
    Mosaic's double buffering, under-reporting scoped VMEM by ~2x (a
    grid-(1,) probe passed a group the real 512-step grid OOM'd on, r5).
    """
    import hashlib

    import numpy as np

    from jax.experimental import pallas as pl

    key = hashlib.sha1(
        (
            str(closed.jaxpr)
            + repr(
                [(tuple(int(d) for d in o.shape), str(o.dtype)) for o in ops]
            )
            + str(tb)
        ).encode()
    ).hexdigest()
    ok = _GEN_COMPILE_OK.get(key)
    if ok is not None:
        return ok
    probe_args = []
    for i, o in enumerate(ops):
        shp = (2 * tb, *o.shape[1:]) if i < n_tiled else o.shape
        probe_args.append(jax.ShapeDtypeStruct(shp, o.dtype))
    probe_outs = [
        jax.ShapeDtypeStruct(
            (2 * tb, *(cs or (1,))),
            np.dtype("uint8") if dt == np.dtype(bool) else dt,
        )
        for _, cs, dt in out_info
    ]
    try:
        jax.jit(
            lambda *a: pl.pallas_call(
                kern,
                grid=(2,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=probe_outs,
            )(*a)
        ).lower(*probe_args).compile()
        ok = True
    except Exception as e:
        log.info("generic tile body does not lower, using XLA: %s", e)
        ok = False
    _GEN_COMPILE_OK[key] = ok
    return ok


def generic_rows(body, vals, core_nd, tile_b: int | None = None,
                 interpret: bool = False):
    """Run ``body`` (dict of batched arrays -> dict of batched arrays) as
    ONE Pallas kernel over row tiles.

    ``vals`` maps env keys to operands; ``core_nd`` maps each key to its
    core rank (0 = per-event scalar, 1 = plane, ...) — keys mapped to
    ``None`` (config constants, shared coefficient vectors) are closed
    over / passed as broadcast operands instead of tiled. Returns the
    output dict with the operands' leading batch shape restored, or
    ``None`` when the geometry doesn't fit — the caller then runs ``body``
    as plain XLA, which is the *same traced graph* the unfused chain runs.
    """
    import numpy as np

    from jax.experimental import pallas as pl

    if not (interpret or pallas_available()):
        return None
    tb = int(tile_b or _GEN_TILE_B)

    per_event: dict = {}
    consts: dict = {}
    lead = None
    deferred = []  # keys with unknown core rank: infer from lead below
    for k, v in vals.items():
        if k not in core_nd:
            deferred.append(k)
            continue
        cnd = core_nd[k]
        if cnd is None or not hasattr(v, "shape"):
            consts[k] = v
            continue
        v = jnp.asarray(v)
        if v.ndim < cnd + 1:
            consts[k] = v  # broadcast-shared value (no batch dim)
            continue
        l = v.shape[: v.ndim - cnd]
        if lead is None:
            lead = l
        elif l != lead:
            return None
        per_event[k] = v
    if not per_event or not lead or any(d == 0 for d in lead):
        return None
    core_nd = dict(core_nd)
    for k in deferred:
        v = vals[k]
        shp = tuple(getattr(v, "shape", ()))
        if shp[: len(lead)] == lead:
            per_event[k] = jnp.asarray(v)
            core_nd[k] = len(shp) - len(lead)
        else:
            consts[k] = v  # no batch prefix: shared value
    b = int(np.prod(lead))

    # flatten lead dims; scalars carried as (B, 1) columns
    flat = {}
    for k, v in per_event.items():
        core = v.shape[v.ndim - core_nd[k]:]
        flat[k] = v.reshape(b, *core) if core else v.reshape(b, 1)
    in_keys = sorted(flat)

    # array consts ride as broadcast operands (Mosaic constants are for
    # scalars); python/0-d consts close over into the trace
    bcast_keys = []
    bcast_vals = []
    baked = {}
    for k, v in consts.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            a = jnp.asarray(v)
            bcast_keys.append(k)
            bcast_vals.append(a.reshape(1, *a.shape) if a.ndim == 1 else a)
        else:
            baked[k] = v

    def tile_body(tile_ins: dict):
        local = dict(baked)
        for k, x in tile_ins.items():
            if k in flat and core_nd[k] == 0:
                x = x[..., 0]
            elif k in bcast_set and consts_ndim[k] == 1:
                x = x[0]
            local[k] = x
        return body(local)

    bcast_set = set(bcast_keys)
    consts_ndim = {k: int(np.asarray(consts[k]).ndim) for k in bcast_keys}

    # abstract tile evaluation: output core shapes/dtypes + a VMEM estimate
    tile_shapes = {
        k: jax.ShapeDtypeStruct((tb, *flat[k].shape[1:]), flat[k].dtype)
        for k in in_keys
    }
    for k, v in zip(bcast_keys, bcast_vals):
        tile_shapes[k] = jax.ShapeDtypeStruct(v.shape, v.dtype)
    global _IN_TILE
    try:
        _IN_TILE = True
        out_abs = jax.eval_shape(tile_body, tile_shapes)
    except Exception:
        return None
    finally:
        _IN_TILE = False
    out_keys = sorted(out_abs)
    out_info = []
    for k in out_keys:
        oa = out_abs[k]
        if oa.ndim == 0 or oa.shape[0] != tb:
            return None  # not batched per-row: cannot tile
        out_info.append((k, tuple(oa.shape[1:]), oa.dtype))

    # VMEM budget: boundary blocks only (internals are Mosaic's to
    # schedule; the budget is deliberately conservative via the 3x factor)
    blk_bytes = sum(
        tb * int(np.prod(s.shape[1:] or (1,))) * s.dtype.itemsize
        for s in tile_shapes.values()
    ) + sum(
        tb * int(np.prod(cs or (1,))) * dt.itemsize for _, cs, dt in out_info
    )
    if 3 * blk_bytes > _GEN_VMEM_BYTES:
        return None

    # hoist the body's captured array constants (triangular cumsum
    # matrices, gather maps, filter taps created at trace time) into
    # explicit operands: Pallas rejects non-scalar jaxpr constants.
    # jax.closure_convert only hoists *tracer* consts, so trace to a
    # jaxpr ourselves and feed its constvars back as inputs.
    flat_keys = in_keys + bcast_keys

    def tile_flat(*arrs):
        res = tile_body(dict(zip(flat_keys, arrs)))
        return [res[k] for k in out_keys]

    from ._numerics import set_cumsum_memo

    prev_memo = set_cumsum_memo({})
    try:
        _IN_TILE = True
        closed = jax.make_jaxpr(tile_flat)(
            *[tile_shapes[k] for k in flat_keys]
        )
    except Exception:
        return None
    finally:
        _IN_TILE = False
        set_cumsum_memo(prev_memo)
    kconsts = [jnp.asarray(c) for c in closed.consts]
    kc_shapes = [c.shape for c in kconsts]
    kc_dtypes = [c.dtype for c in kconsts]
    kc_ops = []
    for c in kconsts:
        if c.dtype == jnp.bool_:
            c = c.astype(jnp.uint8)  # Mosaic-friendly storage
        kc_ops.append(c.reshape(1, -1) if c.ndim < 2 else c)
    kc_bytes = sum(
        int(np.prod(c.shape or (1,))) * c.dtype.itemsize for c in kconsts
    )
    if 3 * blk_bytes + kc_bytes > _GEN_VMEM_BYTES:
        return None

    def conv_fn(*args_and_consts):
        args = args_and_consts[: len(flat_keys)]
        cs = args_and_consts[len(flat_keys):]
        return jax.core.eval_jaxpr(closed.jaxpr, cs, *args)

    pad_b = (-b) % tb
    ops = (
        [
            jnp.pad(flat[k], ((0, pad_b),) + ((0, 0),) * (flat[k].ndim - 1))
            if pad_b
            else flat[k]
            for k in in_keys
        ]
        + bcast_vals
        + kc_ops
    )
    bp = b + pad_b

    def kern(*refs):
        n_in = len(flat_keys)
        ins = refs[:n_in]
        kcs = refs[n_in : n_in + len(kc_ops)]
        outs = refs[n_in + len(kc_ops):]
        tile_args = [r[:] for r in ins]
        kc_vals = [
            r[:].reshape(s).astype(dt)
            for r, s, dt in zip(kcs, kc_shapes, kc_dtypes)
        ]
        res = conv_fn(*tile_args, *kc_vals)  # ordered by out_keys
        for (k, cs, dt), r, v in zip(out_info, outs, res):
            if not cs:
                v = v[:, None]
            if v.dtype == jnp.bool_:
                v = v.astype(jnp.uint8)
            r[:] = v.astype(r.dtype)

    def spec_of(arr, tiled: bool):
        if tiled:
            zeros = (0,) * (arr.ndim - 1)
            return pl.BlockSpec(
                (tb, *arr.shape[1:]), lambda i, _z=zeros: (i, *_z)
            )
        return pl.BlockSpec(arr.shape, lambda i, _n=arr.ndim: (0,) * _n)

    in_specs = (
        [spec_of(o, True) for o in ops[: len(in_keys)]]
        + [spec_of(o, False) for o in bcast_vals]
        + [spec_of(o, False) for o in kc_ops]
    )
    out_shapes = []
    out_specs = []
    for k, cs, dt in out_info:
        store = np.dtype("uint8") if dt == np.dtype(bool) else dt
        shp = (bp, *(cs or (1,)))
        out_shapes.append(jax.ShapeDtypeStruct(shp, store))
        zeros = (0,) * len(cs or (1,))
        out_specs.append(
            pl.BlockSpec((tb, *(cs or (1,))), lambda i, _z=zeros: (i, *_z))
        )

    if not interpret and not _gen_probe_compile(
        kern, in_specs, out_specs, out_info, ops, tb, closed, len(in_keys)
    ):
        return None

    try:
        outs = pl.pallas_call(
            kern,
            grid=(bp // tb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(*ops)
    except Exception:
        return None

    result = {}
    for (k, cs, dt), o in zip(out_info, outs):
        o = o[:b]
        o = o.reshape(*lead, *cs) if cs else o[:, 0].reshape(lead)
        if dt == np.dtype(bool):
            o = o.astype(jnp.bool_)
        result[k] = o
    return result
