"""Waveform convolutions (reference ``dspeed/processors/convolutions.py``).

The reference loops ``np.convolve`` per event (:24 ``convolve_wf``) or calls
scipy ``fftconvolve`` over the batch (:81 ``fft_convolve_wf``). Here both are
single batched XLA ops: ``convolve_wf`` lowers to a TPU convolution
(``lax.conv_general_dilated``, MXU-friendly), ``fft_convolve_wf`` to a batched
real FFT — XLA picks the layout; both produce identical shapes/modes as
``numpy.convolve``.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_int
from ._kernel import kernel

__all__ = ["convolve_wf", "fft_convolve_wf", "reflected_convolve_wf"]


def _mode_char(mode_in, name):
    mode = static_int(mode_in, name, "mode_in")
    ch = chr(mode)
    if ch not in ("f", "v", "s"):
        raise DSPFatal("Invalid mode")
    return ch


def _slice_mode(full, n, m, ch):
    """Slice the full convolution like ``numpy.convolve`` modes."""
    if ch == "f":
        return full
    if ch == "v":
        lo, hi = min(n, m) - 1, max(n, m)
        return full[..., lo:hi]
    # same
    k = min(n, m)
    lo = (k - 1) // 2
    return full[..., lo : lo + max(n, m)]


def _conv_full_direct(w, kern):
    """Full convolution of batched ``w`` with a shared 1-D kernel; long-tap
    kernels fall through to the FFT path (measured on v5e: direct lowering
    wins below ~32 taps)."""
    if kern.ndim == 1 and kern.shape[-1] > 32:
        return _conv_full_fft(w, kern)
    return _conv_full_direct_only(w, kern)


def _conv_full_direct_only(w, kern):
    """Full convolution via shifted adds (accelerators, short shared
    kernels) or ``conv_general_dilated``. A 1-channel conv wastes the
    MXU's 128 feature lanes; m weighted shifted slices fuse into one VPU
    pass (measured v5e, 9 taps x 16384x1034: 2.7ms conv -> 0.9ms)."""
    n = w.shape[-1]
    m = kern.shape[-1]
    if jax.default_backend() != "cpu" and kern.ndim == 1 and m <= 64:
        nf = n + m - 1
        wp = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(m - 1, m - 1)])
        kc = kern.astype(w.dtype)
        out = kc[m - 1] * wp[..., :nf]
        for k in range(m - 2, -1, -1):
            s = m - 1 - k  # static slice: Mosaic has no dynamic_slice
            out = out + kc[k] * wp[..., s : s + nf]
        return out
    lhs = w.reshape(-1, 1, n)
    # conv_general_dilated computes correlation; flip for convolution
    rhs = kern[::-1].reshape(1, 1, m).astype(w.dtype)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1,),
        padding=[(m - 1, m - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(*w.shape[:-1], n + m - 1)


def _conv_full_fft(w, kern):
    """Full convolution via batched real FFT (scipy.fftconvolve semantics)."""
    n = w.shape[-1]
    m = kern.shape[-1]
    size = n + m - 1
    # next power of two for FFT efficiency on TPU
    fsize = 1 << (size - 1).bit_length()
    if jax.default_backend() not in ("cpu",) and kern.ndim == 1:
        from . import _mmfft

        # the matmul FFT factors any (N1<=256)x128 length: pad to the next
        # multiple of 256 instead of the next power of two (a 4228-sample
        # conv runs at 4352 instead of 8192 — ~2x fewer matmul FLOPs)
        tight = -(-size // 256) * 256
        if _mmfft.plan_ok(tight // 2):
            out = _mmfft.fft_convolve_full(w, kern.astype(w.dtype), tight, size)
            return out.astype(w.dtype)
        if _mmfft.plan_ok(fsize):
            # XLA's TPU FFT runs far off the roofline for these batched
            # sizes; the two-matmul four-step FFT rides the MXU instead
            out = _mmfft.fft_convolve_full(w, kern.astype(w.dtype), fsize, size)
            return out.astype(w.dtype)
    # flatten leading batch dims: XLA's CPU FFT thunk requires a
    # dim0-major layout, which sharded >2-D operands can violate
    lead = w.shape[:-1]
    w2 = w.reshape(-1, n)
    wf = jnp.fft.rfft(w2, fsize, axis=-1)
    if not isinstance(kern, jax.core.Tracer):
        # concrete (config-constant) kernel: fold its FFT at trace time —
        # XLA's constant folding skips FFT ops, so without this the
        # kernel transform re-runs on every dispatch
        kf = jnp.asarray(
            np.fft.rfft(np.asarray(kern, dtype=w.dtype), fsize, axis=-1)
        )
    else:
        kf = jnp.fft.rfft(kern.astype(w.dtype), fsize, axis=-1)
    out = jnp.fft.irfft(wf * kf, fsize, axis=-1)[..., :size]
    return out.reshape(*lead, size).astype(w.dtype)


def _mode_window(ch, n, m):
    """(lo, p): the slice of the full convolution a numpy mode keeps."""
    if ch == "f":
        return 0, n + m - 1
    if ch == "v":
        return min(n, m) - 1, abs(n - m) + 1
    return (min(n, m) - 1) // 2, max(n, m)


def _band_matrix(kerns, blk):
    """The shared per-block band matrix ``A[s, j*blk+i] = k_j[i + m-1 - s]``
    for same-length kernels ``k_j``: ``(span, nk*blk)`` float64, where
    ``span = blk + m - 1`` is the input span of one output block."""
    m = int(kerns[0].shape[-1])
    span = blk + m - 1
    s_idx = np.arange(span)[:, None]
    i_idx = np.arange(blk)[None, :]
    j = i_idx + (m - 1) - s_idx
    valid = (j >= 0) & (j < m)
    jc = np.clip(j, 0, m - 1)
    return np.concatenate(
        [
            np.where(valid, np.asarray(k, dtype=np.float64)[jc], 0.0)
            for k in kerns
        ],
        axis=1,
    )


# band-matrix VMEM budget inside a generic row tile (the (blk+m-1, blk)
# matrix rides into the group's pallas_call as a resident constant)
_TILE_BAND_BYTES = int(os.getenv("DSPEED_TPU_CONV_TILE_BAND", 1_200_000))


def _tile_blk(m: int, p: int) -> int | None:
    """Largest lane-friendly output-block width whose band matrix fits the
    in-tile VMEM budget; ``None`` when even 64 columns don't fit. Outside a
    tile the fixed 512 default stays (r1 sweep: 256 was +38% on the t0
    conv standalone — the in-tile trade is different because the window
    read is shared with the rest of the group)."""
    for blk in (512, 384, 256, 192, 128, 96, 64):
        if blk <= p or blk == 64:
            if (min(blk, p) + m - 1) * min(blk, p) * 4 <= _TILE_BAND_BYTES:
                return min(blk, p)
    return None


def _conv_banded_matmul(w, kern, lo, p, blk=512):
    """``full_conv(w, kern)[..., lo:lo+p]`` as banded matrix products.

    The mode window of a valid/same convolution is a *band* of the Toeplitz
    operator: computing only those outputs as an MXU matmul does
    ``p*m`` MACs/event — for the flagship CUSP/ZAC filters ('v' mode,
    301 outputs x 1696 taps ≈ 0.5M MAC/event) that is ~25x fewer FLOPs than
    any full-length transform, with direct-conv accuracy (no FFT rounding
    or pad-size games). Long output windows tile the band into blocks that
    share one (blk+m-1, blk) matrix. Requires a concrete (config-constant)
    kernel; matrices are host-built and trace-time constants.
    """
    m = int(kern.shape[-1])
    n = w.shape[-1]
    blk = min(blk, p)
    nblk = -(-p // blk)
    p_pad = nblk * blk
    # input span for output block starting at t0: u in [t0-(m-1), t0+blk)
    span = blk + m - 1
    A = _band_matrix([kern], blk)
    A = jnp.asarray(A.astype(np.result_type(w.dtype, np.float32)))

    # pad w so every block's input span is in range: global u in
    # [lo-(m-1), lo+p_pad) -> shift by m-1-lo after left pad
    pad_l = max(0, m - 1 - lo)
    pad_r = max(0, lo + p_pad - n)
    wp = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(pad_l, pad_r)])
    base = lo - (m - 1) + pad_l  # index of block 0's first input sample
    hp = jax.lax.Precision.HIGHEST
    if nblk == 1:
        win = jax.lax.slice_in_dim(wp, base, base + span, axis=-1)
        out = jnp.einsum("...s,si->...i", win.astype(A.dtype), A, precision=hp)
    else:
        wins = jnp.stack(
            [
                jax.lax.slice_in_dim(
                    wp, base + k * blk, base + k * blk + span, axis=-1
                )
                for k in range(nblk)
            ],
            axis=-2,
        )
        out = jnp.einsum(
            "...ks,si->...ki", wins.astype(A.dtype), A, precision=hp
        )
        out = out.reshape(*out.shape[:-2], p_pad)
    return out[..., :p].astype(w.dtype)


def _conv_banded_matmul_bank(w, kerns, lo, p, blk=512):
    """``full_conv(w, k_j)[..., lo:lo+p]`` for several same-length kernels
    as ONE banded matmul.

    Same-mode convolutions of one input share the input window exactly, so
    the per-kernel band matrices of :func:`_conv_banded_matmul` concatenate
    along the output-column axis and the window (the dominant HBM read for
    long-tap short-output filters like the CUSP + ZAC energy pair) is
    fetched once for the whole bank. Returns a list of ``(..., p)`` arrays,
    one per kernel, each column computed by the same contraction as the
    single-kernel matmul.
    """
    m = int(kerns[0].shape[-1])
    n = w.shape[-1]
    nk = len(kerns)
    blk = min(blk, p)
    nblk = -(-p // blk)
    p_pad = nblk * blk
    span = blk + m - 1
    A = _band_matrix(kerns, blk)
    A = jnp.asarray(A.astype(np.result_type(w.dtype, np.float32)))

    pad_l = max(0, m - 1 - lo)
    pad_r = max(0, lo + p_pad - n)
    wp = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(pad_l, pad_r)])
    base = lo - (m - 1) + pad_l
    hp = jax.lax.Precision.HIGHEST
    if nblk == 1:
        win = jax.lax.slice_in_dim(wp, base, base + span, axis=-1)
        out = jnp.einsum("...s,si->...i", win.astype(A.dtype), A, precision=hp)
        # blk == p when nblk == 1: kernel j owns columns [j*p, (j+1)*p)
        outs = [out[..., k * blk : k * blk + p] for k in range(nk)]
    else:
        wins = jnp.stack(
            [
                jax.lax.slice_in_dim(
                    wp, base + k * blk, base + k * blk + span, axis=-1
                )
                for k in range(nblk)
            ],
            axis=-2,
        )
        out = jnp.einsum(
            "...ks,si->...ki", wins.astype(A.dtype), A, precision=hp
        )
        # (..., nblk, nk*blk) -> (..., nk, p_pad)
        out = out.reshape(*out.shape[:-2], nblk, nk, blk)
        out = jnp.moveaxis(out, -2, -3).reshape(*out.shape[:-3], nk, p_pad)
        outs = [out[..., k, :p] for k in range(nk)]
    return [o.astype(w.dtype) for o in outs]


# largest p*m (outputs x taps, per event) routed to the banded matmul; above
# this the FFT path has fewer FLOPs even counting its elementwise passes
_MATMUL_MAC_LIMIT = int(os.getenv("DSPEED_TPU_CONV_MATMUL_MACS", 16_000_000))


def _convolve_mode(w, kern, ch, n, m, name):
    """Route a mode-sliced convolution: Pallas banded matmul (TPU, constant
    kernel — the window never re-materializes in HBM and NaN rows poison
    in-VMEM), XLA banded matmul, direct (short taps), else FFT.

    Returns ``(out, poisoned)`` — ``poisoned`` is True when the kernel
    already NaN-poisoned bad rows in VMEM, so the caller must skip its own
    row mask (an extra full-array HBM pass)."""
    lo, p = _mode_window(ch, n, m)
    route = os.getenv("DSPEED_TPU_CONV", "auto")
    concrete = not isinstance(kern, jax.core.Tracer) and kern.ndim == 1
    if route == "direct" or (route == "auto" and m <= 32 and kern.ndim == 1):
        return _slice_mode(_conv_full_direct_only(w, kern), n, m, ch), False
    if route == "matmul" or (
        route == "auto" and concrete and p * m <= _MATMUL_MAC_LIMIT
    ):
        if concrete:
            kn = np.asarray(kern)
            if not np.isnan(kn).any():
                from ._pallas import banded_conv_multi, in_tile, pallas_available

                # inside a generic row tile the XLA banded matmul lowers
                # straight onto the MXU; a nested pallas_call cannot
                if pallas_available() and not in_tile():
                    out = banded_conv_multi(w, [kn], lo, p)
                    if out is not None:
                        return out[0], True
                if in_tile():
                    blk = _tile_blk(m, p)
                    if blk is not None:
                        return _conv_banded_matmul(w, kn, lo, p, blk=blk), False
            return _conv_banded_matmul(w, kn, lo, p), False
    return _slice_mode(_conv_full_fft(w, kern), n, m, ch), False


def _sp_route(w, kern, ch, n, m):
    """Sequence-parallel 'same' convolution when the chain sharded the
    sample axis (``ProcessingChain.set_sharding(..., sample_axis=...)``):
    overlap-save with ``ppermute`` halo exchange under ``shard_map``
    (SURVEY.md §5; reference single-host hook ``convolutions.py:81``).
    Returns ``None`` when not applicable (unsharded, wrong mode, halo
    larger than a shard)."""
    if ch != "s" or getattr(kern, "ndim", 0) != 1:
        return None
    from .. import config

    ss = config.sample_sharding()
    if ss is None:
        return None
    mesh, axis, batch_axes = ss
    nsh = mesh.shape[axis]
    if n % nsh or (m - 1) > n // nsh:
        return None
    from ..parallel.conv import sp_convolve_same_traced

    return sp_convolve_same_traced(
        w, jnp.asarray(np.asarray(kern), w.dtype), mesh, axis, batch_axes
    )


def _conv_kernel_checks(w_in, kernel_arr, name):
    n = w_in.shape[-1]
    m = kernel_arr.shape[-1]
    if m > n:
        raise DSPFatal("The filter is longer than the input waveform")
    return n, m


def _kernel_has_nan(kern):
    """Host-evaluated for numpy consts so the check folds out of the trace."""
    if isinstance(kern, np.ndarray):
        return bool(np.isnan(kern).any())
    return jnp.any(jnp.isnan(kern))


def _as_kernel_array(kernel_in):
    """Keep config-constant kernels as numpy: ``jnp.asarray`` under an active
    trace turns constants into tracers, which blocks the trace-time folding
    of the kernel's FFT/flip (XLA's own constant folding skips FFT ops)."""
    if isinstance(kernel_in, np.ndarray):
        return kernel_in
    return jnp.asarray(kernel_in)


@kernel(
    "(n),(m),(),(p)", ["ffbf", "ddbd"], nout=1, static=[2], uses_dims=True,
    badrow_arg=0, mask_preserving=True,
)
def convolve_wf(w_in, kernel_in, mode_in, dims, badrow=None):
    """Direct convolution with modes f/v/s (reference ``convolutions.py:24``)."""
    kern = _as_kernel_array(kernel_in)
    if kern.ndim > 1:
        raise DSPFatal("convolve_wf expects a shared 1-D kernel")
    n, m = _conv_kernel_checks(w_in, kern, "convolve_wf")
    ch = _mode_char(mode_in, "convolve_wf")
    p = dims["p"]
    expect = {"f": n + m - 1, "v": abs(n - m) + 1, "s": max(n, m)}[ch]
    if p != expect:
        raise DSPFatal(f"Output waveform has length {p}; expect {expect}")
    sp = _sp_route(w_in, kern, ch, n, m)
    if sp is not None:
        out, poisoned = sp.astype(w_in.dtype), False
    else:
        out, poisoned = _convolve_mode(w_in, kern, ch, n, m, "convolve_wf")
        out = out.astype(w_in.dtype)
    if poisoned:  # rows already NaN-poisoned in VMEM (NaN-free kernel)
        return out
    row = isnan_any(w_in, 1) if badrow is None else badrow
    bad = row | _kernel_has_nan(kern)
    return nanmask(bad, out)


@kernel(
    "(n),(m),(),(p)", ["ffbf", "ddbd"], nout=1, static=[2], uses_dims=True,
    badrow_arg=0, mask_preserving=True,
)
def fft_convolve_wf(w_in, kernel_in, mode_in, dims, badrow=None):
    """FFT convolution with modes f/v/s (reference ``convolutions.py:81``).

    NaN events poison their output rows (NaN propagates through every
    route per-row; the mask makes the rows canonical all-NaN).
    """
    kern = _as_kernel_array(kernel_in)
    if kern.ndim > 1:
        raise DSPFatal("fft_convolve_wf expects a shared 1-D kernel")
    n, m = _conv_kernel_checks(w_in, kern, "fft_convolve_wf")
    ch = _mode_char(mode_in, "fft_convolve_wf")
    sp = _sp_route(w_in, kern, ch, n, m)
    if sp is not None:
        out, poisoned = sp.astype(w_in.dtype), False
    else:
        out, poisoned = _convolve_mode(w_in, kern, ch, n, m, "fft_convolve_wf")
        out = out.astype(w_in.dtype)
    if poisoned:  # rows already NaN-poisoned in VMEM (NaN-free kernel)
        return out
    bad = isnan_any(w_in, 1) if badrow is None else badrow
    return nanmask(bad | _kernel_has_nan(kern), out)


def _conv_step_taps(step, ik: int):
    """The concrete taps array of a conv step's kernel operand, or None
    (tracer/per-event kernels can't pick a Mosaic-lowerable route)."""
    p = step.params[ik] if len(step.params) > ik else None
    if isinstance(p, np.ndarray):
        return p
    v = getattr(p, "const_value", None)
    if v is not None and getattr(p, "is_const", False):
        return np.asarray(v)
    return None


def _conv_tile_safe(step):
    """Tile-safe when the routed form is shifted adds or a banded einsum
    (both lower in Mosaic); FFT routes and per-event kernels stay out."""
    route = os.getenv("DSPEED_TPU_CONV", "auto")
    if route == "fft":
        return False
    kern = _conv_step_taps(step, 1)
    if kern is None or kern.ndim != 1 or np.isnan(kern).any():
        return False
    m = kern.shape[-1]
    if m <= 32:
        return True  # direct shifted-adds route
    wvar = step.params[0]
    shape = getattr(wvar, "shape", None)
    if not shape or not isinstance(shape[-1], (int, np.integer)):
        return False
    n = int(shape[-1])
    mode = step.params[2] if len(step.params) > 2 else ord("s")
    if isinstance(mode, str):
        ch = mode.strip("'\"")
    else:
        try:
            ch = chr(int(mode))
        except (TypeError, ValueError):
            return False
    if ch not in ("f", "v", "s"):
        return False
    _, p = _mode_window(ch, n, m)
    if p * m > _MATMUL_MAC_LIMIT:
        return False  # would route to FFT
    if os.getenv("DSPEED_TPU_CONV_TILE", "1") == "0":
        return False  # A/B: keep convolutions out of row-tile groups
    # banded-matmul route: the (blk+m-1, blk) band matrix becomes a VMEM-
    # resident tile constant; the block width shrinks (r5, `_tile_blk`)
    # until it fits — sharing the group's window read beats the standalone
    # kernel when the surviving block stays MXU-sized. Very long taps that
    # shrink below 256 columns (CUSP/ZAC: m=1696 -> blk 128) measured a
    # LOSS in-tile (462k -> 450k wf/s whole-chain @32768: many serial
    # small matmuls starve the tile schedule) — they keep the standalone
    # Pallas bank. The t0 filter (m=133 -> blk 384) merges and wins.
    blk = _tile_blk(m, p)
    return blk is not None and blk >= min(256, p)


convolve_wf.tile_safe = _conv_tile_safe
fft_convolve_wf.tile_safe = _conv_tile_safe


@kernel(
    "(n),(m),(p)", ["fff", "ddd"], nout=1, uses_dims=True,
    badrow_arg=0, mask_preserving=True,
)
def reflected_convolve_wf(w_in, kernel_in, dims, badrow=None):
    """Reflect-pad then 'same' convolve (reference ``convolutions.py:132``)."""
    kern = _as_kernel_array(kernel_in)
    n, m = _conv_kernel_checks(w_in, kern, "reflected_convolve_wf")
    ext = int(m / 2) + 1
    from ._pallas import in_tile

    if in_tile():
        # Mosaic has no `rev`: reverse the edge windows with an exchange-
        # matrix dot instead (a permutation matmul is exact — each output
        # lane is 1.0*x + zeros), then concat. Same values as the reflect
        # pad below, just a flip-free lowering.
        J = jnp.asarray(np.eye(ext, dtype=w_in.dtype)[::-1])
        hp = jax.lax.Precision.HIGHEST
        left = jnp.einsum(
            "...i,ij->...j", w_in[..., 1 : ext + 1], J, precision=hp
        )
        right = jnp.einsum(
            "...i,ij->...j", w_in[..., -ext - 1 : -1], J, precision=hp
        )
        wpad = jnp.concatenate([left, w_in, right], axis=-1)
    else:
        wpad = jnp.pad(
            w_in, [(0, 0)] * (w_in.ndim - 1) + [(ext, ext)], mode="reflect"
        )
    full = _conv_full_direct(wpad, kern)
    same = _slice_mode(full, n + 2 * ext, m, "s")
    out = same[..., ext:-ext].astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1) if badrow is None else badrow, out)


def _reflected_tile_safe(step):
    """Only the short-tap shifted-adds route lowers in a row tile (the
    long-tap fallback is the FFT)."""
    kern = _conv_step_taps(step, 1)
    return (
        kern is not None
        and kern.ndim == 1
        and kern.shape[-1] <= 32
        and not np.isnan(kern).any()
    )


reflected_convolve_wf.tile_safe = _reflected_tile_safe
