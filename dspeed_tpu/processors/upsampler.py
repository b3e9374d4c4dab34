"""Upsampling processors (reference ``dspeed/processors/upsampler.py``).

The reference writes output samples in sequential scatter loops (:19
``upsampler``, :57 ``interpolating_upsampler``). Since the resampling ratio
and lengths are static, the write pattern is inverted on the host into a
gather map (output index → source index / interpolation weights), and the
device work is one vectorized gather + blend — no scatter, no loops.
"""

from __future__ import annotations

from math import ceil

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_float, static_int
from ._kernel import kernel
from ._spline import natural_spline_w2

__all__ = ["upsampler", "interpolating_upsampler"]


@kernel("(n),(),(m)", ["fff", "ddd"], nout=1, uses_dims=True)
def upsampler(w_in, upsample, dims):
    """Sample replication (reference ``upsampler.py:19``): each input sample
    is written to ``int(upsample)`` output slots starting at
    ``int(i*upsample - floor(upsample/2))``; unwritten slots stay NaN."""
    up = static_float(upsample, "upsampler", "upsample")
    if not up > 0:
        raise DSPFatal("Upsample must be greater than 0")
    n = w_in.shape[-1]
    m = dims["m"]

    # host: invert the scatter into a gather map (last write wins)
    src = np.full(m, -1, dtype="int32")
    width = int(up)
    half = int(np.floor(up / 2))
    for t_in in range(n):
        t0 = int(t_in * up - half)
        lo = max(t0, 0)
        hi = min(t0 + width, m)
        if lo < hi:
            src[lo:hi] = t_in
    valid = src >= 0
    # poison on the INPUT domain: every output slot is a copy of some input
    # sample (or the NaN fill below), so all-NaN input rows give all-NaN
    # output rows — bit-identical to masking the output, at 1/up the HBM
    # (the output-side select was a 627 MB pass on the flagship's 16x
    # up-domain; the input-side one is ~50 MB, measured r5)
    w_in = nanmask(isnan_any(w_in, 1), w_in)
    if up == width:
        # integer ratio: the map is a staircase src[j] = (j+half)//width —
        # repeat + static slice instead of a gather (TPU gathers lower to
        # serial row loops; a repeat is a fused broadcast)
        rep = jnp.repeat(w_in, width, axis=-1)
        if half + m > n * width:
            rep = jnp.pad(
                rep, [(0, 0)] * (w_in.ndim - 1) + [(0, half + m - n * width)]
            )
        out = rep[..., half : half + m]
    else:
        out = w_in[..., np.where(valid, src, 0)]
    if not valid.all():
        out = jnp.where(jnp.asarray(valid), out, jnp.nan)
    return out.astype(w_in.dtype)


@kernel("(n),(),(m)", ["fbf", "dbd"], nout=1, static=[1], uses_dims=True)
def interpolating_upsampler(w_in, mode_in, dims):
    """Interpolated upsampling, modes i/n/f/c/l/h/s
    (reference ``upsampler.py:57``). Ratio is ``m/n`` (static)."""
    mode = static_int(mode_in, "interpolating_upsampler", "mode_in")
    ch = chr(mode)
    if ch not in "infclhs":
        raise DSPFatal("Unrecognized interpolation mode")
    n = w_in.shape[-1]
    m = dims["m"]
    up = m / n

    if ch == "i":
        if up != int(up):
            raise DSPFatal(
                "interpolating_upsampler requires len(w_out) to be an integer "
                "multiple of len(w_in) for mode 'i'"
            )
        src = np.zeros(m, dtype="int32")
        is_orig = np.zeros(m, dtype=bool)
        for i_in in range(n):
            j = int(up) * i_in
            src[j] = i_in
            is_orig[j] = True
        out = jnp.where(
            jnp.asarray(is_orig), w_in[..., jnp.asarray(src)], 0.0
        ).astype(w_in.dtype)
        return nanmask(isnan_any(w_in, 1), out)

    # host: segment map for the remaining modes, mirroring the reference's
    # per-segment loops (including its trailing-extrapolation behavior)
    seg = np.zeros(m, dtype="int32")  # source segment i_in per output sample
    if ch == "n":
        bounds = [min(ceil(up * (i + 0.5)), m) for i in range(n)]
        last = 0
        for i_in, b in enumerate(bounds):
            seg[last:b] = i_in
            last = b
        seg[last:] = n - 1
        out = w_in[..., jnp.asarray(seg)]
        return nanmask(isnan_any(w_in, 1), out.astype(w_in.dtype))

    if ch in ("f", "c"):
        last = 0
        for i_in in range(n):
            b = ceil(up * (i_in + 1)) if ch == "f" else int(np.floor(up * i_in)) + 1
            b = min(max(b, 0), m)
            seg[last:b] = i_in
            last = b
        seg[last:] = n - 1
        out = w_in[..., jnp.asarray(seg)]
        return nanmask(isnan_any(w_in, 1), out.astype(w_in.dtype))

    # l / h / s: fractional positions within segments
    j = np.arange(m)
    if ch == "s":
        # the reference's spline back-substitution (upsampler.py:201-213)
        # iterates segments downward with inclusive bounds, so an output
        # sample on a segment boundary takes its value from the segment
        # BELOW, extrapolated with t0 > 1
        i_in_arr = np.clip(
            np.floor((j - 1) / up).astype("int32"), 0, n - 2
        )
    else:
        i_in_arr = np.zeros(m, dtype="int32")
        last = 0
        n_seg = n if ch == "l" else n - 1
        for i_in in range(n_seg):
            b = min(ceil(up * (i_in + 1)), m)
            i_in_arr[last:b] = i_in
            last = b
        i_in_arr[last:] = n_seg - 1
    t0_arr = j / up - i_in_arr
    t0j = jnp.asarray(t0_arr, w_in.dtype)
    i0 = jnp.asarray(i_in_arr)
    w_i = w_in[..., i0]
    i1 = jnp.asarray(np.minimum(i_in_arr + 1, n - 1))
    w_i1 = w_in[..., i1]

    if ch == "l":
        out = w_i + t0j * (w_i1 - w_i)
    elif ch == "h":
        im1 = jnp.asarray(np.maximum(i_in_arr - 1, 0))
        i2 = jnp.asarray(np.minimum(i_in_arr + 2, n - 1))
        first = jnp.asarray(i_in_arr == 0)
        last_seg = jnp.asarray(i_in_arr == n - 2)
        m0 = jnp.where(
            first,
            (w_in[..., 1] - w_in[..., 0])[..., None],
            (w_i1 - w_in[..., im1]) / 2.0,
        )
        m1 = jnp.where(
            last_seg,
            (w_in[..., -1] - w_in[..., -2])[..., None],
            (w_in[..., i2] - w_i) / 2.0,
        )
        t1j = 1.0 - t0j
        out = (
            (-2.0 * t1j**3 + 3.0 * t1j**2) * w_i
            + (-2.0 * t0j**3 + 3.0 * t0j**2) * w_i1
            - (t1j**3 - t1j**2) * m0
            + (t0j**3 - t0j**2) * m1
        )
    else:  # 's'
        w2 = natural_spline_w2(w_in)
        t1j = 1.0 - t0j
        out = (
            t1j * w_i
            + t0j * w_i1
            + ((t1j**3 - t1j) * w2[..., i0] + (t0j**3 - t0j) * w2[..., i1]) / 6.0
        )
    return nanmask(isnan_any(w_in, 1), out.astype(w_in.dtype))


# NOT tile_safe: the integer-ratio repeat lowers to a (n, r) -> (n*r)
# shape cast whose minor dim (r, e.g. 16) is not a lane multiple — Mosaic
# rejects it ("infer-vector-layout: unsupported shape cast"; re-probed
# r5, jnp.repeat and broadcast+reshape both crash the compiler and
# pltpu.repeat has tile semantics). A bit-exact in-tile alternative — the
# staircase as blocked one-hot MXU contractions, the banded-conv pattern —
# lowered fine but measured a chain-level LOSS on v5e (standard flagship
# 449k -> 300k wf/s @32768 merged; 313k even when the upsampler only led
# the downstream group): the VMEM-computed up-domain serializes the whole
# group where the XLA repeat streams at near-spec. Groups split around
# the upsampler; the window chains on either side still fuse.
