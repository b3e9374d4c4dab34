"""Small utility processors.

Reference semantics: ``time_over_threshold.py:16``, ``saturation.py:20``,
``presum.py:20``, ``pad.py:20``, ``log_check.py:16``, ``sort.py:14``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import cdim, isnan_any, nanmask, static_int
from ._kernel import kernel

__all__ = [
    "time_over_threshold",
    "saturation",
    "presum",
    "pad",
    "log_check",
    "sort",
]


@kernel("(n),()->()", ["ff->f", "dd->d"])
def time_over_threshold(w_in, a_threshold):
    """Count of samples strictly above the threshold."""
    thr = cdim(jnp.asarray(a_threshold, w_in.dtype))
    n = jnp.sum(w_in > thr, axis=-1).astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1) | isnan_any(a_threshold), n)


@kernel("(n),()->(),()", ["ff->ff", "dd->dd"])
def saturation(w_in, bit_depth_in):
    """Counts of samples at the ADC rails: low rail is 0, high rail is
    ``2**bit_depth - bit_depth`` (reference ``saturation.py:82``)."""
    bd = static_int(bit_depth_in, "saturation", "bit_depth_in")
    if bd != float(bit_depth_in):
        raise DSPFatal("The bit depth is not an integer")
    if bd <= 0:
        raise DSPFatal("The bit depth is not positive")
    hi_rail = 2**bd - bd
    n_lo = jnp.sum(w_in == 0, axis=-1).astype(w_in.dtype)
    n_hi = jnp.sum(w_in == hi_rail, axis=-1).astype(w_in.dtype)
    bad = isnan_any(w_in, 1)
    return nanmask(bad, n_lo), nanmask(bad, n_hi)


@kernel("(n),(),(),(m)", ["ffff", "dddd"], nout=2, uses_dims=True)
def presum(w_in, do_norm, dims):
    """Downsample by block sum; outputs ``(ps_fact, w_out)``.

    The reference's arg order is ``(w_in, do_norm, ps_fact_out, w_out)`` with
    ``ps_fact`` an output reporting ``len(w_in)//len(w_out)``.
    """
    n = w_in.shape[-1]
    m = dims["m"]
    dn = static_int(do_norm, "presum", "do_norm")
    if dn not in (0, 1):
        raise DSPFatal("do_norm type not found.")
    fact = n // m
    wt = w_in[..., : m * fact].reshape(*w_in.shape[:-1], m, fact)
    out = jnp.sum(wt.astype(jnp.float32 if w_in.dtype == jnp.float32 else w_in.dtype), axis=-1)
    if dn == 1:
        # the reference divides each addend by the factor before summing
        out = jnp.sum(wt / w_in.dtype.type(fact), axis=-1)
    out = out.astype(w_in.dtype)
    bad = isnan_any(w_in, 1)
    ps_fact = jnp.broadcast_to(w_in.dtype.type(fact), w_in.shape[:-1])
    return nanmask(bad, ps_fact), nanmask(bad, out)


@kernel("(n),(),(),(),(),(m)", ["flffff", "dldddd"], nout=1, uses_dims=True)
def pad(w_in, len_in, offset, start_val, end_val, dims):
    """Pad a variable-length vector into a fixed-length buffer
    (reference ``pad.py:20``)."""
    n = w_in.shape[-1]
    m = dims["m"]
    pos = jnp.arange(m)
    li = jnp.asarray(len_in, jnp.int32)
    if li.ndim == 0:
        li = jnp.broadcast_to(li, w_in.shape[:-1])
    off = jnp.asarray(offset)
    if off.ndim == 0:
        off = jnp.broadcast_to(off, w_in.shape[:-1])
    i_beg = jnp.trunc(off).astype(jnp.int32)
    i_end = i_beg + li
    src = pos - i_beg[..., None]
    in_body = (src >= 0) & (src < li[..., None]) & (src < n)
    gathered = jnp.take_along_axis(
        w_in, jnp.clip(src, 0, n - 1), axis=-1
    )
    sv = cdim(jnp.asarray(start_val, w_in.dtype))
    ev = cdim(jnp.asarray(end_val, w_in.dtype))
    out = jnp.where(pos < i_beg[..., None], sv, ev)
    out = jnp.where(in_body, gathered, out).astype(w_in.dtype)

    # NaN checks apply only to the occupied part of the input
    occupied = jnp.arange(n) < li[..., None]
    bad_in = jnp.any(jnp.isnan(w_in) & occupied, axis=-1)
    non_int = jnp.trunc(off) != off
    too_long = li > n
    bad = bad_in | isnan_any(off) | non_int | too_long
    return nanmask(bad, out)


@kernel("(n)->(n)", ["f->f", "d->d"])
def log_check(w_in):
    """log(w) if strictly positive everywhere, else all-NaN."""
    any_nonpos = jnp.any(w_in <= 0, axis=-1)
    safe = jnp.where(w_in <= 0, 1.0, w_in)
    out = jnp.log(safe).astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1) | any_nonpos, out)


@kernel("(n)->(n)", ["f->f", "d->d"])
def sort(w_in):
    """Per-event ascending sort."""
    out = jnp.sort(w_in, axis=-1)
    return nanmask(isnan_any(w_in, 1), out)

# generic row-tile fusion: reductions / reshape block sums (sort and pad
# gather per row — excluded)
time_over_threshold.tile_safe = True
saturation.tile_safe = True
presum.tile_safe = True

# generic row-tile fusion (r5 audit): elementwise/reduce/small-matmul bodies
# with no scans, sorts, FFTs or per-row dynamic gathers — Mosaic-lowerable;
# the two-tile probe compile still guards every group at trace time
log_check.tile_safe = True
