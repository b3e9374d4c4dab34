"""Numerical building blocks for TPU-native DSP kernels.

The reference implements its hot filters as sequential per-sample recursions
in float64 scratch buffers (``pole_zero.py:62-73``, ``trap_filters.py:62-76``,
``recursive_filter.py``). Those recursions do not map onto TPU vector units;
this module provides the parallel reformulations used by the dspeed_tpu
kernel library:

- :func:`hp_cumsum` — prefix sums with selectable accumulation precision,
  including a *double-single* (two-float32) compensated ``associative_scan``
  that reaches ~1e-9 relative accuracy at native VPU speed.
- :func:`iir_first_order` — blocked first-order linear recurrence
  ``y[i] = x[i] + p*y[i-1]``: in-block work becomes a triangular matmul (MXU),
  cross-block carries a tiny affine ``associative_scan``.
- :func:`nan_row` / :func:`poison` — the reference's NaN-poisoning convention
  (any NaN in an event's core input ⇒ all outputs NaN for that event).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import config

__all__ = [
    "nan_row",
    "poison",
    "hp_cumsum",
    "PrefixSum",
    "iir_first_order",
    "shift_right",
]


def nan_row(x, core_ndim: int = 1):
    """Boolean mask (batch-shaped, keepdims) of events with any NaN in ``x``."""
    m = jnp.isnan(x)
    for _ in range(core_ndim):
        m = jnp.any(m, axis=-1, keepdims=True)
    return m


def poison(mask, *outs):
    """Replace outputs with NaN where ``mask`` is true (broadcast from left).

    ``mask`` has keepdims batch shape ``(..., 1)``; each output may have more
    or fewer core dims, so the mask is re-rank-matched per output.
    """
    res = []
    for o in outs:
        m = mask
        while m.ndim > o.ndim:
            m = m[..., 0]
        while m.ndim < o.ndim:
            m = m[..., None]
        if jnp.issubdtype(o.dtype, jnp.floating):
            res.append(jnp.where(m, jnp.nan, o))
        else:
            res.append(o)
    return res[0] if len(res) == 1 else tuple(res)


def shift_right(x, k: int = 1, fill=0.0, axis: int = -1):
    """Shift along axis, filling vacated leading slots."""
    if k == 0:
        return x
    pad = [(0, 0)] * x.ndim
    ax = axis % x.ndim
    pad[ax] = (k, 0)
    xp = jnp.pad(x, pad, constant_values=fill)
    sl = [slice(None)] * x.ndim
    sl[ax] = slice(0, x.shape[ax])
    return xp[tuple(sl)]


# ---------------------------------------------------------------------------
# double-single (two-float) compensated arithmetic
# ---------------------------------------------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _ds_combine(x, y):
    (s1, e1), (s2, e2) = x, y
    s, e = _two_sum(s1, s2)
    return s, e + e1 + e2


def _ds_scan(sums):
    """Inclusive compensated (two-float) scan along the last axis.

    Hillis-Steele with static pad/slice shifts: the same error behavior as
    ``associative_scan(_ds_combine, ...)`` (any combine tree yields a valid
    compensated sum; shifted-in zeros are an exact identity for
    ``_two_sum``), but with no zero-sized recursion slices or dynamic
    slices — it lowers inside a Mosaic row tile (generic fusion)."""
    hi, lo = sums, jnp.zeros_like(sums)
    nb = sums.shape[-1]
    d = 1
    while d < nb:
        hi, lo = _ds_combine((shift_right(hi, d), shift_right(lo, d)), (hi, lo))
        d *= 2
    return hi, lo


class PrefixSum:
    """An inclusive prefix sum held at accumulation precision.

    The low-order compensation is stored either as a full plane (``lo``,
    double-single mode) or compactly as one value per block
    (``lo_blocks`` + ``block`` + ``shift``, blocked mode) — the carry is
    constant within a block, so materializing it waveform-sized would waste
    a full HBM pass per cumsum; it is expanded lazily (a broadcast XLA
    fuses into the consumer) only where consumed.
    """

    def __init__(self, hi, lo=None, lo_blocks=None, block=None, shift=0):
        self.hi = hi
        self.lo = lo
        self.lo_blocks = lo_blocks
        self.block = block
        self.shift = shift

    def _lo_expand(self):
        if self.lo is not None:
            return self.lo
        if self.lo_blocks is None:
            return None
        n = self.hi.shape[-1]
        nb = self.lo_blocks.shape[-1]
        rep = jnp.repeat(self.lo_blocks, self.block, axis=-1)
        rep = shift_right(rep, self.shift) if self.shift else rep
        return rep[..., :n]

    def value(self, dtype=None):
        lo = self._lo_expand()
        v = self.hi if lo is None else self.hi + lo
        return v.astype(dtype) if dtype is not None else v

    def slice(self, sl) -> "PrefixSum":
        idx = (Ellipsis, sl)
        lo = self._lo_expand()
        return PrefixSum(self.hi[idx], None if lo is None else lo[idx])

    def sub(self, other: "PrefixSum", dtype=None):
        """(self - other) rounded to ``dtype`` (or hi dtype)."""
        d = self.hi - other.hi
        lo_s = self._lo_expand()
        lo_o = other._lo_expand()
        if lo_s is not None:
            d = d + (lo_s - lo_o)
        return d.astype(dtype) if dtype is not None else d

    def shift_right(self, k: int) -> "PrefixSum":
        return PrefixSum(
            shift_right(self.hi, k),
            None if self.lo is None else shift_right(self.lo, k),
            lo_blocks=self.lo_blocks,
            block=self.block,
            shift=self.shift + k,
        )

    def lo_take(self, idx):
        """Low-plane value at per-event indices ``idx`` (as gathered by
        ``take_last``); 0 where no compensation exists or ``idx`` precedes
        the shifted-in region."""
        if self.lo is not None:
            from ._helpers import take_last

            return take_last(self.lo, idx)
        if self.lo_blocks is None:
            return jnp.zeros(idx.shape, self.hi.dtype)
        from ._helpers import take_last

        nb = self.lo_blocks.shape[-1]
        blk_idx = jnp.clip((idx - self.shift) // self.block, 0, nb - 1)
        v = take_last(self.lo_blocks, blk_idx)
        return jnp.where(idx >= self.shift, v, 0.0)


# trace-local cumsum memo, installed by generic fusion while tracing a row
# tile (processors._pallas.generic_rows): members sharing a source plane
# then share ONE prefix sum in the tile jaxpr — the dedup XLA's CSE does
# for free in the unfused graph, which Mosaic does not perform. Keys hold
# a strong ref to the traced operand so id() cannot be recycled; the memo
# only exists for the duration of one trace (never cached across traces).
_TRACE_MEMO: dict | None = None


def set_cumsum_memo(memo):
    global _TRACE_MEMO
    prev = _TRACE_MEMO
    _TRACE_MEMO = memo
    return prev


def hp_cumsum(x, mode: str | None = None) -> PrefixSum:
    """Inclusive prefix sum over the last axis at accumulation precision.

    ``mode``: ``"f64"``, ``"ds"``, ``"f32"`` or None (use global policy,
    :func:`dspeed_tpu.config.accum_mode`).
    """
    if mode is None:
        mode = config.accum_mode()
    if _TRACE_MEMO is not None:
        key = (id(x), mode)
        hit = _TRACE_MEMO.get(key)
        if hit is not None and hit[0] is x:
            return hit[1]
        ps = _hp_cumsum_impl(x, mode)
        _TRACE_MEMO[key] = (x, ps)
        return ps
    return _hp_cumsum_impl(x, mode)


def _hp_cumsum_impl(x, mode: str) -> PrefixSum:
    if mode == "f64":
        return PrefixSum(jnp.cumsum(x.astype(jnp.float64), axis=-1))
    if mode == "f32":
        return PrefixSum(jnp.cumsum(x.astype(jnp.float32), axis=-1))
    if mode == "ds":
        xf = x.astype(jnp.float32)
        hi, lo = jax.lax.associative_scan(
            _ds_combine, (xf, jnp.zeros_like(xf)), axis=-1
        )
        return PrefixSum(hi, lo)
    if mode == "blocked":
        return blocked_cumsum(x)
    raise ValueError(f"unknown accumulation mode {mode!r}")


# ---------------------------------------------------------------------------
# first-order linear recurrence: y[i] = x[i] + p * y[i-1]
# ---------------------------------------------------------------------------


def _affine_combine(a, b):
    (m1, v1), (m2, v2) = a, b
    return m1 * m2, v2 + m2 * v1


def iir_first_order(x, p: float, y_init=0.0, block: int = 128):
    """Evaluate ``y[i] = x[i] + p*y[i-1]`` along the last axis, TPU-style.

    ``p`` must be a static (python/numpy) scalar — in the reference this is
    always a config/db constant. The in-block solution is a lower-triangular
    matmul with the impulse-response matrix ``T[i,j] = p^(i-j)`` (runs on the
    MXU); cross-block carries compose through a log-depth affine
    ``associative_scan`` over ``n/block`` elements.

    ``y_init`` is ``y[-1]`` (scalar or batch-shaped array).
    """
    p = float(p)
    *lead, n = x.shape
    nb = -(-n // block)
    npad = nb * block - n
    dtype = x.dtype
    if npad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, npad)])
    xb = x.reshape(*lead, nb, block)

    # T[i, j] = p^(i-j) for i >= j else 0, computed in f64 host-side
    # (p == 0: the masked upper triangle raises 0^negative -> inf before
    # `where` discards it; the kept entries are exact)
    i = np.arange(block)
    with np.errstate(divide="ignore"):
        T = np.where(
            i[:, None] >= i[None, :], p ** (i[:, None] - i[None, :]), 0.0
        )
    T = jnp.asarray(T, dtype=dtype)

    y_in = jnp.einsum(
        "...bl,kl->...bk", xb, T, preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )

    # carry c_b = y value at end of block b: c_b = p^block * c_{b-1} + y_in[b, -1]
    mults = jnp.full(xb.shape[:-1], p**block, dtype=dtype)
    vals = y_in[..., y_in.shape[-1] - 1]  # positive index: Mosaic-static slice
    m_acc, c_in = jax.lax.associative_scan(_affine_combine, (mults, vals), axis=-1)
    # previous-block carry (exclusive over blocks), seeded with y[-1] = y_init:
    # c_prev[b] = c_in[b-1] + (p^block)^b * y_init   (m_acc[b] = (p^block)^(b+1))
    y_init = jnp.asarray(y_init, dtype=dtype)
    if y_init.ndim:
        y_init = y_init[..., None]
    c_prev = shift_right(c_in, 1) + y_init * shift_right(m_acc, 1, fill=1.0)

    powers = jnp.asarray(p ** (i + 1), dtype=dtype)
    y = y_in + c_prev[..., None] * powers
    y = y.reshape(*lead, nb * block)
    return y[..., :n] if npad else y


# ---------------------------------------------------------------------------
# blocked prefix sum: triangular matmul within blocks (MXU) + compensated
# carry across block sums — the TPU-fast default accumulation mode
# ---------------------------------------------------------------------------

_TRI_CACHE: dict = {}


def _tri(block: int, dtype) -> np.ndarray:
    # cache the HOST array only: a jnp array built inside a trace is a
    # tracer and must not leak across traces
    key = (block, np.dtype(dtype).name)
    tri = _TRI_CACHE.get(key)
    if tri is None:
        tri = np.tril(np.ones((block, block), dtype=np.dtype(dtype)))
        _TRI_CACHE[key] = tri
    return tri


def blocked_cumsum(x, block: int = 128) -> PrefixSum:
    """Inclusive prefix sum via in-block triangular matmuls plus a
    double-single compensated scan over the (tiny) block-sum sequence.

    Rounding error stays bounded by in-block magnitudes instead of the full
    running sum, and the heavy lifting runs on the MXU — ~2 memory passes
    instead of the log-depth associative_scan's ~12.
    """
    *lead, n = x.shape
    xf = x.astype(jnp.float32)
    nb = -(-n // block)
    npad = nb * block - n
    if npad:
        xf = jnp.pad(xf, [(0, 0)] * (xf.ndim - 1) + [(0, npad)])
    xb = xf.reshape(*lead, nb, block)

    tri = jnp.asarray(_tri(block, np.float32))
    local = jax.lax.dot_general(
        xb, tri,
        dimension_numbers=(((xb.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # true f32 on the MXU, not bf16
    )  # (..., nb, block): in-block inclusive cumsum

    # compensated (two-float) exclusive scan over block sums: nb elements
    sums = local[..., local.shape[-1] - 1]  # positive index: Mosaic-static slice
    hi, lo = _ds_scan(sums)
    carry_hi = shift_right(hi, 1)
    carry_lo = shift_right(lo, 1)

    ps_hi = (local + carry_hi[..., None]).reshape(*lead, nb * block)
    if npad:
        ps_hi = ps_hi[..., :n]
    # low-order carry is constant per block: keep it compact (see PrefixSum)
    return PrefixSum(ps_hi, lo_blocks=carry_lo, block=block)
