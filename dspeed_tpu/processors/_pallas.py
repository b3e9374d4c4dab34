"""Pallas TPU kernels for hot DSP ops.

Currently: a shift-FMA FIR convolution. Each grid program holds a
``(TILE_B, ncols)`` row block VMEM-resident (revisited across the
fast-varying output-tile axis, so Pallas skips the re-copy) and accumulates
the ``m``-tap convolution as ``m`` VPU fused multiply-adds over a dynamic
slice — avoiding XLA's generic ``conv_general_dilated`` lowering, which pays
MXU patch-assembly overhead at channel count 1.

Enabled on TPU backends; ``DSPEED_TPU_PALLAS=0`` disables, and any failure
falls back to the XLA path (see ``convolutions._conv_full_direct``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["pallas_available", "fir_convolve_full"]

_TILE_B = 8
_TILE_N = 512


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
            w = jnp.ones((_TILE_B, _TILE_N + 4))
            taps = jnp.ones((1, 5))
            jax.block_until_ready(_fir_call(w, taps))
            _SMOKE_OK = True
        except Exception:
            _SMOKE_OK = False
    return _SMOKE_OK


def _fir_kernel(w_ref, taps_ref, out_ref, *, m: int, tile_n: int):
    """One (TILE_B, tile_n) output tile: slice the halo'd window from the
    VMEM-resident row block and accumulate taps with VPU FMAs."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    w = w_ref[:, pl.ds(j * tile_n, tile_n + m - 1)].astype(jnp.float32)
    acc = jnp.zeros((w.shape[0], tile_n), jnp.float32)
    for k in range(m):
        acc = acc + w[:, k : k + tile_n] * taps_ref[0, k]
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fir_call(wpad, taps_rev, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, ncols = wpad.shape
    m = taps_rev.shape[-1]
    n_out = ncols - (m - 1)
    grid = (b // _TILE_B, n_out // _TILE_N)

    kern = functools.partial(_fir_kernel, m=m, tile_n=_TILE_N)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n_out), wpad.dtype),
        grid=grid,
        in_specs=[
            # whole padded row block; constant over j so it stays resident
            pl.BlockSpec(
                (_TILE_B, ncols), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, m), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TILE_B, _TILE_N), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(wpad, taps_rev)


def fir_convolve_full(w, taps, interpret: bool = False):
    """Full-mode convolution of batched ``w`` (..., n) with 1-D ``taps``
    (m,); returns (..., n + m - 1). ``interpret=True`` runs the kernel in
    the Pallas interpreter (CPU correctness tests)."""
    taps = jnp.asarray(taps)
    m = int(taps.shape[-1])
    *lead, n = w.shape
    w2 = w.reshape(-1, n)
    b = w2.shape[0]

    n_full = n + m - 1
    pad_b = (-b) % _TILE_B
    n_out_pad = (-n_full) % _TILE_N
    wpad = jnp.pad(w2, ((0, pad_b), (m - 1, m - 1 + n_out_pad)))
    taps_rev = taps[::-1].reshape(1, m).astype(wpad.dtype)

    out = _fir_call(wpad, taps_rev, interpret=interpret)
    out = out[:b, :n_full]
    return out.reshape(*lead, n_full)
