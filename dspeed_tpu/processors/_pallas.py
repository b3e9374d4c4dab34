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
import os

import jax
import jax.numpy as jnp

__all__ = ["pallas_available", "fused_energy"]

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
_EN_BLK = 512


def _fused_energy_kernel(w_ref, bl_ref, tri_ref, tri8_ref, omc_ref,
                         *refs, trap_specs: tuple, n: int):
    pz_ref = refs[0]
    trap_refs = refs[1:-1]
    emax_ref = refs[-1]
    nb = n // _EN_BLK
    w = w_ref[:] - bl_ref[:]  # (TB, n) baseline-subtracted
    omc = omc_ref[0, 0]

    wb = w.reshape(_EN_TILE_B * nb, _EN_BLK)
    tri = tri_ref[:]  # (BLK, BLK) inclusive lower-triangular ones
    local = jnp.dot(wb, tri, preferred_element_type=jnp.float32)  # in-blk cumsum
    sums = local[:, _EN_BLK - 1].reshape(_EN_TILE_B, nb)
    tri8x = tri8_ref[:]  # (nb, nb) strictly-lower ones: exclusive carry
    carry = jnp.dot(sums, tri8x, preferred_element_type=jnp.float32)
    S = (local.reshape(_EN_TILE_B, nb, _EN_BLK)
         + carry[:, :, None]).reshape(_EN_TILE_B, n)

    sb = S.reshape(_EN_TILE_B * nb, _EN_BLK)
    local2 = jnp.dot(sb, tri, preferred_element_type=jnp.float32)
    sums2 = local2[:, _EN_BLK - 1].reshape(_EN_TILE_B, nb)
    carry2 = jnp.dot(sums2, tri8x, preferred_element_type=jnp.float32)
    S2 = (local2.reshape(_EN_TILE_B, nb, _EN_BLK)
          + carry2[:, :, None]).reshape(_EN_TILE_B, n)

    pz = w + omc * (S - w)
    pz_ref[:] = pz
    spz = (1.0 - omc) * S + omc * S2

    def shifted(k):
        # Spz[i-k] with zero fill for i < k
        if k == 0:
            return spz
        pad = jnp.zeros((_EN_TILE_B, k), jnp.float32)
        return jnp.concatenate([pad, spz[:, : n - k]], axis=1)

    def pz_shift(k):
        if k == 0:
            return pz
        pad = jnp.zeros((_EN_TILE_B, k), jnp.float32)
        return jnp.concatenate([pad, pz[:, : n - k]], axis=1)

    def window_sum(length, off):
        """Sum of pz over ``[t-off-length+1, t-off]`` per output t.

        Short windows add the samples directly (prefix differences of the
        ~1e8-magnitude Spz would leave eps*|Spz| ~ O(1) absolute error,
        which a /8 normalization cannot hide); long windows amortize that
        rounding over the window length and use the Spz difference.
        """
        if length <= 32:
            acc = pz_shift(off)
            for k in range(off + 1, off + length):
                acc = acc + pz_shift(k)
            return acc
        return shifted(off) - shifted(off + length)

    done = {}
    first_trap = None
    for spec, t_ref in zip(trap_specs, trap_refs):
        if spec in done:
            trap = done[spec]
        elif spec[0] == "norm":
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
        t_ref[:] = trap
        if first_trap is None:
            first_trap = trap
    emax_ref[:] = jnp.max(first_trap, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("trap_specs", "interpret")
)
def _fused_energy_call(w, bl, omc, trap_specs, interpret=False):
    import numpy as np

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = w.shape
    nb = n // _EN_BLK
    tri = jnp.asarray(np.tril(np.ones((_EN_BLK, _EN_BLK), np.float32)).T)
    # (row j) -> sum of full blocks before j: strictly upper in (sums @ M)
    tri8 = jnp.asarray(np.triu(np.ones((nb, nb), np.float32), 1))

    kern = functools.partial(
        _fused_energy_kernel, trap_specs=trap_specs, n=n
    )
    grid = (b // _EN_TILE_B,)
    k = len(trap_specs)

    def row_spec(width):
        return pl.BlockSpec(
            (_EN_TILE_B, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    return pl.pallas_call(
        kern,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((b, n), jnp.float32)] * (1 + k)
            + [jax.ShapeDtypeStruct((b, 1), jnp.float32)]
        ),
        grid=grid,
        in_specs=[
            row_spec(n),
            row_spec(1),
            pl.BlockSpec((_EN_BLK, _EN_BLK), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, nb), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=tuple([row_spec(n)] * (1 + k) + [row_spec(1)]),
        interpret=interpret,
    )(w, bl, tri, tri8, omc)


def fused_energy(
    w, baseline, tau, rise: int | None = None, flat: int | None = None,
    trap_specs=None, interpret: bool = False,
):
    """Fused bl_subtract -> pole_zero(tau) -> trapezoids -> amax.

    With ``rise``/``flat``: legacy single-trap form returning
    ``(wf_pz, wf_trap, trapEmax)``. With ``trap_specs`` (tuple of
    ``("norm", rise, flat)`` / ``("asym", rise, flat, fall)``): returns
    ``(wf_pz, [traps...], emax_of_first)``. One HBM read of the waveform
    replaces the unfused chain's per-processor passes; ``n`` must be a
    multiple of 512.
    """
    import numpy as np

    legacy = trap_specs is None
    if legacy:
        trap_specs = (("norm", int(rise), int(flat)),)
    trap_specs = tuple(tuple(s) for s in trap_specs)

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
    outs = _fused_energy_call(w2, bl, omc, trap_specs, interpret=interpret)
    pz = outs[0][:b].reshape(*lead, n)
    traps = [t[:b].reshape(*lead, n) for t in outs[1:-1]]
    emax = outs[-1][:b, 0].reshape(lead)
    if legacy:
        return pz, traps[0], emax
    return pz, traps, emax
