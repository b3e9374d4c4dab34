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
from ._pallas import fused_energy, pallas_available

__all__ = ["fused_energy_filter", "fused_energy_front"]


def fused_energy_front(tau, trap_specs) -> Kernel:
    """Factory: one VMEM pass producing the pole-zero waveform, every
    trapezoid read off it, and the first trapezoid's maximum.

    ``trap_specs`` is a list of ``("norm", rise, flat)`` /
    ``("asym", rise, flat, fall)`` tuples. Returns a kernel
    ``(w_in, a_baseline) -> (pz, trap_0, ..., trap_{k-1}, emax_0)``.
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

    def fn(w_in, a_baseline):
        n = w_in.shape[-1]
        for s in specs:
            width = 2 * s[1] + s[2] if s[0] == "norm" else s[1] + s[2] + s[3]
            if width > n:
                raise DSPFatal("The trapezoid width is wider than the waveform")
        bad = isnan_any(w_in, 1) | isnan_any(jnp.asarray(a_baseline))

        if pallas_available() and n % 512 == 0:
            pz, traps, emax = fused_energy(
                w_in, a_baseline, tau, trap_specs=specs
            )
        else:
            from .bl_subtract import bl_subtract
            from .pole_zero import pole_zero
            from .trap_filters import asym_trap_filter, trap_norm

            (wsub,) = bl_subtract(w_in, a_baseline)
            (pz,) = pole_zero(wsub, tau)
            traps = []
            done = {}
            for s in specs:
                if s in done:
                    traps.append(done[s])
                    continue
                if s[0] == "norm":
                    (t,) = trap_norm(pz, s[1], s[2])
                else:
                    (t,) = asym_trap_filter(pz, s[1], s[2], s[3])
                done[s] = t
                traps.append(t)
            emax = jnp.max(traps[0], axis=-1)
        outs = [nanmask(bad, pz.astype(w_in.dtype))]
        outs += [nanmask(bad, t.astype(w_in.dtype)) for t in traps]
        outs.append(nanmask(bad, emax.astype(w_in.dtype)))
        return tuple(outs)

    sig = "(n),()->(n)," + ",".join(["(n)"] * k) + ",()"
    nouts = k + 2
    types = ["ff->" + "f" * nouts, "dd->" + "d" * nouts]
    return Kernel(fn, sig, types, name="fused_energy_front")


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
    bad = isnan_any(w_in, 1) | isnan_any(jnp.asarray(a_baseline))

    if pallas_available() and n % 512 == 0:
        pz, trap, emax = fused_energy(w_in, a_baseline, tau, r, f)
    else:
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
