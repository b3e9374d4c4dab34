"""Interpret-mode correctness tests for the Pallas TPU kernels
(real-hardware performance is exercised by bench.py on the TPU runner)."""

import numpy as np
import pytest

def test_fused_energy_interpret_matches_oracle():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu.processors._pallas import fused_energy

    wf, amp, t0, bl = make_hpge_waveforms(n=16)
    tau, rise, flat = 27460.5, 625, 188
    pz, trap, emax = fused_energy(wf, bl, tau, rise, flat, interpret=True)

    w = wf.astype("f8") - bl[:, None]
    omc = -np.expm1(-1.0 / tau)
    S = np.cumsum(w, 1)
    pz_exp = w + omc * (S - w)
    Spz = np.cumsum(pz_exp, 1)

    def sh(k):
        out = np.zeros_like(Spz)
        out[:, k:] = Spz[:, : Spz.shape[1] - k]
        return out

    trap_exp = (Spz - sh(rise) - sh(rise + flat) + sh(2 * rise + flat)) / rise
    np.testing.assert_allclose(
        np.asarray(emax), trap_exp.max(1), rtol=2e-6
    )
    np.testing.assert_allclose(np.asarray(pz), pz_exp, atol=2e-3)
    np.testing.assert_allclose(np.asarray(trap), trap_exp, atol=5e-2)


def test_fused_energy_filter_fallback_matches_unfused(rng):
    from dspeed_tpu import processors as dp

    wf = np.cumsum(rng.normal(0, 5, (4, 1024)), 1).astype("float32") + 1000
    bl = np.full(4, 1000.0, "float32")
    pz, trap, emax = dp.fused_energy_filter(wf, bl, 5000.0, 100, 30)
    (blsub,) = dp.bl_subtract(wf, bl)
    (pz_ref,) = dp.pole_zero(np.asarray(blsub), 5000.0)
    (trap_ref,) = dp.trap_norm(np.asarray(pz_ref), 100, 30)
    np.testing.assert_allclose(
        np.asarray(pz), np.asarray(pz_ref), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(emax), np.asarray(trap_ref).max(-1), rtol=1e-5
    )


def test_fused_energy_multitrap_interpret_matches_oracle():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu.processors._pallas import fused_energy

    wf, amp, t0, bl = make_hpge_waveforms(n=16)
    tau = 27460.5
    specs = (("norm", 625, 188), ("asym", 8, 4, 125), ("norm", 250, 6))
    pz, traps, emax = fused_energy(
        wf, bl, tau, trap_specs=specs, interpret=True
    )
    assert len(traps) == 3

    w = wf.astype("f8") - bl[:, None]
    omc = -np.expm1(-1.0 / tau)
    S = np.cumsum(w, 1)
    pz_exp = w + omc * (S - w)
    Spz = np.cumsum(pz_exp, 1)

    def sh(k):
        out = np.zeros_like(Spz)
        out[:, k:] = Spz[:, : Spz.shape[1] - k]
        return out

    exp0 = (Spz - sh(625) - sh(625 + 188) + sh(2 * 625 + 188)) / 625
    exp1 = (Spz - sh(8)) / 8 - (sh(8 + 4) - sh(8 + 4 + 125)) / 125
    exp2 = (Spz - sh(250) - sh(250 + 6) + sh(2 * 250 + 6)) / 250
    np.testing.assert_allclose(np.asarray(emax), exp0.max(1), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(traps[0]), exp0, rtol=0, atol=5e-2)
    # long-window sections via Spz differences carry eps*|Spz|/L absolute
    # error (~0.06-0.15 ADC here); at the trap's crossing slope
    # (~amp/rise ~ 375 ADC/sample) that shifts thresholds by < 1e-3 samples
    np.testing.assert_allclose(np.asarray(traps[1]), exp1, rtol=0, atol=2.5e-1)
    np.testing.assert_allclose(np.asarray(traps[2]), exp2, rtol=0, atol=2.5e-1)


def test_fused_energy_front_fallback_matches_unfused(rng):
    from dspeed_tpu import processors as dp

    wf = np.cumsum(rng.normal(0, 5, (4, 1024)), 1).astype("float32") + 1000
    bl = np.full(4, 1000.0, "float32")
    kern = dp.fused_energy_front(
        5000.0, [("norm", 100, 30), ("asym", 8, 4, 60)]
    )
    pz, t0_, t1, emax = kern(wf, bl)
    (blsub,) = dp.bl_subtract(wf, bl)
    (pz_ref,) = dp.pole_zero(np.asarray(blsub), 5000.0)
    (t0_ref,) = dp.trap_norm(np.asarray(pz_ref), 100, 30)
    (t1_ref,) = dp.asym_trap_filter(np.asarray(pz_ref), 8, 4, 60)
    np.testing.assert_array_equal(np.asarray(pz), np.asarray(pz_ref))
    np.testing.assert_array_equal(np.asarray(t0_), np.asarray(t0_ref))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1_ref))
    np.testing.assert_array_equal(
        np.asarray(emax), np.asarray(t0_ref).max(-1)
    )
