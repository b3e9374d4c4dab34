"""Golden-chain oracle: run the flagship icpc config with the *reference's*
kernel math, step by step, and compare every output column.

The engine (arg resolution, units, grids, const folding) is dspeed_tpu's in
both passes; the kernel bodies in the oracle pass are the reference's actual
Python implementations (loaded unmodified via the numba stub). This catches
kernel-math divergence on the real production config end-to-end — the half
of cross-implementation parity that per-kernel tests can't see (windows,
cascaded thresholds, unit-resolved arguments).

Reference engine loop analog: ``/root/reference/src/dspeed/processing_chain.py``
(ProcessorManager + numba kernels); kernel bodies:
``/root/reference/src/dspeed/processors/*.py``.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

from .stubs import load_ref_processors

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_CONFIG = "/root/reference/tests/configs/icpc-dsp-config.json"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(REF_CONFIG), reason="reference icpc config missing"
)


def _build(n_ev=16):
    from test_build_dsp import DB_FLAT, make_hpge_waveforms

    from dspeed_tpu import lh5
    from dspeed_tpu.processing_chain import build_processing_chain


    wf, amp, t0, bl = make_hpge_waveforms(n=n_ev)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    # keep the unfused per-kernel steps: the oracle pass substitutes the
    # reference body into each one (the fusion pass's own bit-identity is
    # covered by tests/test_fusion.py)
    prev = os.environ.get("DSPEED_TPU_FUSE")
    os.environ["DSPEED_TPU_FUSE"] = "0"
    try:
        chain, _, tb_out = build_processing_chain(
            REF_CONFIG, tb, db_dict=DB_FLAT
        )
    finally:
        if prev is None:
            os.environ.pop("DSPEED_TPU_FUSE", None)
        else:
            os.environ["DSPEED_TPU_FUSE"] = prev
    return chain, tb_out


def _out_keys(chain):
    return sorted(
        {k for man in chain._output_managers.values() for k in man.out_keys()}
    )


def _const_env(chain):
    return {
        var.key: var.const_value
        for var in chain._vars_dict.values()
        if var.is_const and var.const_value is not None
    }


def _run_both_passes(chain, min_substituted):
    """Run the chain eagerly twice: our kernels, then reference kernel
    bodies substituted into every KernelStep whose name the reference
    registry knows (outputs interleaved at their config positions)."""
    from dspeed_tpu.processing_chain import KernelStep, ProcChainVar

    refp = load_ref_processors()
    _out_keys(chain)  # materializes the lazy output ConvertSteps
    inputs, _n = chain._gather_inputs(0, chain._buffer_len)

    env_mine = dict(inputs)
    env_mine.update(_const_env(chain))
    for step in chain._steps:
        step.run(env_mine)
    env_mine = {k: np.asarray(v) for k, v in env_mine.items()}

    env_ref = dict(inputs)
    env_ref.update(_const_env(chain))
    substituted = []
    for step in chain._steps:
        name = getattr(getattr(step, "kernel", None), "__name__", None)
        if not (isinstance(step, KernelStep) and hasattr(refp, name or "")):
            step.run(env_ref)
            continue
        rfn = getattr(refp, name)
        ins = iter(
            np.asarray(step._fetch(s, env_ref)) for s in step.arg_specs
        )
        outs = []
        for spec in step.out_specs:
            shape = env_mine[spec.key].shape
            dt = np.dtype(spec.dtype)
            outs.append(
                np.full(shape, np.nan if dt.kind == "f" else 0, dtype=dt)
            )
        out_iter = iter(outs)
        out_vars = {id(spec.var) for spec in step.out_specs}
        call, flags = [], []
        for p in step.params:
            if isinstance(p, ProcChainVar) and id(p) in out_vars:
                call.append(next(out_iter))
                flags.append(True)
            else:
                call.append(next(ins))
                flags.append(False)
        for v in out_iter:  # any non-interleaved leftovers
            call.append(v)
            flags.append(True)
        for v in ins:
            call.append(v)
            flags.append(False)

        # drive the raw reference body per event (the wrapper scalar-indexes
        # no-arrow outputs, and numba's machinery it stands in for hands the
        # body writable 0-d views instead); copy array inputs — some bodies
        # mutate them in place (fft_convolve_wf zeroes NaN rows)
        slot_dims = list(rfn.in_dims) + list(rfn.out_dims)
        nb = outs[0].shape[0]
        for i in range(nb):
            ev_args = []
            for v, is_out, core in zip(call, flags, slot_dims):
                nc = len(core)
                if is_out:
                    ev_args.append(v[i] if nc > 0 else v[i : i + 1])
                else:
                    v = np.asarray(v)
                    if v.ndim > nc and v.shape[0] == nb:
                        v = v[i]
                    ev_args.append(np.array(v) if nc > 0 else v[()])
            rfn.ufunc(*ev_args)
        for spec, o in zip(step.out_specs, outs):
            env_ref[spec.key] = o
        substituted.append(name)
    env_ref = {k: np.asarray(v) for k, v in env_ref.items()}

    # the oracle pass must actually exercise the reference's math
    assert len(substituted) >= min_substituted, substituted
    return env_mine, env_ref


def test_icpc_chain_vs_reference_kernels():
    chain, _ = _build()
    out_keys = _out_keys(chain)
    env_mine, env_ref = _run_both_passes(chain, min_substituted=15)

    mismatches = []
    for k in out_keys:
        a, b = env_mine[k], env_ref[k]
        if a.dtype.kind not in "fc":
            ok = np.array_equal(a, b)
        else:
            a64, b64 = a.astype(np.float64), b.astype(np.float64)
            scale = np.nanmax(np.abs(b64)) or 1.0
            # f32 chain vs f32 reference bodies with different accumulation
            # orders: 1e-4 relative-to-column-scale separates semantics bugs
            # from rounding; time points additionally get one-sample slack
            atol = 1e-4 * scale + 1e-9
            rtol = 1e-4
            if k.startswith("tp_") or k in ("t_sat_lo", "t_sat_hi"):
                atol = max(atol, 16.001)
            if k.startswith(("pz_slope", "pz_std", "pz_intercept")):
                # the oracle's pole_zero body accumulates sequentially in
                # f32 (pole_zero.py:29): its rounding drifts ~eps*amp over
                # the 2596-sample tail, which the slope fit reads directly
                # (drift/window ≈ 1.2e-7*15000/2596 ≈ 7e-7/sample * samples);
                # our kernel accumulates at f64, so these noise statistics
                # differ by the oracle's own error, not by semantics
                atol = max(atol, 2e-4)
                rtol = 5e-3
            ok = np.allclose(a64, b64, rtol=rtol, atol=atol, equal_nan=True)
        if not ok:
            mismatches.append((k, a, b))

    assert not mismatches, "\n".join(
        f"{k}:\n  mine={a.reshape(-1)[:6]}\n  ref ={b.reshape(-1)[:6]}"
        for k, a, b in mismatches
    )


SIPM_CONFIG = "/root/reference/tests/configs/sipm-dsp-config.json"


@pytest.mark.skipif(
    not os.path.isfile(SIPM_CONFIG), reason="reference sipm config missing"
)
def test_sipm_chain_vs_reference_kernels():
    """SiPM pulse-finding cascade (reflected conv -> current -> histogram ->
    extrema -> SNR threshold -> amplitudes) against the reference bodies."""
    from test_build_dsp import make_sipm_waveforms

    from dspeed_tpu import lh5
    from dspeed_tpu.processing_chain import build_processing_chain

    wf, _n_pulses = make_sipm_waveforms()
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            )
        }
    )
    # keep the unfused per-kernel steps: since r5 the generic row-tile pass
    # groups [reflected_convolve_wf, avg_current] here by default, which
    # would hide them from the per-step oracle substitution (the fusion
    # pass's own bit-identity is covered by tests/test_fusion.py)
    prev = os.environ.get("DSPEED_TPU_FUSE")
    os.environ["DSPEED_TPU_FUSE"] = "0"
    try:
        chain, _, _ = build_processing_chain(SIPM_CONFIG, tb)
    finally:
        if prev is None:
            os.environ.pop("DSPEED_TPU_FUSE", None)
        else:
            os.environ["DSPEED_TPU_FUSE"] = prev
    env_mine, env_ref = _run_both_passes(chain, min_substituted=7)

    for k in _out_keys(chain):
        a, b = env_mine[k], env_ref[k]
        if a.dtype.kind not in "fc":
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            np.testing.assert_allclose(
                a.astype(np.float64),
                b.astype(np.float64),
                rtol=1e-4,
                atol=1e-4,
                equal_nan=True,
                err_msg=k,
            )
