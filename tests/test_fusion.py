"""Engine fusion pass (``ProcessingChain.optimize_fusions``): the energy
front and the threshold cascade fuse automatically — with no config edits —
and stay bit-identical to the unfused chain (VERDICT r1 items 3-4)."""

import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(__file__))

REF_ICPC = "/root/reference/tests/configs/icpc-dsp-config.json"


def _outputs(config, db, n=12, fuse=True, monkeypatch=None):
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu import lh5
    from dspeed_tpu.processing_chain import build_processing_chain

    wf, amp, t0, bl = make_hpge_waveforms(n=n)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    prev = os.environ.get("DSPEED_TPU_FUSE")
    os.environ["DSPEED_TPU_FUSE"] = "1" if fuse else "0"
    try:
        chain, _, _ = build_processing_chain(config, tb, db_dict=db)
    finally:
        if prev is None:
            os.environ.pop("DSPEED_TPU_FUSE", None)
        else:
            os.environ["DSPEED_TPU_FUSE"] = prev
    inputs, _ = chain._gather_inputs(0, chain._buffer_len)
    out = jax.jit(chain._build_fn())(inputs)
    named = {k.split("#")[0]: np.asarray(v) for k, v in out.items()}
    return chain, named


def _assert_bit_identical(a, b):
    assert set(a) == set(b)
    for k in a:
        arr_a, arr_b = a[k], b[k]
        if arr_a.dtype.kind in "fc":
            np.testing.assert_array_equal(
                np.nan_to_num(arr_a, nan=-12345.0),
                np.nan_to_num(arr_b, nan=-12345.0),
                err_msg=k,
            )
        else:
            np.testing.assert_array_equal(arr_a, arr_b, err_msg=k)


def test_flagship_chain_fuses_bit_identically():
    config = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "hpge-energy-timing.yaml",
    )
    db = {"pz": {"tau": 27460.5}}
    chain_f, out_f = _outputs(config, db, fuse=True)
    chain_u, out_u = _outputs(config, db, fuse=False)

    names = [str(s) for s in chain_f._steps]
    assert any("fused_energy_front" in s for s in names), names
    assert any("chained_time_point_thresh" in s for s in names), names
    assert any("fused_conv_bank" in s for s in names), names
    assert len(chain_f._steps) < len(chain_u._steps)
    _assert_bit_identical(out_f, out_u)


@pytest.mark.skipif(
    not os.path.isfile(REF_ICPC), reason="reference icpc config missing"
)
def test_reference_icpc_config_fuses_bit_identically():
    """VERDICT r1 item 4 done-criterion: the reference's UNMODIFIED
    icpc-dsp-config.json takes the fused path and stays bit-identical."""
    from test_build_dsp import DB_FLAT

    chain_f, out_f = _outputs(REF_ICPC, DB_FLAT, fuse=True)
    chain_u, out_u = _outputs(REF_ICPC, DB_FLAT, fuse=False)

    names = [str(s) for s in chain_f._steps]
    assert any("fused_energy_front" in s for s in names), names
    assert any("chained_time_point_thresh" in s for s in names), names
    assert any("fused_current_front" in s for s in names), names
    assert any("fused_t0_front" in s for s in names), names
    assert any("fused_conv_bank" in s for s in names), names
    _assert_bit_identical(out_f, out_u)


def test_blsub_as_chain_output_fuses_and_matches():
    """wf_blsub requested as a chain output: the energy front must emit it
    (the bl_subtract step is deleted; the output manager reads the fused
    kernel's last output) and stay bit-identical to the unfused chain."""
    import yaml

    config = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "hpge-energy-timing.yaml",
    )
    cfg = yaml.safe_load(open(config))
    cfg["outputs"] = ["trapEmax", "wf_blsub", "tp_0_est"]
    db = {"pz": {"tau": 27460.5}}
    chain_f, out_f = _outputs(cfg, db, fuse=True)
    chain_u, out_u = _outputs(cfg, db, fuse=False)
    names = [str(s) for s in chain_f._steps]
    assert not any(s.startswith("bl_subtract") for s in names), names
    assert any("wf_blsub" in s and "fused_energy_front" in s for s in names)
    _assert_bit_identical(out_f, out_u)


def test_conv_bank_merged_path_matches_unfused():
    """The CUSP + ZAC convolutions fuse into one fused_conv_bank step; the
    TPU merged-matmul route (forced via DSPEED_TPU_CONV_BANK=merged) must
    stay within f32 rounding of the unfused chain (the CPU-default split
    route is bit-identical — covered by the flagship test above)."""
    config = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "hpge-energy-timing.yaml",
    )
    db = {"pz": {"tau": 27460.5}}
    chain_u, out_u = _outputs(config, db, fuse=False)
    os.environ["DSPEED_TPU_CONV_BANK"] = "merged"
    try:
        chain_m, out_m = _outputs(config, db, fuse=True)
    finally:
        del os.environ["DSPEED_TPU_CONV_BANK"]
    names = [str(s) for s in chain_m._steps]
    assert sum("fused_conv_bank" in s for s in names) == 1, names
    # wf_cusp/wf_zac and both slice steps must be gone from the step list
    assert not any("fft_convolve_wf" in s for s in names), names
    assert set(out_m) == set(out_u)
    for k in out_m:
        a, b = out_m[k], out_u[k]
        if a.dtype.kind in "fc":
            np.testing.assert_allclose(
                np.nan_to_num(a, nan=-12345.0),
                np.nan_to_num(b, nan=-12345.0),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)


def test_conv_banded_matmul_bank_multiblock_matches_single():
    """_conv_banded_matmul_bank's multi-block reshape (p > blk) must place
    every kernel's columns exactly where the single-kernel matmul does, for
    both 'same' and 'valid' windows."""
    import jax

    from dspeed_tpu.processors.convolutions import (
        _conv_banded_matmul,
        _conv_banded_matmul_bank,
        _mode_window,
    )

    rng = np.random.default_rng(7)
    w = rng.normal(0, 1, (5, 300)).astype("float64")
    kerns = [
        rng.normal(0, 1, 41).astype("float64"),
        rng.normal(0, 1, 41).astype("float64"),
        rng.normal(0, 1, 41).astype("float64"),
    ]
    x64 = jax.config.jax_enable_x64  # arrays demote to f32 in TPU mode
    tol_pair = dict(rtol=1e-12, atol=1e-12) if x64 else dict(rtol=2e-5, atol=2e-5)
    tol_ref = dict(rtol=1e-9, atol=1e-9) if x64 else dict(rtol=5e-5, atol=5e-5)
    for mode in ("s", "v", "f"):
        lo, p = _mode_window(mode, 300, 41)
        # blk=64 forces nblk > 1 for every mode here
        got = _conv_banded_matmul_bank(jax.numpy.asarray(w), kerns, lo, p, blk=64)
        for g, k in zip(got, kerns):
            want = _conv_banded_matmul(jax.numpy.asarray(w), k, lo, p, blk=64)
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(want), err_msg=f"mode {mode}",
                **tol_pair,
            )
            # and against numpy.convolve ground truth
            ref = np.stack(
                [np.convolve(row, k)[lo : lo + p] for row in w]
            )
            np.testing.assert_allclose(
                np.asarray(g), ref, err_msg=f"mode {mode} vs numpy", **tol_ref,
            )


def test_current_front_not_fused_when_intermediate_is_output():
    """``curr_av`` requested as a chain output is read by an output manager,
    so the upsampler -> moving_window_multi -> min_max branch must NOT be
    collapsed into fused_current_front (which only emits the min_max
    scalars)."""
    import yaml

    from test_build_dsp import CONFIG, DB_FLAT, make_hpge_waveforms

    from dspeed_tpu import build_dsp, lh5

    cfg = yaml.safe_load(open(CONFIG))
    cfg["outputs"] = ["A_max", "curr_av"]
    wf, amp, t0, bl = make_hpge_waveforms(n=8)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    from dspeed_tpu.processing_chain import build_processing_chain

    prev = os.environ.get("DSPEED_TPU_FUSE")
    os.environ["DSPEED_TPU_FUSE"] = "1"
    try:
        chain, _, tb_out = build_processing_chain(cfg, tb, db_dict=DB_FLAT)
    finally:
        if prev is None:
            os.environ.pop("DSPEED_TPU_FUSE", None)
        else:
            os.environ["DSPEED_TPU_FUSE"] = prev
    names = [str(s) for s in chain._steps]
    assert not any("fused_current_front" in s for s in names), names
    # and the chain still runs, producing the full-length curr_av
    out = build_dsp(tb, dsp_config=cfg, database=DB_FLAT)
    assert out["curr_av"].nda.shape[-1] == 4784


def test_double_energy_front_fuses_both():
    """Two independent pole-zero branches each carrying const-parameter
    trapezoids + amax: the fixpoint loop in optimize_fusions must fuse BOTH
    fronts, not return after the first substitution (round-2 review
    finding)."""
    amax = {
        "function": "amax",
        "module": "numpy",
        "kwargs": {"signature": "(n),()->()", "types": ["fi->f"]},
    }
    config = {
        "outputs": ["e1", "e2"],
        "processors": {
            "wf_blsub": {
                "function": "bl_subtract",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "baseline", "wf_blsub(unit='ADC')"],
            },
            "wf_pz1": {
                "function": "pole_zero",
                "module": "dspeed_tpu.processors",
                "args": ["wf_blsub", "27460.5", "wf_pz1"],
            },
            "wf_pz2": {
                "function": "pole_zero",
                "module": "dspeed_tpu.processors",
                "args": ["wf_blsub", "14000.0", "wf_pz2"],
            },
            "wf_t1": {
                "function": "trap_norm",
                "module": "dspeed_tpu.processors",
                "args": ["wf_pz1", "10*us", "3*us", "wf_t1"],
            },
            "wf_t2": {
                "function": "trap_norm",
                "module": "dspeed_tpu.processors",
                "args": ["wf_pz2", "4*us", "1*us", "wf_t2"],
            },
            "e1": {**amax, "args": ["wf_t1", 1, "e1"]},
            "e2": {**amax, "args": ["wf_t2", 1, "e2"]},
        },
    }
    chain_f, out_f = _outputs(config, {}, fuse=True)
    chain_u, out_u = _outputs(config, {}, fuse=False)

    names = [str(s) for s in chain_f._steps]
    n_fused = sum("fused_energy_front" in s for s in names)
    assert n_fused == 2, names
    assert not any("pole_zero" in s for s in names), names
    _assert_bit_identical(out_f, out_u)


def test_optimize_fusions_before_output_link_is_safe():
    """optimize_fusions() on a manually built chain (no output buffers
    linked yet) must not prune the whole step list (liveness is seeded from
    output managers; round-2 review finding)."""
    from dspeed_tpu import processors as dp
    from dspeed_tpu.processing_chain import ProcessingChain

    chain = ProcessingChain(buffer_len=4)
    wf = np.cumsum(
        np.random.default_rng(0).normal(1.0, 0.1, (4, 256)).astype("float32"),
        axis=1,
    )
    chain.add_variable("waveform", "float32", (256,), unit="ADC")
    chain.add_variable("baseline", "float32", (), unit="ADC")
    chain.add_processor(
        dp.bl_subtract, "waveform", "baseline", "wf_blsub(unit='ADC')"
    )
    chain.add_processor(dp.pole_zero, "wf_blsub", 27460.5, "wf_pz")
    n_before = len(chain._steps)
    chain.optimize_fusions()
    assert len(chain._steps) == n_before  # nothing silently deleted


def test_fusion_prunes_dead_multiplies():
    config = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "hpge-energy-timing.yaml",
    )
    chain_f, _ = _outputs(config, {"pz": {"tau": 27460.5}}, fuse=True)
    # the 0.99*trapTmax-style threshold expressions are absorbed into the
    # chained kernel; their multiply steps must not survive
    mults = [
        s for s in chain_f._steps
        if "multiply" in str(s) and "trapTmax" in str(s)
    ]
    assert mults == [], [str(s) for s in mults]


def test_nan_mask_threading_bit_identical_with_poisoned_rows():
    """The badrow threading pass (VERDICT r2 item 3) replaces downstream
    whole-array isnan reductions with the fused front's per-event mask; the
    NaN pattern of every output must survive full-row NaN, partial-row NaN
    and NaN-baseline events unchanged vs the unfused chain."""
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu import lh5
    from dspeed_tpu.processing_chain import build_processing_chain

    config = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "hpge-energy-timing.yaml",
    )
    db = {"pz": {"tau": 27460.5}}
    wf, amp, t0, bl = make_hpge_waveforms(n=12)
    wf = wf.copy()
    bl = bl.astype("float32").copy()
    wf[3, :] = np.nan      # fully poisoned event
    wf[5, 100] = np.nan    # single bad sample still poisons the event
    bl[7] = np.nan         # bad baseline poisons via the scalar input

    outs = {}
    for fuse in (True, False):
        tb = lh5.Table(
            {
                "waveform": lh5.WaveformTable(
                    values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
                ),
                "baseline": lh5.Array(bl),
            }
        )
        prev = os.environ.get("DSPEED_TPU_FUSE")
        os.environ["DSPEED_TPU_FUSE"] = "1" if fuse else "0"
        try:
            chain, _, _ = build_processing_chain(config, tb, db_dict=db)
        finally:
            if prev is None:
                os.environ.pop("DSPEED_TPU_FUSE", None)
            else:
                os.environ["DSPEED_TPU_FUSE"] = prev
        if fuse:
            assert any(
                getattr(s, "badrow_key", None) for s in chain._steps
            ), "threading pass did not run"
        inputs, _ = chain._gather_inputs(0, chain._buffer_len)
        out = jax.jit(chain._build_fn())(inputs)
        outs[fuse] = {k.split("#")[0]: np.asarray(v) for k, v in out.items()}

    _assert_bit_identical(outs[True], outs[False])
    # the poisoned events must actually be NaN in scalar outputs
    te = outs[True]["trapEmax"]
    assert np.isnan(te[[3, 5, 7]]).all()
    clean = np.delete(np.arange(12), [3, 5, 7])
    assert np.isfinite(te[clean]).all()


def test_conv_bank_skips_direct_regime_kernels():
    """Two parallel 16-tap convolutions: the router runs these DIRECT, so
    the bank (whose bit-identical CPU path is the banded matmul) must NOT
    fuse them — fused-vs-unfused would differ at f64 rounding (review r3)."""
    config = {
        "outputs": ["c1", "c2"],
        "processors": {
            "k1": {
                "function": "t0_filter",
                "module": "dspeed_tpu.processors",
                "args": ["8", "8", "k1(16, 'f')"],
            },
            "k2": {
                "function": "t0_filter",
                "module": "dspeed_tpu.processors",
                "args": ["12", "4", "k2(16, 'f')"],
            },
            "c1": {
                "function": "convolve_wf",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "k1", "'v'", "c1(len(waveform)-15, 'f')"],
            },
            "c2": {
                "function": "convolve_wf",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "k2", "'v'", "c2(len(waveform)-15, 'f')"],
            },
        },
    }
    chain_f, out_f = _outputs(config, {}, fuse=True)
    chain_u, out_u = _outputs(config, {}, fuse=False)
    names = [str(s) for s in chain_f._steps]
    assert not any("fused_conv_bank" in s for s in names), names
    _assert_bit_identical(out_f, out_u)


# ---------------------------------------------------------------------------
# generic (pattern-free) row-tile fusion — VERDICT r4 item 1


def _outputs_mode(config, db, mode, n=12, interpret=False):
    """Like _outputs but with a DSPEED_TPU_FUSE mode string ("generic")."""
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu import lh5
    from dspeed_tpu.processing_chain import build_processing_chain

    wf, amp, t0, bl = make_hpge_waveforms(n=n)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    prev = os.environ.get("DSPEED_TPU_FUSE")
    prev_i = os.environ.get("DSPEED_TPU_GENERIC_INTERPRET")
    os.environ["DSPEED_TPU_FUSE"] = mode
    if interpret:
        os.environ["DSPEED_TPU_GENERIC_INTERPRET"] = "1"
    try:
        chain, _, _ = build_processing_chain(config, tb, db_dict=db)
        inputs, _ = chain._gather_inputs(0, chain._buffer_len)
        out = jax.jit(chain._build_fn())(inputs)
    finally:
        if prev is None:
            os.environ.pop("DSPEED_TPU_FUSE", None)
        else:
            os.environ["DSPEED_TPU_FUSE"] = prev
        if prev_i is None:
            os.environ.pop("DSPEED_TPU_GENERIC_INTERPRET", None)
        else:
            os.environ["DSPEED_TPU_GENERIC_INTERPRET"] = prev_i
    named = {k.split("#")[0]: np.asarray(v) for k, v in out.items()}
    return chain, named


def _flagship_config():
    return (
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "hpge-energy-timing.yaml",
        ),
        {"pz": {"tau": 27460.5}},
    )


def test_generic_groups_form_on_flagship():
    from dspeed_tpu.processing_chain import GroupStep

    config, db = _flagship_config()
    chain, _ = _outputs_mode(config, db, "generic")
    groups = [s for s in chain._steps if isinstance(s, GroupStep)]
    # r5: with long-tap banded convs tile-safe the flagship generic chain
    # is two big groups split only at the upsampler (in-tile upsampling
    # measured a chain-level loss — see upsampler.py)
    assert len(groups) >= 2, [str(s) for s in chain._steps]
    assert sum(len(g.members) for g in groups) >= 30


def test_cse_collapses_duplicate_trapezoid():
    """The flagship config computes the 10us/3.008us trapezoid of wf_pz
    twice (wf_trap -> trapTmax, wf_etrap -> trapEmax — mirroring the
    reference's icpc config, whose interpreter runs both). Step-level CSE
    aliases the second trap AND its amax (consumer keys are rewritten to
    the canonical plane, so the duplicate reduction becomes structurally
    identical and merges too), bit-identically."""
    config, db = _flagship_config()
    chain, out_c = _outputs(config, db, fuse=True)
    from dspeed_tpu.processing_chain import AliasStep

    aliases = [s for s in chain._steps if isinstance(s, AliasStep)]
    alias_names = {s.dst_key.split("#")[0] for s in aliases}
    assert "trapEmax" in alias_names, [str(s) for s in aliases]
    np.testing.assert_array_equal(out_c["trapEmax"], out_c["trapTmax"])
    _, out_u = _outputs(config, db, fuse=False)
    _assert_bit_identical(out_c, out_u)


def test_generic_group_bisects_on_lowering_failure(monkeypatch):
    """When the whole-group Pallas program fails to lower (Mosaic op gap,
    VMEM geometry), GroupStep bisects the member run and retries each half
    instead of dropping the entire group to XLA — outputs bit-identical
    either way. Simulated by failing generic_rows for bodies above a
    member-count threshold (interpret mode on CPU)."""
    from dspeed_tpu.processing_chain import GroupStep
    from dspeed_tpu.processors import _pallas

    config, db = _flagship_config()
    calls = []
    orig = _pallas.generic_rows

    def flaky(body, vals, core_nd, tile_b=None, interpret=False):
        calls.append(len(vals))
        if len(calls) == 1:  # fail the first (whole-group) attempt
            return None
        return orig(body, vals, core_nd, tile_b=tile_b, interpret=interpret)

    monkeypatch.setattr(_pallas, "generic_rows", flaky)
    chain, out_b = _outputs_mode(config, db, "generic", n=8, interpret=True)
    assert any(isinstance(s, GroupStep) for s in chain._steps)
    assert len(calls) >= 3, calls  # whole group, then >= 2 halves
    monkeypatch.setattr(_pallas, "generic_rows", orig)
    _, out_u = _outputs(config, db, fuse=False, n=8)
    assert set(out_b) == set(out_u)
    # halves regroup the same exactly-banded conv contractions as the whole
    # group (same in-tile routes), so even conv outputs match the full
    # interpret run; vs the unfused chain the conv ULP caveat applies
    x64 = jax.config.jax_enable_x64
    tight = dict(rtol=1e-9, atol=1e-9) if x64 else dict(rtol=5e-5, atol=5e-5)
    f32ulp = dict(rtol=5e-6, atol=5e-6)
    reblocked = {"cuspEmax", "cuspEftp", "zacEmax", "zacEftp"}
    for k in out_u:
        tol = f32ulp if (x64 and k in reblocked) else tight
        np.testing.assert_allclose(
            np.nan_to_num(out_b[k], nan=-12345.0),
            np.nan_to_num(out_u[k], nan=-12345.0),
            err_msg=k, **tol,
        )


def test_generic_mode_bit_identical_to_unfused():
    """The XLA fallback composition is the *same traced graph* as the
    unfused chain — bit-identical even in f32."""
    config, db = _flagship_config()
    _, out_g = _outputs_mode(config, db, "generic")
    _, out_u = _outputs(config, db, fuse=False)
    _assert_bit_identical(out_g, out_u)


def test_generic_interpret_matches_unfused():
    """The Pallas row-tile path (interpret mode on CPU) reproduces the
    unfused chain within f32 tolerance on every output.

    Outputs downstream of a long-tap convolution merged into a row tile
    (CUSP/ZAC: `_tile_blk` shrinks the banded-matmul block to fit the
    tile's VMEM budget) get the f32 bound even under x64: a different
    output-block width regroups the same exactly-banded f32 contraction,
    so the two routes differ at ULP scale — equally exact, not an error
    (the XLA fallback path runs out-of-tile routes and stays bit-identical,
    covered by test_generic_mode_bit_identical_to_unfused)."""
    config, db = _flagship_config()
    _, out_g = _outputs_mode(config, db, "generic", n=8, interpret=True)
    _, out_u = _outputs(config, db, fuse=False, n=8)
    assert set(out_g) == set(out_u)
    x64 = jax.config.jax_enable_x64
    tight = dict(rtol=1e-9, atol=1e-9) if x64 else dict(rtol=5e-5, atol=5e-5)
    f32ulp = dict(rtol=5e-6, atol=5e-6)
    reblocked = {"cuspEmax", "cuspEftp", "zacEmax", "zacEftp"}
    for k in out_u:
        tol = f32ulp if (x64 and k in reblocked) else tight
        np.testing.assert_allclose(
            np.nan_to_num(out_g[k], nan=-12345.0),
            np.nan_to_num(out_u[k], nan=-12345.0),
            err_msg=k, **tol,
        )


def test_generic_runs_after_patterns_by_default():
    """DSPEED_TPU_FUSE=1 runs hand patterns first, then groups leftovers;
    outputs stay bit-identical to the unfused chain."""
    config, db = _flagship_config()
    chain, out_f = _outputs(config, db, fuse=True)
    _, out_u = _outputs(config, db, fuse=False)
    _assert_bit_identical(out_f, out_u)


@pytest.mark.skipif(
    not os.path.isfile(
        "/root/reference/tests/configs/sipm-dplms-config.json"
    ),
    reason="reference tree not available",
)
def test_generic_sipm_dplms_bit_identical():
    """The reference's sipm-dplms config (matches NO hand pattern) under
    generic fusion: groups form and outputs stay bit-identical."""
    import json

    from dspeed_tpu import lh5
    from dspeed_tpu.processing_chain import (
        GroupStep, build_processing_chain,
    )

    with open("/root/reference/tests/configs/sipm-dplms-config.json") as f:
        cfg = json.load(f)
    cfg = json.loads(json.dumps(cfg).replace("dspeed.processors", "dspeed_tpu.processors"))
    # the reference config's second get_multi_local_extrema node is stale —
    # 8 args against the reference's own 10-arg gufunc signature (the
    # reference never builds this config in its tests); fill the two
    # missing search params the way the first node spells them
    gmle_d = cfg["processors"][
        "vt_max_candidate_out_d, vt_min_out_d, n_max_out_d, n_min_out_d"
    ]
    gmle_d["args"] = (
        gmle_d["args"][:2] + [0.1, 1] + gmle_d["args"][2:]
    )
    # ...and its wf_dplms conv declares mode 's' with a 'valid'-sized
    # output (len(wf_diff)-49): the reference's own kernel would raise
    # "Output waveform has length 974; expect 1023" — the intended mode
    # is 'v'
    cfg["processors"]["wf_dplms"]["args"][2] = "'v'"
    rng = np.random.default_rng(5)
    wf = rng.normal(0, 1, (8, 1024)).astype("float32")
    for i in range(8):
        for t0 in rng.uniform(100, 900, 3):
            t = np.arange(1024)
            wf[i] += rng.uniform(20, 80) * np.exp(
                -np.abs(t - t0) / np.where(t > t0, 60, 3)
            )
    db = {
        "dplms": {
            "noise_matrix": (np.eye(50) * 2.0).tolist(),
            "reference": np.exp(-((np.arange(50) - 25.0) ** 2) / 18.0).tolist(),
        }
    }

    def run(mode):
        tb = lh5.Table(
            {
                "waveform": lh5.WaveformTable(
                    values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
                )
            }
        )
        prev = os.environ.get("DSPEED_TPU_FUSE")
        os.environ["DSPEED_TPU_FUSE"] = mode
        try:
            chain, _, _ = build_processing_chain(cfg, tb, db_dict=db)
        finally:
            if prev is None:
                os.environ.pop("DSPEED_TPU_FUSE", None)
            else:
                os.environ["DSPEED_TPU_FUSE"] = prev
        inputs, _ = chain._gather_inputs(0, 8)
        out = jax.jit(chain._build_fn())(inputs)
        return chain, {k.split("#")[0]: np.asarray(v) for k, v in out.items()}

    chain_g, out_g = run("generic")
    _, out_u = run("0")
    groups = [s for s in chain_g._steps if isinstance(s, GroupStep)]
    assert groups, [str(s) for s in chain_g._steps]
    _assert_bit_identical(out_g, out_u)
