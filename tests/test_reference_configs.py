"""Run the reference's own, unmodified config files through dspeed_tpu.

The module-name aliasing (dspeed.* -> dspeed_tpu.*, with a registry fallback
for per-kernel submodule paths) lets a reference user bring their configs
over untouched; the icpc chain must match our ported YAML bit-for-bit.
"""

import os
import sys

import numpy as np
import pytest

from dspeed_tpu import build_dsp, lh5

REF = "/root/reference/tests/configs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference configs not available"
)

sys.path.insert(0, os.path.dirname(__file__))


def test_reference_icpc_config_bit_parity():
    from test_build_dsp import CONFIG, DB_FLAT, make_hpge_waveforms

    wf, amp, t0, bl = make_hpge_waveforms(n=24)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    out_ref = build_dsp(
        tb, dsp_config=f"{REF}/icpc-dsp-config.json", database=DB_FLAT
    )
    out_mine = build_dsp(tb, dsp_config=CONFIG, database=DB_FLAT)
    assert len(list(out_ref.keys())) == 34
    for k in ("trapEmax", "cuspEmax", "zacEmax", "tp_50", "tp_0_est",
              "A_max", "QDrift", "dt_eff", "bl_std", "trapEftp"):
        a, b = out_ref[k].nda, out_mine[k].nda
        np.testing.assert_array_equal(a, b, err_msg=k)


def test_reference_sipm_config_runs():
    from test_build_dsp import make_sipm_waveforms

    wf, n_pulses = make_sipm_waveforms()
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            )
        }
    )
    out = build_dsp(tb, dsp_config=f"{REF}/sipm-dsp-config.json")
    trig = out["trigger_pos"]
    assert isinstance(trig, lh5.VectorOfVectors)
    found = np.array([len(trig[i]) for i in range(len(trig))])
    assert np.abs(found - n_pulses).mean() < 1.0
    energies = out["energies"]
    assert isinstance(energies, lh5.VectorOfVectors)
    assert all(len(energies[i]) == len(trig[i]) for i in range(len(trig)))


def test_reference_sipm_dplms_config_runs(rng):
    from test_build_dsp import make_sipm_waveforms

    wf, n_pulses = make_sipm_waveforms()
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            )
        }
    )
    # synthetic DPLMS database: noise matrix + reference SPE pulse
    length, ssize = 50, 100
    noise = rng.normal(0, 0.3, (length, 200))
    noise_mat = (noise @ noise.T / 200).tolist()
    t = np.arange(ssize)
    ref_pulse = np.where(
        t >= 40, 40.0 * ((t - 40) / 8.0) * np.exp(-(t - 40) / 8.0), 0.0
    ).tolist()
    db = {"dplms": {"noise_matrix": noise_mat, "reference": ref_pulse}}
    # Much of this config is stale on the reference itself (its wf_dplms
    # node declares a 'same'-mode convolution with a valid-mode length, and
    # its peak finders use a pre-API-change 8-argument
    # get_multi_local_extrema). Exercise what is genuinely runnable: the
    # smoothing/derivative front plus the db-driven DPLMS kernel design.
    import json

    from dspeed_tpu.processing_chain import build_processing_chain

    out = build_dsp(
        tb, dsp_config=f"{REF}/sipm-dplms-config.json", database=db,
        outputs=["curr"],
    )
    curr = out["curr"]
    nda = curr.values.nda if hasattr(curr, "values") else curr.nda
    assert nda.shape[0] == len(wf)

    cfg = json.load(open(f"{REF}/sipm-dplms-config.json"))
    chain, _, _ = build_processing_chain(
        cfg, tb, db_dict=db, outputs=["curr", "dplms_kernel"]
    )
    kern_var = chain._vars_dict["dplms_kernel"]
    assert kern_var.is_const
    k = np.asarray(kern_var.const_value)
    assert k.shape == (50,) and np.all(np.isfinite(k))


def test_reference_vis_config_in_browser(tmp_path):
    """SURVEY.md §7 Milestone A: the reference's 4-processor vis config
    (bl_subtract -> pole_zero -> trap_norm -> amax) through the browser."""
    import matplotlib

    matplotlib.use("Agg")
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu.vis import WaveformBrowser

    path = str(tmp_path / "vis_raw.lh5")
    wf, amp, t0, bl = make_hpge_waveforms(n=16)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    lh5.write(tb, "geds/raw", path)

    wb = WaveformBrowser(
        path,
        "geds/raw",
        dsp_config="/root/reference/tests/vis/configs/hpge-dsp-config.json",
        lines=["wf_blsub", "wf_trap", "trapEmax"],
        legend=["trapEmax"],
    )
    wb.draw_entry([0, 1])
    assert wb.n_stored == 2
    assert len(wb.lines["wf_trap"]) == 2
    hy = wb.lines["trapEmax"][0].get_ydata()
    assert hy[0] == hy[1]  # horizontal line at the energy estimate
