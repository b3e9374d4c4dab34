"""CLI smoke test via subprocess (reference ``tests/test_cli.py:8-24``)."""

import json
import os
import subprocess
import sys

import numpy as np

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "configs", "hpge-energy-timing.yaml"
)


def test_cli_end_to_end(tmp_path):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu import lh5

    wf, amp, t0, bl = make_hpge_waveforms(n=16)
    raw = str(tmp_path / "run1_raw.lh5")
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    lh5.write(tb, "ch0/raw", raw)
    db = str(tmp_path / "db.json")
    with open(db, "w") as f:
        json.dump({"ch0": {"pz": {"tau": 27460.5}}}, f)

    out = str(tmp_path / "out_dsp.lh5")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "dspeed_tpu.cli", raw, "-c", CONFIG,
         "-D", db, "-o", out, "-p", "trapEmax", "-n", "8"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    dsp = lh5.read("ch0/dsp", out)
    assert len(dsp["trapEmax"].nda) == 8
    np.testing.assert_allclose(dsp["trapEmax"].nda, amp[:8], rtol=1e-2)


def test_cli_version():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "dspeed_tpu.cli", "--version"],
        capture_output=True, text=True, env=env,
    )
    assert res.returncode == 0
