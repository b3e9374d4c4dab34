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


def _write_raw(tmp_path, n=16):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu import lh5

    wf, amp, t0, bl = make_hpge_waveforms(n=n)
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
    return raw, db, amp


def _env():
    return dict(os.environ, JAX_PLATFORMS="cpu",
                PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))


def _cli(args, **kw):
    return subprocess.run(
        [sys.executable, "-m", "dspeed_tpu.cli", *args],
        capture_output=True, text=True, env=_env(), timeout=600, **kw,
    )


def test_cli_default_overwrite_and_api_refusal(tmp_path):
    """The CLI defaults to overwrite (reference ``cli.py:129``); the bare
    ``build_dsp`` API with ``write_mode=None`` refuses an existing file."""
    import pytest

    from dspeed_tpu import build_dsp, lh5

    raw, db, _ = _write_raw(tmp_path)
    out = str(tmp_path / "out_dsp.lh5")
    res = _cli([raw, "-c", CONFIG, "-D", db, "-o", out, "-p", "trapEmax"])
    assert res.returncode == 0, res.stderr[-2000:]
    res2 = _cli([raw, "-c", CONFIG, "-D", db, "-o", out, "-p", "trapEmax"])
    assert res2.returncode == 0, res2.stderr[-2000:]

    with pytest.raises(FileExistsError):
        build_dsp(raw, out, CONFIG, database=json.load(open(db)))


def test_cli_overwrite_and_update(tmp_path):
    from dspeed_tpu import lh5

    raw, db, amp = _write_raw(tmp_path)
    out = str(tmp_path / "out_dsp.lh5")
    res = _cli([raw, "-c", CONFIG, "-D", db, "-o", out, "-p", "trapEmax", "bl_mean"])
    assert res.returncode == 0, res.stderr[-2000:]
    # -w overwrites cleanly
    res = _cli([raw, "-c", CONFIG, "-D", db, "-o", out, "-w", "-p", "trapEmax", "bl_mean"])
    assert res.returncode == 0, res.stderr[-2000:]
    dsp = lh5.read("ch0/dsp", out)
    np.testing.assert_allclose(dsp["trapEmax"].nda, amp, rtol=1e-2)


def test_cli_group_wildcard(tmp_path):
    raw, db, amp = _write_raw(tmp_path)
    out = str(tmp_path / "wild_dsp.lh5")
    res = _cli([raw, "-c", CONFIG, "-D", db, "-o", out, "-g", "ch*", "-p", "trapEmax"])
    assert res.returncode == 0, res.stderr[-2000:]
    from dspeed_tpu import lh5

    dsp = lh5.read("ch0/dsp", out)
    np.testing.assert_allclose(dsp["trapEmax"].nda, amp, rtol=1e-2)


def test_cli_bad_config_errors(tmp_path):
    raw, db, _ = _write_raw(tmp_path)
    bad = str(tmp_path / "bad.yaml")
    with open(bad, "w") as f:
        f.write("outputs: [nope]\nprocessors: {}\n")
    res = _cli([raw, "-c", bad, "-o", str(tmp_path / "x_dsp.lh5")])
    # unknown output must not silently succeed with data
    assert res.returncode != 0 or "nope" in (res.stderr + res.stdout)
