"""Regenerate the committed golden chain outputs (``tests/goldens/*.npz``).

The goldens freeze the full flagship HPGe chain and the SiPM pulse-finding
chain on fixed-seed synthetic waveforms, computed in x64 (f64 accumulation)
CPU mode. ``tests/test_goldens.py`` replays both chains against these files
on every run — a regression guard that needs neither the reference tree nor
recomputing a second implementation (VERDICT r2 "what's missing" item 4).

Run after an *intentional* numerics change:

    JAX_PLATFORMS=cpu PYTHONPATH=. python tools/make_goldens.py

and commit the diff together with the change that explains it.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")


def hpge_outputs() -> dict:
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu import build_dsp, lh5

    wf, amp, t0, bl = make_hpge_waveforms(n=32)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    config = os.path.join(REPO, "configs", "hpge-energy-timing.yaml")
    out = build_dsp(tb, dsp_config=config, database={"pz": {"tau": 27460.5}})
    return {k: np.asarray(out[k].nda) for k in out.keys()}


def sipm_outputs() -> dict:
    import bench

    from dspeed_tpu import build_dsp, lh5

    wf = bench._build_sipm_inputs(32)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            )
        }
    )
    config = os.path.join(REPO, "configs", "sipm-pulse-finding.yaml")
    out = build_dsp(tb, dsp_config=config)
    cols = {}
    for k in out.keys():
        col = out[k]
        if hasattr(col, "flattened_data"):  # VectorOfVectors
            cols[f"{k}__flat"] = np.asarray(col.flattened_data)
            cols[f"{k}__cumlen"] = np.asarray(col.cumulative_length)
        else:
            cols[k] = np.asarray(col.nda)
    return cols


def main() -> None:
    import jax

    assert jax.config.jax_enable_x64, (
        "goldens must be generated in x64 mode (run under the test env: "
        "DSPEED_TEST_X64 unset, JAX_PLATFORMS=cpu)"
    )
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, fn in (("hpge_chain", hpge_outputs), ("sipm_chain", sipm_outputs)):
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, **fn())
        print(f"wrote {path}")


if __name__ == "__main__":
    # match the test environment (x64 CPU; accumulation follows x64)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_enable_x64", True)
    main()
