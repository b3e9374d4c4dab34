"""Compositional fuzzing of the chain engine.

Randomly composed mini-configs run through ``build_dsp`` and are checked
against directly chaining the same kernels on numpy arrays — exercising the
binder's broadcasting/dtype/unit plumbing across many combinations that no
hand-written test enumerates.
"""

import os

import numpy as np
import pytest

from dspeed_tpu import build_dsp, lh5
from dspeed_tpu import processors as dp


def apply_direct(wf, ops):
    """Reference evaluation: call the kernels directly in sequence."""
    cur = wf
    for op in ops:
        kind = op[0]
        if kind == "blsub":
            (cur,) = dp.bl_subtract(cur, op[1])
        elif kind == "pz":
            (cur,) = dp.pole_zero(cur, op[1])
        elif kind == "trap":
            (cur,) = dp.trap_norm(cur, op[1], op[2])
        elif kind == "mwl":
            (cur,) = dp.moving_window_left(cur, op[1])
        elif kind == "scale":
            cur = np.asarray(cur) * op[1] + op[2]
        elif kind == "slice":
            cur = np.asarray(cur)[:, op[1] : op[2]]
        cur = np.asarray(cur)
    return cur


def build_config(ops, final):
    """The same pipeline as a DSP config graph."""
    procs = {}
    prev = "waveform"
    for i, op in enumerate(ops):
        name = f"st{i}"
        kind = op[0]
        if kind == "blsub":
            procs[name] = {
                "function": "bl_subtract",
                "module": "dspeed_tpu.processors",
                "args": [prev, float(op[1]), name],
                "unit": "ADC",
            }
        elif kind == "pz":
            procs[name] = {
                "function": "pole_zero",
                "module": "dspeed_tpu.processors",
                "args": [prev, float(op[1]), name],
                "unit": "ADC",
            }
        elif kind == "trap":
            procs[name] = {
                "function": "trap_norm",
                "module": "dspeed_tpu.processors",
                "args": [prev, int(op[1]), int(op[2]), name],
                "unit": "ADC",
            }
        elif kind == "mwl":
            procs[name] = {
                "function": "moving_window_left",
                "module": "dspeed_tpu.processors",
                "args": [prev, float(op[1]), name],
                "unit": "ADC",
            }
        elif kind == "scale":
            procs[name] = f"{prev}*{op[1]} + {op[2]}"
        elif kind == "slice":
            procs[name] = f"{prev}[{op[1]}:{op[2]}]"
        prev = name
    procs[f"f_tmin, f_tmax, f_min, {final}"] = {
        "function": "min_max",
        "module": "dspeed_tpu.processors",
        "args": [prev, "f_tmin", "f_tmax", "f_min", final],
        "unit": ["ns", "ns", "ADC", "ADC"],
    }
    return {"outputs": [final, prev], "processors": procs}


def random_pipeline(rng, n_samples):
    ops = []
    length = n_samples
    for _ in range(int(rng.integers(2, 6))):
        kind = rng.choice(["blsub", "pz", "trap", "mwl", "scale", "slice"])
        if kind == "blsub":
            ops.append(("blsub", round(float(rng.uniform(-50, 50)), 3)))
        elif kind == "pz":
            ops.append(("pz", round(float(rng.uniform(200, 5000)), 2)))
        elif kind == "trap":
            rise = int(rng.integers(2, max(3, length // 8)))
            flat = int(rng.integers(1, max(2, length // 8)))
            if 2 * rise + flat >= length:
                continue
            ops.append(("trap", rise, flat))
        elif kind == "mwl":
            ops.append(("mwl", int(rng.integers(2, max(3, length // 6)))))
        elif kind == "scale":
            ops.append(
                ("scale", round(float(rng.uniform(0.5, 2.0)), 3),
                 round(float(rng.uniform(-5, 5)), 3))
            )
        elif kind == "slice":
            if length < 32:
                continue
            a = int(rng.integers(0, length // 4))
            b = int(rng.integers(length // 2, length))
            ops.append(("slice", a, b))
            length = b - a
    return ops


# DSPEED_FUZZ_TRIALS scales the corpus (an extended 200-trial sweep ran
# clean in r5; 8 keeps CI fast)
@pytest.mark.parametrize(
    "trial", range(int(os.getenv("DSPEED_FUZZ_TRIALS", "8")))
)
def test_random_pipelines_match_direct(trial):
    rng = np.random.default_rng(1000 + trial)
    n, nsamp = 6, int(rng.choice([128, 256, 500]))
    wf = np.cumsum(rng.normal(0, 1, (n, nsamp)), axis=1).astype("float64")
    ops = random_pipeline(rng, nsamp)

    tbl = lh5.Table(
        {"waveform": lh5.WaveformTable(values=wf, dt=16, dt_units="ns")}
    )
    config = build_config(ops, "f_max")
    out = build_dsp(tbl, dsp_config=config)

    exp = apply_direct(wf, ops)
    np.testing.assert_allclose(
        out["f_max"].nda, np.max(exp, axis=-1), rtol=1e-6, atol=1e-6,
        err_msg=f"pipeline {ops}",
    )
    last = out[config["outputs"][1]]
    nda = last.values.nda if hasattr(last, "values") else last.nda
    np.testing.assert_allclose(
        nda, exp, rtol=1e-6, atol=1e-6, err_msg=f"pipeline {ops}"
    )

    # every random pipeline must be bit-identical with the fusion pass off
    # (whatever subset of matchers fired on this composition)
    import os

    prev_env = os.environ.get("DSPEED_TPU_FUSE")
    os.environ["DSPEED_TPU_FUSE"] = "0"
    try:
        out_u = build_dsp(tbl, dsp_config=config)
    finally:
        if prev_env is None:
            os.environ.pop("DSPEED_TPU_FUSE", None)
        else:
            os.environ["DSPEED_TPU_FUSE"] = prev_env
    for col in out.keys():
        a = out[col]
        b = out_u[col]
        a = a.values.nda if hasattr(a, "values") else a.nda
        b = b.values.nda if hasattr(b, "values") else b.nda
        np.testing.assert_array_equal(
            np.nan_to_num(a, nan=-12345.0),
            np.nan_to_num(b, nan=-12345.0),
            err_msg=f"fused != unfused for {col}: {ops}",
        )
