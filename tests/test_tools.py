"""Smoke tests for the checked-in tooling (tools/profile_chain.py).

The TPU fusion-trace mode needs real hardware; the eager per-step mode is
the CPU-honest path and must keep working so perf regressions stay
chaseable (VERDICT r1 item 9).
"""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "profile_chain", os.path.join(REPO, "tools", "profile_chain.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_per_step_profile_runs(capsys):
    tool = _load_tool()
    tool.per_step(n_ev=32, fused=False)
    out = capsys.readouterr().out
    assert "TOTAL" in out
    # the flagship chain's heavy steps should be present in the table
    assert "trap_norm" in out or "fused_energy" in out
    # per-step timings are populated (more than just the header + total)
    assert len([l for l in out.splitlines() if l.strip()]) > 10


def test_per_step_profile_fused_path(capsys):
    tool = _load_tool()
    tool.per_step(n_ev=32, fused=True)
    out = capsys.readouterr().out
    assert "TOTAL" in out
