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


def test_hlo_fusion_map_labels():
    """The HLO join must attribute instructions to a source label on BOTH
    metadata formats: inline source_file/source_line (TPU dumps) and
    op_name + stack_frame_id (newer CPU dumps). A zero-width-matching regex
    regression here silently blanks the profiler's source column."""
    tool = _load_tool()
    inline = (
        '  %fusion.7 = f32[16384]{0} fusion(%p0), kind=kLoop, '
        'backend_config={"estimated_cycles":123456}, '
        'metadata={op_name="jit(chain_fn)/reduce_min" '
        'source_file="/repo/dspeed_tpu/processors/tp_chain.py" '
        'source_line=102}'
    )
    frame = (
        '  %and_or_fusion.9 = pred[16384,4096]{1,0} fusion(%p1), '
        'kind=kLoop, metadata={op_name="jit(chain_fn)/jit(_where)/and" '
        'stack_frame_id=310}'
    )
    info = tool._hlo_fusion_map(inline + "\n" + frame)
    src, cyc, hbm = info["fusion.7"]
    assert (src, cyc) == ("tp_chain.py:102", 123456)
    assert hbm == 16384 * 4  # result; the %p0 operand is undefined here
    assert info["and_or_fusion.9"][0] == "jit(_where)/and"


def test_hlo_fusion_map_on_real_lowering():
    """End-to-end: most instructions of a real compiled chain get a label."""
    import jax

    tool = _load_tool()
    chain, inputs, _, _ = tool._build(32, True)
    txt = jax.jit(chain._build_fn()).lower(inputs).compile().as_text()
    info = tool._hlo_fusion_map(txt)
    labeled = sum(1 for src, _, _ in info.values() if src)
    assert labeled > len(info) * 0.3, (labeled, len(info))
    # the roofline column: every instruction carries result bytes; big
    # fusions must see their operands' sizes too
    assert all(hbm >= 0 for _, _, hbm in info.values())
    assert max(hbm for _, _, hbm in info.values()) > 1e6
