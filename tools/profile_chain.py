"""Per-stage cost profile of the flagship chain — one command reproduces the
cost table in docs/architecture.md.

Modes (pick the right one for the backend):

``--per-step``
    Eager per-step wall times via ``ProcessingChain.execute_profiled``.
    Honest on local backends (CPU); on the tunneled TPU every step pays the
    ~24 ms dispatch round trip, so use ``--fusions`` there instead.

``--fusions`` (default on TPU)
    Runs the jitted chain under ``jax.profiler.trace``, parses the
    ``*.trace.json.gz`` duration events, aggregates device time per XLA
    fusion, and joins each fusion to its ``source_file:source_line`` from
    the compiled HLO metadata. Also prints the TPU cost model's
    ``estimated_cycles`` (~940 MHz on v5e) per fusion when present; the two
    agreed well in round-1 measurements.

Usage::

    # CPU (local):
    JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/profile_chain.py --per-step
    # TPU (axon), from /root/repo so the plugin stays on PYTHONPATH:
    python tools/profile_chain.py --fusions -n 4096
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(n_ev: int, fused: bool):
    from __graft_entry__ import _build_chain

    return _build_chain(n_ev=n_ev, fused=fused)


def per_step(n_ev: int, fused: bool) -> None:
    chain, inputs, tb, tb_out = _build(n_ev, fused)
    chain.execute_profiled(0, n_ev)
    rows = sorted(chain.get_timing().items(), key=lambda kv: -kv[1])
    total = sum(t for _, t in rows)
    print(f"{'step':70s} {'ms':>9s} {'%':>6s}")
    for name, t in rows:
        if t <= 0:
            continue
        print(f"{name[:70]:70s} {1e3 * t:9.2f} {100 * t / total:6.1f}")
    print(f"{'TOTAL':70s} {1e3 * total:9.2f}")


def _hlo_fusion_map(compiled_text: str):
    """fusion name -> (source_file:line, estimated_cycles) from HLO.

    Parsed per line: a single lazy regex with every group optional matches
    zero-width before the fields it is meant to capture (the round-3 source
    column came out blank), so the name, the cycles annotation, and the
    metadata fields are extracted independently.
    """
    info = {}
    name_re = re.compile(r"^\s*(?:ROOT )?%?([\w.-]+) = ")
    cyc_re = re.compile(r"\"estimated_cycles\":(\d+)")
    src_re = re.compile(r"source_file=\"([^\"]+)\"")
    line_re = re.compile(r"source_line=(\d+)")
    op_re = re.compile(r"op_name=\"([^\"]+)\"")
    for text_line in compiled_text.splitlines():
        nm = name_re.match(text_line)
        if nm is None:
            continue
        name = nm.group(1)
        cm, sm, lm = (
            cyc_re.search(text_line),
            src_re.search(text_line),
            line_re.search(text_line),
        )
        src = ""
        if sm and lm:
            src = f"{os.path.basename(sm.group(1))}:{lm.group(1)}"
        else:
            # newer XLA text dumps carry stack_frame_id references instead of
            # inline file:line; the op_name path is the useful join there
            om = op_re.search(text_line)
            if om:
                src = re.sub(r"^jit\([^)]*\)/", "", om.group(1))
        cyc = int(cm.group(1)) if cm else None
        prev = info.get(name)
        if (
            prev is None
            or (src and not prev[0])
            or (cyc is not None and prev[1] is None)
        ):
            info[name] = (
                src or (prev[0] if prev else ""),
                cyc if cyc is not None else (prev[1] if prev else None),
            )
    return info


def fusions(n_ev: int, fused: bool, iters: int = 3) -> None:
    import jax

    chain, inputs, _, _ = _build(n_ev, fused)
    fn = jax.jit(chain._build_fn())
    compiled = fn.lower(inputs).compile()
    hlo_info = _hlo_fusion_map(compiled.as_text())

    out = fn(inputs)
    _ = {k: np.asarray(v) for k, v in out.items()}  # warm + drain compile

    trace_dir = tempfile.mkdtemp(prefix="dspeed_profile_")
    key = sorted(out)[0]
    blk = sorted(k for k in inputs if np.asarray(inputs[k]).ndim == 1)[0]
    with jax.profiler.trace(trace_dir):
        cur = dict(inputs)
        for _i in range(iters):
            out = fn(cur)
            feed = (0.0 * out[key].reshape(-1)[0]).astype(
                np.asarray(inputs[blk]).dtype
            )
            cur = {**inputs, blk: inputs[blk] + feed}
        _ = np.asarray(out[key].reshape(-1)[:1])

    traces = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not traces:
        print("# no trace captured; estimated_cycles table only", file=sys.stderr)
        rows = [
            (name, None, cyc, src)
            for name, (src, cyc) in hlo_info.items()
            if cyc
        ]
        rows.sort(key=lambda r: -(r[2] or 0))
        _print_rows(rows, iters)
        return

    with gzip.open(traces[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pick the pid whose events carry the most total duration
    # among non-host threads (TPU ops land on their own pid)
    by_name: dict[str, float] = collections.defaultdict(float)
    pid_tot: dict = collections.defaultdict(float)
    pid_name: dict = {}
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev:
            pid_tot[ev.get("pid")] += ev["dur"]
        elif ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev.get("pid")] = str(
                ev.get("args", {}).get("name", "")
            )
    dev_pids = [
        p
        for p in pid_tot
        if any(
            tag in pid_name.get(p, "").upper()
            for tag in ("TPU", "/DEVICE", "GPU", "XLA")
        )
    ]
    if not dev_pids:
        print(
            "# no device lane found in trace (host-only capture?); "
            "falling back to the busiest lane — times may include host work",
            file=sys.stderr,
        )
        dev_pids = list(pid_tot)
    dev_pid = max(dev_pids, key=lambda p: pid_tot[p])
    for ev in events:
        if ev.get("ph") == "X" and "dur" in ev and ev.get("pid") == dev_pid:
            name = ev["name"].split(":")[0]
            by_name[name] += ev["dur"]

    rows = []
    for name, dur_us in by_name.items():
        src, cyc = hlo_info.get(name, ("", None))
        rows.append((name, dur_us / 1e3, cyc, src))
    rows.sort(key=lambda r: -(r[1] or 0))
    _print_rows(rows, iters)


def _print_rows(rows, iters):
    print(
        f"{'fusion':44s} {'ms/iter':>9s} {'est_Mcyc':>9s} {'source':40s}"
    )
    total = 0.0
    for name, ms, cyc, src in rows[:40]:
        ms_i = (ms or 0.0) / max(iters, 1)
        total += ms_i
        cyc_s = f"{cyc / 1e6:9.2f}" if cyc else f"{'':>9s}"
        print(f"{name[:44]:44s} {ms_i:9.3f} {cyc_s} {src[:40]:40s}")
    print(f"{'TOTAL (top 40)':44s} {total:9.3f}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--n-ev", type=int, default=None)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--per-step", action="store_true")
    ap.add_argument("--fusions", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    on_accel = jax.default_backend() not in ("cpu",)
    n_ev = args.n_ev or (4096 if on_accel else 256)
    if args.per_step or (not args.fusions and not on_accel):
        per_step(n_ev, args.fused)
    else:
        fusions(n_ev, args.fused, iters=args.iters)


if __name__ == "__main__":
    main()
