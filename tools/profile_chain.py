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


def _build(n_ev: int, fused: bool, sipm: bool = False):
    if sipm:
        # BASELINE config 3: the scan-heavy SiPM pulse-finding chain
        from bench import _build_sipm_chain

        chain, inputs = _build_sipm_chain(n_ev)
        return chain, inputs, None, None
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


_SHAPE_RE = re.compile(
    r"\b(pred|s8|u8|s16|u16|s32|u32|s64|u64|f16|bf16|f32|f64|c64|c128)"
    r"\[([0-9,]*)\]"
)
_DT_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "s32": 4, "u32": 4,
    "s64": 8, "u64": 8, "f16": 2, "bf16": 2, "f32": 4, "f64": 8, "c64": 8,
    "c128": 16,
}


def _shape_bytes(seg: str) -> int:
    """Total bytes of every shape token in an HLO type segment."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(seg):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


def _split_type_rest(rhs: str):
    """(type segment, rest) of an HLO def right-hand side — the type is
    either a balanced-paren tuple (layout annotations nest parens) or the
    leading whitespace-free token."""
    if rhs.startswith("("):
        depth = 0
        for i, ch in enumerate(rhs):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return rhs[: i + 1], rhs[i + 1 :]
        return rhs, ""
    parts = rhs.split(" ", 1)
    return parts[0], parts[1] if len(parts) > 1 else ""


def _hlo_fusion_map(compiled_text: str):
    """fusion name -> (source_file:line, estimated_cycles, hbm_bytes).

    ``hbm_bytes`` = result bytes + the result bytes of every %operand
    (resolved through a first-pass name -> result-size map): for Pallas
    custom calls this is exactly the kernel's HBM traffic; for XLA fusions
    it is the materialized traffic (an operand re-read inside the fusion
    is not double-counted — XLA streams each input once per element).

    Parsed per line: a single lazy regex with every group optional matches
    zero-width before the fields it is meant to capture (the round-3 source
    column came out blank), so the name, the cycles annotation, and the
    metadata fields are extracted independently.
    """
    name_re = re.compile(r"^\s*(?:ROOT )?%?([\w.-]+) = ")
    cyc_re = re.compile(r"\"estimated_cycles\":(\d+)")
    src_re = re.compile(r"source_file=\"([^\"]+)\"")
    line_re = re.compile(r"source_line=(\d+)")
    op_re = re.compile(r"op_name=\"([^\"]+)\"")
    opnd_re = re.compile(r"%([\w.-]+)")
    result_bytes: dict[str, int] = {}
    defs = []  # (name, line, type segment, operand segment)
    for text_line in compiled_text.splitlines():
        nm = name_re.match(text_line)
        if nm is None:
            continue
        name = nm.group(1)
        rhs = text_line[nm.end():]
        typ, rest = _split_type_rest(rhs)
        rb = _shape_bytes(typ)
        # the operand list is the first top-level (...) after the opcode;
        # cut at "), " kwargs to keep metadata %refs out
        args_seg = ""
        p = rest.find("(")
        if p >= 0:
            depth = 0
            for i in range(p, len(rest)):
                if rest[i] == "(":
                    depth += 1
                elif rest[i] == ")":
                    depth -= 1
                    if depth == 0:
                        args_seg = rest[p : i + 1]
                        break
        # inner fusion computations redefine parameter names; keep the
        # LARGEST definition per name (the entry-computation arrays)
        if rb > result_bytes.get(name, -1):
            result_bytes[name] = rb
            defs.append((name, text_line, typ, args_seg))
    info = {}
    for name, text_line, typ, args_seg in defs:
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
        hbm = result_bytes.get(name, 0) + sum(
            result_bytes.get(op, 0) for op in opnd_re.findall(args_seg)
        )
        prev = info.get(name)
        if (
            prev is None
            or (src and not prev[0])
            or (cyc is not None and prev[1] is None)
        ):
            info[name] = (
                src or (prev[0] if prev else ""),
                cyc if cyc is not None else (prev[1] if prev else None),
                hbm,
            )
    return info


def fusions(n_ev: int, fused: bool, iters: int = 3, sipm: bool = False) -> None:
    import jax

    chain, inputs, _, _ = _build(n_ev, fused, sipm=sipm)
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
            (name, None, cyc, src, hbm)
            for name, (src, cyc, hbm) in hlo_info.items()
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
        src, cyc, hbm = hlo_info.get(name, ("", None, 0))
        rows.append((name, dur_us / 1e3, cyc, src, hbm))
    rows.sort(key=lambda r: -(r[1] or 0))
    _print_rows(rows, iters)


def _print_rows(rows, iters):
    # roofline columns: hbm_MB from the HLO operand/result shapes, and the
    # achieved GB/s at the measured device time — compare against the
    # chip's spec HBM bandwidth (v5e ~819 GB/s) to see which fusions are
    # bandwidth-bound (GB/s near spec) vs compute/serial-dependency-bound
    # (GB/s far below; the big Pallas kernels land here, see
    # docs/architecture.md's roofline table)
    print(
        f"{'fusion':44s} {'ms/iter':>8s} {'hbm_MB':>8s} {'GB/s':>7s} "
        f"{'est_Mcyc':>9s} {'source':36s}"
    )
    total = 0.0
    total_mb = 0.0
    for name, ms, cyc, src, hbm in rows[:40]:
        ms_i = (ms or 0.0) / max(iters, 1)
        total += ms_i
        mb = (hbm or 0) / 1e6
        total_mb += mb
        gbps = f"{mb / ms_i:7.0f}" if ms_i > 0 and mb else f"{'':>7s}"
        cyc_s = f"{cyc / 1e6:9.2f}" if cyc else f"{'':>9s}"
        print(
            f"{name[:44]:44s} {ms_i:8.3f} {mb:8.1f} {gbps} {cyc_s} "
            f"{src[:36]:36s}"
        )
    print(f"{'TOTAL (top 40)':44s} {total:8.3f} {total_mb:8.1f}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--n-ev", type=int, default=None)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--per-step", action="store_true")
    ap.add_argument("--fusions", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sipm", action="store_true",
                    help="profile the SiPM pulse-finding chain instead")
    args = ap.parse_args()

    import jax

    on_accel = jax.default_backend() not in ("cpu",)
    n_ev = args.n_ev or (4096 if on_accel else 256)
    if args.per_step or (not args.fusions and not on_accel):
        per_step(n_ev, args.fused)
    else:
        fusions(n_ev, args.fused, iters=args.iters, sipm=args.sipm)


if __name__ == "__main__":
    main()
