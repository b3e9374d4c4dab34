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


def _build(n_ev: int, fused: bool, sipm: bool = False, dplms: bool = False):
    if sipm:
        # BASELINE config 3: the scan-heavy SiPM pulse-finding chain
        from bench import _build_sipm_chain

        chain, inputs = _build_sipm_chain(n_ev)
        return chain, inputs, None, None
    if dplms:
        chain, inputs = _build_dplms_chain(n_ev)
        return chain, inputs, None, None
    from __graft_entry__ import _build_chain

    return _build_chain(n_ev=n_ev, fused=fused)


def _build_dplms_chain(n_ev: int):
    """The reference's own sipm-dplms config (no hand pattern matches it)
    with its two stale nodes repaired the way the test suite does
    (tests/test_fusion.py::test_generic_sipm_dplms_bit_identical)."""
    import json

    import numpy as np

    from dspeed_tpu import lh5
    from dspeed_tpu.processing_chain import build_processing_chain

    ref = "/root/reference/tests/configs/sipm-dplms-config.json"
    if not os.path.isfile(ref):
        raise SystemExit("--dplms needs the reference tree at /root/reference")
    with open(ref) as f:
        cfg = json.load(f)
    cfg = json.loads(
        json.dumps(cfg).replace("dspeed.processors", "dspeed_tpu.processors")
    )
    g = cfg["processors"][
        "vt_max_candidate_out_d, vt_min_out_d, n_max_out_d, n_min_out_d"
    ]
    g["args"] = g["args"][:2] + [0.1, 1] + g["args"][2:]
    cfg["processors"]["wf_dplms"]["args"][2] = "'v'"
    db = {
        "dplms": {
            "noise_matrix": (np.eye(50) * 2.0).tolist(),
            "reference": np.exp(
                -((np.arange(50) - 25.0) ** 2) / 18.0
            ).tolist(),
        }
    }
    rng = np.random.default_rng(5)
    wf = rng.normal(0, 1, (n_ev, 1024)).astype("float32")
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            )
        }
    )
    chain, _, _ = build_processing_chain(cfg, tb, db_dict=db)
    inputs, _ = chain._gather_inputs(0, n_ev)
    return chain, inputs


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


def fusions(n_ev: int, fused: bool, iters: int = 3, sipm: bool = False,
            dplms: bool = False) -> None:
    import jax

    chain, inputs, _, _ = _build(n_ev, fused, sipm=sipm, dplms=dplms)
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
    return {
        name: (ms or 0.0) / max(iters, 1) for name, ms, _c, _s, _h in rows
    }


def _print_rows(rows, iters):
    # roofline columns: hbm_MB from the HLO operand/result shapes, and the
    # achieved GB/s at the measured device time — compare against the
    # chip's spec HBM bandwidth (v5e ~819 GB/s) to see which fusions are
    # bandwidth-bound (GB/s near spec) vs compute/serial-dependency-bound
    # (GB/s far below; the big Pallas kernels land here, see
    # docs/architecture.md's roofline table)
    # cyc% = XLA cost model's estimated_cycles at ~940 MHz over measured
    # time — the compiler's own "how fast should this fusion be" check
    # (only meaningful for XLA fusions; Pallas custom calls have no cost
    # model and get their floors from ``--floors`` instead)
    print(
        f"{'fusion':44s} {'ms/iter':>8s} {'hbm_MB':>8s} {'GB/s':>7s} "
        f"{'est_Mcyc':>9s} {'cyc%':>5s} {'source':36s}"
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
        est_ms = (cyc / V5E_HZ * 1e3) if cyc else None
        eff = (
            f"{100 * est_ms / ms_i:5.0f}"
            if est_ms and ms_i > 0
            else f"{'':>5s}"
        )
        print(
            f"{name[:44]:44s} {ms_i:8.3f} {mb:8.1f} {gbps} {cyc_s} {eff} "
            f"{src[:36]:36s}"
        )
    print(f"{'TOTAL (top 40)':44s} {total:8.3f} {total_mb:8.1f}")


# ---------------------------------------------------------------------------
# op-count floors (``--floors``): measured ms vs a hand-countable lower bound
#
# Each step's math is re-traced with ``DSPEED_TPU_PALLAS=0`` — the XLA
# fallback branches implement the *same formulas* the Pallas kernels do
# (same prefix matmuls under blocked accumulation, same window algebra) —
# and the jaxpr is walked to tally VPU element-ops and MXU MACs. The floor
# is then ``max(vpu_ms, mxu_ms, hbm_ms)``: VPU, MXU and HBM engines overlap
# on the TensorCore, so a kernel cannot beat its slowest engine at 100%
# utilization with zero dependency stalls. Real kernels have serial
# dependencies, odd shapes and layout moves, so eff% < 100 always; what the
# column buys is a *quantitative* answer to "is X ms fast for this math?".
#
# v5e engine rates (spec; dispatch/HBM measured in BENCH curves):
#   VPU   8 sublanes x 128 lanes @ ~940 MHz = 0.963e12 f32 lane-ops/s
#   MXU   197 TFLOPS bf16 = 98.5e12 MAC/s; f32 HIGHEST = 6 bf16 passes
#   HBM   819 GB/s
# ---------------------------------------------------------------------------

V5E_VPU_OPS = 0.963e12
V5E_MXU_BF16 = 98.5e12
V5E_HIGHEST_MULT = 6.0
V5E_HBM = 819e9
V5E_HZ = 0.94e9

_VPU_ELEM = frozenset(
    """add sub mul div rem pow max min and or xor not neg abs sign
    select_n clamp eq ne lt le gt ge floor ceil round convert_element_type
    integer_pow exp exp2 log log1p expm1 tanh logistic sqrt rsqrt cbrt erf
    erf_inv erfc sin cos atan2 is_finite nextafter shift_left
    shift_right_logical shift_right_arithmetic population_count clz
    real imag square reduce_precision stop_gradient""".split()
)
_FREE_MOVES = frozenset(
    """broadcast_in_dim reshape squeeze slice pad concatenate transpose rev
    iota copy device_put convert_layout expand_dims bitcast_convert_type
    split empty""".split()
)


def _jaxpr_counts(jaxpr, mult=1.0, counts=None):
    """Tally {vpu lane-ops, MXU bf16-equivalent MACs} over a jaxpr.

    Data movement (reshape/slice/pad/...) is free — this is a compute
    floor. ``scan`` multiplies its body by the trip count; ``while``
    bodies count once and set a flag (floor only).
    """
    if counts is None:
        counts = {"vpu": 0.0, "mxu": 0.0, "flags": set()}

    def elems(vs):
        # dtype-width weighting: the VPU packs sub-word lanes (uint8/bool
        # ops run 4 per f32 lane-slot, f64 splits into 2) — without this
        # the uint8-heavy rank cascade over-counts ~4x vs its measured time
        total = 0.0
        for v in vs:
            n_el = float(np.prod(v.aval.shape)) if v.aval.shape else 1.0
            w = max(np.dtype(v.aval.dtype).itemsize, 1) / 4.0
            total += n_el * min(max(w, 0.25), 2.0)
        return total

    for eqn in jaxpr.eqns:
        p = eqn.primitive.name
        if p in ("pjit", "jit", "closed_call", "core_call", "remat2",
                 "custom_jvp_call", "custom_vjp_call"):
            sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if sub is not None:
                _jaxpr_counts(getattr(sub, "jaxpr", sub), mult, counts)
            continue
        if p == "scan":
            _jaxpr_counts(
                eqn.params["jaxpr"].jaxpr,
                mult * eqn.params.get("length", 1),
                counts,
            )
            continue
        if p == "while":
            counts["flags"].add("while: body counted once (floor)")
            for key in ("cond_jaxpr", "body_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    _jaxpr_counts(sub.jaxpr, mult, counts)
            continue
        if p == "cond":
            for br in eqn.params["branches"]:
                _jaxpr_counts(br.jaxpr, mult, counts)
            continue
        if p == "dot_general":
            (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
            a = eqn.invars[0].aval
            bv = eqn.invars[1].aval
            k = float(np.prod([a.shape[d] for d in lc])) if lc else 1.0
            bb = float(np.prod([a.shape[d] for d in lb])) if lb else 1.0
            m = float(
                np.prod(
                    [
                        a.shape[d]
                        for d in range(a.ndim)
                        if d not in lc and d not in lb
                    ]
                )
                or 1.0
            )
            nn = float(
                np.prod(
                    [
                        bv.shape[d]
                        for d in range(bv.ndim)
                        if d not in rc and d not in rb
                    ]
                )
                or 1.0
            )
            f32in = any(
                np.dtype(v.aval.dtype) == np.float32 for v in eqn.invars
            )
            hi = "HIGHEST" in str(eqn.params.get("precision"))
            w = V5E_HIGHEST_MULT if (hi and f32in) else 1.0
            counts["mxu"] += bb * m * nn * k * w * mult
            continue
        if p == "conv_general_dilated":
            out = elems(eqn.outvars)
            rhs = eqn.invars[1].aval
            counts["mxu"] += (
                out
                * float(np.prod(rhs.shape[1:]))
                * V5E_HIGHEST_MULT
                * mult
            )
            continue
        if p in _VPU_ELEM:
            counts["vpu"] += elems(eqn.outvars) * mult
        elif p.startswith("reduce_") or p in (
            "argmax", "argmin", "cumsum", "cumprod", "cummax", "cummin",
            "cumlogsumexp",
        ):
            counts["vpu"] += elems(eqn.invars[:1]) * mult
        elif p in ("sort",):
            n_in = elems(eqn.invars[:1])
            counts["vpu"] += n_in * max(np.log2(max(n_in, 2.0)), 1.0) * mult
        elif p in (
            "gather", "scatter", "scatter-add", "scatter_add",
            "dynamic_slice", "dynamic_update_slice", "take",
        ):
            counts["vpu"] += elems(eqn.outvars) * mult
        elif p in _FREE_MOVES:
            pass
        else:
            counts["flags"].add(f"uncounted:{p}")
    return counts


# step kernel name -> the Pallas custom-call prefix it lands as in a trace
_STEP_TRACE_PREFIX = {
    "fused_energy_front": "_fused_energy_call",
    "fused_t0_front": "_fused_t0_call",
    "chained_time_point_thresh": "_cascade_call",
    "fused_current_front": "_fused_current_poly_call",
    "fused_conv_bank": "_banded_conv_call",
}


def step_floors(n_ev: int, fused, sipm: bool = False, dplms: bool = False,
                measured=None):
    """Per-step op floors for the chain, joined to measured Pallas-kernel
    device times when ``measured`` (name -> ms) is given."""
    import jax

    prev = os.environ.get("DSPEED_TPU_PALLAS")
    os.environ["DSPEED_TPU_PALLAS"] = "0"  # trace the XLA-fallback math
    try:
        chain, inputs, _, _ = _build(n_ev, fused, sipm=sipm, dplms=dplms)
        from dspeed_tpu.processing_chain import GroupStep

        env_shapes = {
            k: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype)
            for k, v in inputs.items()
        }
        for var in chain._vars_dict.values():
            cv = getattr(var, "const_value", None)
            if cv is not None and getattr(var, "is_const", False):
                env_shapes[var.key] = jax.ShapeDtypeStruct(
                    np.shape(cv), np.asarray(cv).dtype
                )
        rows = []
        tot = {"vpu": 0.0, "mxu": 0.0, "hbm": 0.0, "floor": 0.0}
        flags = set()
        for step in chain._steps:
            reads = chain._step_env_reads(step)
            if reads is None:
                continue
            reads = sorted(k for k in reads if k in env_shapes)
            shapes_in = {k: env_shapes[k] for k in reads}

            def body(vals, _step=step, _base=frozenset(shapes_in)):
                local = dict(vals)
                _step.run(local)
                return {k: v for k, v in local.items() if k not in _base}

            try:
                outs = jax.eval_shape(body, shapes_in)
                jx = jax.make_jaxpr(body)(shapes_in)
            except Exception as e:
                flags.add(f"untraceable {step}: {e}")
                continue
            env_shapes.update(
                {
                    k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                    for k, v in outs.items()
                }
            )
            c = _jaxpr_counts(jx.jaxpr)
            flags |= c["flags"]
            hbm_bytes = sum(
                float(np.prod(s.shape or (1,))) * s.dtype.itemsize
                for s in list(shapes_in.values()) + list(outs.values())
            )
            vpu_ms = c["vpu"] / V5E_VPU_OPS * 1e3
            mxu_ms = c["mxu"] / V5E_MXU_BF16 * 1e3
            hbm_ms = hbm_bytes / V5E_HBM * 1e3
            floor = max(vpu_ms, mxu_ms, hbm_ms)
            if floor < 1e-3:
                continue
            kname = getattr(getattr(step, "kernel", None), "__name__", None)
            if isinstance(step, GroupStep):
                kname = "fusion_group"
            meas = None
            if measured and kname in _STEP_TRACE_PREFIX:
                pref = _STEP_TRACE_PREFIX[kname]
                meas = sum(
                    ms for nm, ms in measured.items() if nm.startswith(pref)
                ) or None
            rows.append(
                (str(step)[:52], vpu_ms, mxu_ms, hbm_ms, floor, meas,
                 isinstance(step, GroupStep))
            )
            for key, val in (
                ("vpu", vpu_ms), ("mxu", mxu_ms), ("hbm", hbm_ms),
                ("floor", floor),
            ):
                tot[key] += val
    finally:
        if prev is None:
            os.environ.pop("DSPEED_TPU_PALLAS", None)
        else:
            os.environ["DSPEED_TPU_PALLAS"] = prev

    print(
        f"\n{'step (op floors, XLA-fallback math)':52s} {'vpu_ms':>7s} "
        f"{'mxu_ms':>7s} {'hbm_ms':>7s} {'floor':>7s} {'meas':>7s} "
        f"{'eff%':>5s}"
    )
    rows.sort(key=lambda r: -r[4])
    for name, vpu_ms, mxu_ms, hbm_ms, floor, meas, _g in rows:
        meas_s = f"{meas:7.3f}" if meas else f"{'':>7s}"
        eff = f"{100 * floor / meas:5.0f}" if meas else f"{'':>5s}"
        print(
            f"{name:52s} {vpu_ms:7.3f} {mxu_ms:7.3f} {hbm_ms:7.3f} "
            f"{floor:7.3f} {meas_s} {eff}"
        )
    print(
        f"{'TOTAL (independent-step floors)':52s} {tot['vpu']:7.3f} "
        f"{tot['mxu']:7.3f} {tot['hbm']:7.3f} {tot['floor']:7.3f}"
    )
    # generic row-tile groups: the trace names (chain_fn.N) don't map to
    # step order reliably, so report the AGGREGATE group efficiency — the
    # per-group split is visible in --fusions output
    gfloor = sum(r[4] for r in rows if r[6])
    if measured and gfloor:
        gmeas = sum(
            ms for nm, ms in measured.items() if nm.startswith("chain_fn")
        )
        if gmeas:
            print(
                f"{'GENERIC GROUPS (aggregate)':52s} {'':>7s} {'':>7s} "
                f"{'':>7s} {gfloor:7.3f} {gmeas:7.3f} "
                f"{100 * gfloor / gmeas:5.0f}"
            )
    for f in sorted(flags):
        print(f"# {f}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-n", "--n-ev", type=int, default=None)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument(
        "--mode", default=None,
        help="literal DSPEED_TPU_FUSE mode (e.g. 'generic'); overrides --fused",
    )
    ap.add_argument("--per-step", action="store_true")
    ap.add_argument("--fusions", action="store_true")
    ap.add_argument("--floors", action="store_true",
                    help="per-step op-count floors + eff%% vs measured")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sipm", action="store_true",
                    help="profile the SiPM pulse-finding chain instead")
    ap.add_argument("--dplms", action="store_true",
                    help="profile the reference's sipm-dplms config instead")
    args = ap.parse_args()

    import jax

    on_accel = jax.default_backend() not in ("cpu",)
    n_ev = args.n_ev or (4096 if on_accel else 256)
    fused_mode = args.mode if args.mode is not None else args.fused
    measured = None
    if args.per_step or (not args.fusions and not args.floors and not on_accel):
        per_step(n_ev, fused_mode)
        return
    if args.fusions or not args.floors:
        measured = fusions(
            n_ev, fused_mode, iters=args.iters, sipm=args.sipm,
            dplms=args.dplms,
        )
    if args.floors:
        step_floors(n_ev, fused_mode, sipm=args.sipm, dplms=args.dplms,
                    measured=measured)


if __name__ == "__main__":
    main()
