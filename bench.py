"""dspeed_tpu benchmark: waveforms/sec on the flagship HPGe energy+timing chain.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "waveforms/sec/chip", "vs_baseline": N}``

The chain is the full 43-processor config (baseline, pole-zero, trap/CUSP/ZAC
energies, tp_0..tp_100 timing, A_max, QDrift) — the BASELINE.md canonical
workload. The reference publishes no numbers (BASELINE.json.published == {}),
so ``vs_baseline`` is measured against a single-host CPU run of the same
chain via JAX's CPU backend on this machine (a stand-in for the reference's
single-threaded numba engine, which is not installable here — no numba in the
image). Both numbers are reported in the JSON for transparency.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _bench_backend(backend: str, n_ev: int, iters: int, fused: bool = False) -> float:
    """Sustained waveforms/sec of the flagship chain on one device.

    Each iteration is synced with ``block_until_ready`` before the clock
    stops — on remote/async backends an unsynced dispatch loop measures
    queueing, not execution. Best of 3 trials to shed tunnel jitter.
    """
    import jax

    from __graft_entry__ import _build_chain

    device = jax.devices(backend)[0]
    chain, inputs, _, _ = _build_chain(n_ev=n_ev, fused=fused)
    best = 0.0
    with jax.default_device(device):
        fn = jax.jit(chain._build_fn())
        inputs = {k: jax.device_put(v, device) for k, v in inputs.items()}

        out = fn(inputs)  # compile + warm up
        _ = {k: np.asarray(v) for k, v in out.items()}  # host fetch: drains
        # remote-compile queues that block_until_ready does not observe

        # serialized timing: each iteration's input depends on the previous
        # iteration's output, and the loop ends with a host fetch.  On
        # async/remote backends, a plain block_until_ready can acknowledge
        # dispatch instead of completion; a data dependency cannot be faked.
        key = sorted(out)[0]
        blk = sorted(k for k in inputs if np.asarray(inputs[k]).ndim == 1)[0]
        for _trial in range(3):
            t0 = time.perf_counter()
            cur = dict(inputs)
            for _ in range(iters):
                out = fn(cur)
                feed = (0.0 * out[key].reshape(-1)[0]).astype(inputs[blk].dtype)
                cur = {**inputs, blk: inputs[blk] + feed}
            _ = np.asarray(out[key].reshape(-1)[:1])
            dt = time.perf_counter() - t0
            best = max(best, n_ev * iters / dt)
    return best


def _bench_production(n_ev: int = 4096) -> float:
    """End-to-end build_dsp throughput (LH5 read -> chain -> LH5 write)."""
    import os
    import tempfile

    from __graft_entry__ import _make_inputs

    from dspeed_tpu import build_dsp, lh5

    wf, bl = _make_inputs(n_ev)
    # store ADC codes as uint16 like a real DAQ raw file: halves the
    # host->device transfer; the chain casts to f32 on device
    wf = np.clip(np.round(wf), 0, 65535).astype(np.uint16)
    tmp = tempfile.mkdtemp()
    raw = os.path.join(tmp, "bench_raw.lh5")
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype(np.float32)),
        }
    )
    lh5.write(tb, "det/raw", raw)
    config = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "configs",
        "hpge-energy-timing.yaml",
    )
    out = os.path.join(tmp, "bench_dsp.lh5")
    db = {"det": {"pz": {"tau": 27460.5}}}
    build_dsp(raw, out, config, database=db, write_mode="r")  # warm compile
    best_dt = None
    for _trial in range(3):  # remote-transport variance is large; take best
        t0 = time.perf_counter()
        build_dsp(raw, out, config, database=db, write_mode="r")
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)
    dt = best_dt
    for f in (raw, out):
        try:
            os.remove(f)
        except OSError:
            pass
    return n_ev / dt


def main() -> None:
    import os

    import jax

    # persistent compilation cache: repeated bench runs skip the multi-minute
    # first compile of the 43-processor chain
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    platform = jax.default_backend()
    on_accel = platform not in ("cpu",)

    t_start = time.perf_counter()
    budget_s = float(os.getenv("DSPEED_BENCH_BUDGET_S", "480"))

    n_ev = 4096 if on_accel else 1024
    iters = 10 if on_accel else 3
    try:
        wfps_std = _bench_backend(platform, n_ev, iters)
    except Exception as e:  # never die without printing the JSON line
        print(f"# standard bench failed: {e}", file=sys.stderr)
        wfps_std = 0.0

    def have_time() -> bool:
        return time.perf_counter() - t_start < budget_s

    wfps_fused = None
    if have_time():
        try:
            wfps_fused = _bench_backend(platform, n_ev, iters, fused=True)
        except Exception as e:
            print(f"# fused variant failed: {e}", file=sys.stderr)
    wfps = max(wfps_std, wfps_fused or 0.0)

    production_wfps = None
    if have_time():
        try:
            production_wfps = _bench_production(4096 if on_accel else 1024)
        except Exception as e:
            print(f"# production bench failed: {e}", file=sys.stderr)

    cpu_wfps = None
    vs_baseline = 1.0
    if on_accel and have_time():
        try:
            # pallas kernels only compile for the TPU backend; force the
            # XLA fallbacks for the CPU comparison run
            os.environ["DSPEED_TPU_PALLAS"] = "0"
            cpu_wfps = _bench_backend("cpu", 256, 2)
            vs_baseline = wfps / cpu_wfps
        except Exception as e:  # CPU backend unavailable: report raw number
            print(f"# cpu baseline failed: {e}", file=sys.stderr)
        finally:
            os.environ.pop("DSPEED_TPU_PALLAS", None)

    result = {
        "metric": "waveforms/sec/chip, full HPGe energy+timing chain "
        "(43 processors, 4096-sample f32 waveforms)",
        "value": round(wfps, 1),
        "unit": "waveforms/sec",
        "vs_baseline": round(vs_baseline, 2),
        "platform": platform,
        "events_per_dispatch": n_ev,
        "standard_wfps": round(wfps_std, 1),
        "fused_wfps": round(wfps_fused, 1) if wfps_fused else None,
        "production_wfps_with_io": round(production_wfps, 1) if production_wfps else None,
        "cpu_same_chain_wfps": round(cpu_wfps, 1) if cpu_wfps else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
