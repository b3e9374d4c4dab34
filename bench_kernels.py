"""Per-kernel-group micro-benchmarks for TPU tuning.

Times representative kernels on flagship-chain shapes and prints a table
(stderr) plus one JSON line (stdout). Not run by the driver; use it on TPU
hosts to find the next optimization target:

    python bench_kernels.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timeit(fn, *args, iters=10, **kwargs):
    import jax

    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dspeed_tpu import processors as dp

    B, N = 2048, 4096
    rng = np.random.default_rng(0)
    wf = jnp.asarray(rng.normal(0, 1000, (B, N)).astype("float32"))
    bl = jnp.asarray(rng.normal(15000, 100, B).astype("float32"))
    taps133 = rng.normal(0, 1, 133).astype("float32")
    kern1696 = rng.normal(0, 1, 1696).astype("float32")

    # each case is (fn(w, b), uses_bl) so inputs stay jit ARGUMENTS
    # (a zero-arg closure would constant-fold the whole computation)
    cases = {
        "bl_subtract": lambda w, b: dp.bl_subtract(w, b),
        "pole_zero": lambda w, b: dp.pole_zero(w, 27460.5),
        "trap_norm": lambda w, b: dp.trap_norm(w, 625, 188),
        "asym_trap": lambda w, b: dp.asym_trap_filter(w, 8, 4, 125),
        "min_max": lambda w, b: dp.min_max(w),
        "time_point_thresh": lambda w, b: dp.time_point_thresh(w, 100.0, 2000.0, 0),
        "fixed_time_pickoff": lambda w, b: dp.fixed_time_pickoff(w, 1234.5, ord("l")),
        "convolve_133": lambda w, b: dp.convolve_wf(
            w, taps133, ord("s"), dims={"p": N}
        ),
        "fft_convolve_1696": lambda w, b: dp.fft_convolve_wf(
            w[:, :1996], kern1696, ord("v"), dims={"p": 301}
        ),
        "windower": lambda w, b: dp.windower(w, 1000.0, dims={"m": 301}),
        "moving_window_multi": lambda w, b: dp.moving_window_multi(w, 48.0, 3, 0),
        "histogram": lambda w, b: dp.histogram(w, dims={"m": 100, "p": 101}),
        "fused_energy": lambda w, b: dp.fused_energy_filter(w, b, 27460.5, 625, 188),
        "peakdet(512)": lambda w, b: dp.get_multi_local_extrema(
            w[:, :512], 50.0, 50.0, 0, 100.0, 0.0, dims={"m": 8, "p": 8}
        ),
    }

    results = {}
    for name, fn in cases.items():
        try:
            jfn = jax.jit(fn)
            dt = timeit(jfn, wf, bl)
            results[name] = round(dt * 1e3, 3)
            print(f"{name:22s} {dt * 1e3:8.3f} ms "
                  f"({B / dt / 1e6:7.2f} M wf/s)", file=sys.stderr)
        except Exception as e:
            results[name] = None
            print(f"{name:22s} FAILED: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "per-kernel ms per (2048, 4096) f32 batch",
        "platform": jax.default_backend(),
        "results_ms": results,
    }))


if __name__ == "__main__":
    main()
