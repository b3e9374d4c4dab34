"""Multi-channel SPMD processing over a device mesh.

Runs the flagship HPGe chain over a stacked (channel, event) batch sharded
across a 2-D ``("channel", "data")`` mesh — one XLA dispatch per chunk, no
collectives in the chain body. Works on real multi-chip hardware or a
virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichannel_spmd.py
"""

import numpy as np

import jax

from dspeed_tpu import lh5
from dspeed_tpu.parallel import make_mesh
from dspeed_tpu.processing_chain import build_processing_chain


def main():
    n_chan, n_ev, nsamp = 2, 64, 1024
    rng = np.random.default_rng(0)

    # synthetic per-channel batches (in production: one LH5 table per channel)
    tau = 4000.0
    t = np.arange(nsamp)[None, :]
    t0 = rng.integers(200, 300, (n_chan * n_ev, 1))
    amp = rng.uniform(1000, 20000, (n_chan * n_ev, 1))
    wf = 15000.0 + amp * np.clip((t - t0) / 20, 0, 1) * np.exp(
        -np.clip(t - t0 - 20, 0, None) / tau
    )
    wf = (wf + rng.normal(0, 3, wf.shape)).astype("float32")
    bl = np.full(n_chan * n_ev, 15000.0, "float32")

    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl),
        }
    )
    config = {
        "outputs": ["trapEmax"],
        "processors": {
            "wf_blsub": {
                "function": "bl_subtract",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "baseline", "wf_blsub"],
            },
            "wf_pz": {
                "function": "pole_zero",
                "module": "dspeed_tpu.processors",
                "args": ["wf_blsub", f"{tau}", "wf_pz"],
            },
            "wf_trap": {
                "function": "trap_norm",
                "module": "dspeed_tpu.processors",
                "args": ["wf_pz", "100", "50", "wf_trap"],
            },
            "trapEmax": {
                "function": "amax",
                "module": "numpy",
                "args": ["wf_trap", 1, "trapEmax"],
                "kwargs": {"signature": "(n),()->()", "types": ["fi->f"]},
            },
        },
    }
    chain, _, _ = build_processing_chain(config, tb, block_width=n_chan * n_ev)

    mesh = make_mesh({"channel": n_chan, "data": len(jax.devices()) // n_chan})
    chain.set_sharding(mesh, batch_axes=("channel", "data"))

    inputs, _ = chain._gather_inputs(0, n_chan * n_ev)
    # reshape the flat batch into (channel, event, ...)
    stacked = {
        k: v.reshape(n_chan, n_ev, *v.shape[1:]) if v.ndim else v
        for k, v in inputs.items()
    }
    fn = jax.jit(chain._build_fn())
    out = fn(chain._shard_inputs(stacked))
    te = np.asarray(out[[k for k in out if k.startswith("trapEmax")][0]])
    print(f"mesh {dict(mesh.shape)} -> trapEmax shape {te.shape}, "
          f"mean rel err vs injected: "
          f"{np.nanmean(np.abs(te.reshape(-1) - amp[:, 0]) / amp[:, 0]):.3%}")


if __name__ == "__main__":
    main()
