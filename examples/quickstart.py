"""dspeed-tpu tutorial: a narrated end-to-end walk-through.

This is the executable counterpart of the reference's intro notebooks
(``/root/reference/docs/source/notebooks/``): every section below is a
self-contained step you can read top to bottom, and the whole file runs
under pytest as an integration test (``tests/test_tutorial.py``), so it
can never drift from the API. Run it directly with:

    JAX_PLATFORMS=cpu python examples/quickstart.py    # or on a TPU host

Covered, in order:

1. writing a raw-tier LH5 file of synthetic HPGe pulses,
2. what's inside a DSP config (processors, db parameters, outputs),
3. bulk production with ``build_dsp``,
4. reading the DSP tier back and checking the physics,
5. checked mode: halting on a bad event with the exact entry number,
6. drawing annotated waveforms with the ``WaveformBrowser``,
7. the in-memory API: building and running a chain without files.
"""

import os
import tempfile

import numpy as np

import dspeed_tpu as dspeed
from dspeed_tpu import lh5

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "..", "configs", "hpge-energy-timing.yaml")
DB = {"pz": {"tau": 27460.5}}  # per-detector calibration database slice


def make_waveforms(n=256, nsamp=4096, seed=7):
    """HPGe-like pulses: baseline, linear rise, exponential decay."""
    rng = np.random.default_rng(seed)
    tau = 27460.5  # decay constant, samples
    amp = rng.uniform(500, 30000, n)
    t0 = rng.integers(950, 1050, n)
    rt = rng.integers(40, 150, n)
    bl = rng.uniform(14000, 16000, n)
    t = np.arange(nsamp)[None, :]
    rise = np.clip((t - t0[:, None]) / rt[:, None], 0, 1)
    decay = np.where(
        t > t0[:, None] + rt[:, None],
        np.exp(-(t - t0[:, None] - rt[:, None]) / tau),
        1.0,
    )
    wf = bl[:, None] + amp[:, None] * rise * decay
    wf += rng.normal(0, 3, (n, nsamp))
    return wf.astype("float32"), amp, bl


# ---------------------------------------------------------------- step 1
def step1_write_raw(workdir, n=256):
    """A raw-tier file is LH5: an HDF5 file whose groups carry LGDO type
    attributes. A channel table holds a WaveformTable (values + t0 + dt,
    each with units) plus any per-event scalars the DAQ recorded."""
    raw_file = os.path.join(workdir, "demo_raw.lh5")
    wf, amp, bl = make_waveforms(n)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    lh5.write(tb, "det01/raw", raw_file)
    print(f"[1] wrote {len(tb)} waveforms to {raw_file}")
    return raw_file, amp


# ---------------------------------------------------------------- step 2
def step2_inspect_config():
    """A DSP config is a dict (JSON or YAML) with two keys: ``outputs``
    (what lands in the DSP file) and ``processors`` (one node per derived
    variable). Each node names a processor function and its args;
    ``db.`` prefixes pull per-channel values from the database dict, with
    the node's ``defaults`` as fallback. Units in arg strings ("2*us")
    are converted to samples against the waveform's dt at build time."""
    import yaml

    with open(CONFIG) as f:
        cfg = yaml.safe_load(f)
    node = cfg["processors"]["wf_pz"]
    print(f"[2] config: {len(cfg['processors'])} processors, "
          f"{len(cfg['outputs'])} outputs")
    print(f"    wf_pz node: function={node['function']} args={node['args']}")
    assert "db.pz.tau" in str(node["args"])
    return cfg


# ---------------------------------------------------------------- step 3
def step3_production(raw_file, workdir):
    """``build_dsp`` is the bulk driver: it chunks the raw file, jits the
    whole chain once per (config, shape), streams chunks through the
    device, and writes the DSP tier. The database maps channel names to
    calibration slices; wildcards and multi-channel files work the same
    way (see docs/manual.md section 4)."""
    dsp_file = os.path.join(workdir, "demo_dsp.lh5")
    dspeed.build_dsp(
        raw_file, dsp_file, CONFIG, database={"det01": DB}, write_mode="r"
    )
    print(f"[3] production complete -> {dsp_file}")
    return dsp_file


# ---------------------------------------------------------------- step 4
def step4_read_back(dsp_file, amp):
    """The DSP tier is plain LH5: every output column with its units.
    trapEmax must recover the injected amplitudes to well under a percent
    (trap filter ballistic deficit on these synthetic rise times)."""
    dsp = lh5.read("det01/dsp", dsp_file)
    trapEmax = dsp["trapEmax"].nda
    rel = np.abs(trapEmax - amp) / amp
    rise = np.nanmedian(dsp["tp_90"].nda - dsp["tp_10"].nda)
    print(f"[4] {len(list(dsp.keys()))} columns; trapEmax recovers "
          f"amplitudes to {rel.max():.2%} worst-case; "
          f"median tp_90-tp_10 rise {rise:.0f} {dsp['tp_90'].attrs['units']}")
    assert rel.max() < 0.02, "energy reconstruction off"
    assert dsp["tp_50"].attrs["units"] == "ns"
    return rel.max()


# ---------------------------------------------------------------- step 5
def step5_checked_mode(workdir):
    """By default an event whose data violates a kernel precondition
    (here: an out-of-range pick-off index) silently becomes NaN — the
    chain-wide invalid-event convention. With ``checked=True`` production
    instead halts like the reference, naming the processor and the exact
    global entry (docs/manual.md section 8)."""
    from dspeed_tpu.errors import DSPFatal

    raw_file = os.path.join(workdir, "checked_raw.lh5")
    wf, _, bl = make_waveforms(40)
    idx = np.full(40, 100, "int64")
    idx[27] = 99999  # event 27 picks outside the waveform
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "pickidx": lh5.Array(idx),
        }
    )
    lh5.write(tb, "det01/raw", raw_file)
    cfg = {
        "outputs": ["picked"],
        "processors": {
            "picked": {
                "function": "get",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "pickidx", "picked"],
            }
        },
    }
    dsp_file = os.path.join(workdir, "checked_dsp.lh5")
    # default: event 27 is NaN, everything else processes
    dspeed.build_dsp(
        raw_file, dsp_file, cfg, write_mode="r", buffer_len=16
    )
    picked = lh5.read("det01/dsp", dsp_file)["picked"].nda
    assert np.isnan(picked[27]) and np.isfinite(picked[0])
    # checked: the same file halts with the exact entry
    try:
        dspeed.build_dsp(
            raw_file, dsp_file, cfg, write_mode="r", buffer_len=16,
            checked=True,
        )
    except DSPFatal as e:
        print(f"[5] checked mode halted: '{e.args[0]}' at entries "
              f"{e.wf_range} in {e.processor}")
        assert e.wf_range == (27, 27)
        return e
    raise AssertionError("checked mode did not raise")


# ---------------------------------------------------------------- step 6
def step6_browser(raw_file, workdir):
    """The WaveformBrowser runs the chain on demand per entry and draws
    any intermediate variable — raw waveform, pole-zero corrected, trap
    output — with legends evaluated from chain variables. Headless here;
    interactively it pages with draw_next()."""
    import matplotlib

    matplotlib.use("Agg")
    from dspeed_tpu.vis import WaveformBrowser

    wb = WaveformBrowser(
        raw_file,
        "det01/raw",
        dsp_config=CONFIG,
        database=DB,
        lines=["waveform", "wf_pz"],
        legend=["trapEmax = {trapEmax:.0f}"],
    )
    wb.draw_entry([3, 5])
    png = os.path.join(workdir, "waveforms.png")
    wb.save_figure(png)
    print(f"[6] browser drew entries 3,5 -> {png}")
    assert os.path.getsize(png) > 1000
    return png


# ---------------------------------------------------------------- step 7
def step7_in_memory():
    """No files needed: build_processing_chain works on an in-memory
    Table, and the chain object is callable. This is the surface the
    tests, the benchmark, and custom scripts use."""
    from dspeed_tpu.processing_chain import build_processing_chain

    wf, amp, bl = make_waveforms(32)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    chain, _, tb_out = build_processing_chain(CONFIG, tb, db_dict=DB)
    chain(tb, tb_out)
    e = tb_out["trapEmax"].nda
    rel = np.abs(e - amp) / amp
    print(f"[7] in-memory chain: {len(list(tb_out.keys()))} outputs, "
          f"trapEmax max rel err {rel.max():.2%}")
    assert rel.max() < 0.02
    return tb_out


def main():
    workdir = tempfile.mkdtemp(prefix="dspeed_tpu_demo_")
    raw_file, amp = step1_write_raw(workdir)
    step2_inspect_config()
    dsp_file = step3_production(raw_file, workdir)
    step4_read_back(dsp_file, amp)
    step5_checked_mode(workdir)
    step6_browser(raw_file, workdir)
    step7_in_memory()
    print(f"tutorial complete; artifacts in {workdir}")


if __name__ == "__main__":
    main()
