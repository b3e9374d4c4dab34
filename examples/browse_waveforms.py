"""dspeed-tpu worked example: browse raw + DSP-transformed waveforms.

Generates a synthetic HPGe raw file, builds a WaveformBrowser over the
flagship energy+timing config, and renders a few annotated events to PNG
(headless matplotlib — no display needed). Run with:

    JAX_PLATFORMS=cpu python examples/browse_waveforms.py

See docs/manual.md §7 for the browser surface this demonstrates.
"""

import os
import tempfile

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from dspeed_tpu import lh5
from dspeed_tpu.vis import WaveformBrowser

from quickstart import CONFIG, make_waveforms

DB = {"pz": {"tau": 27460.5}}


def main():
    workdir = tempfile.mkdtemp(prefix="dspeed_tpu_browse_")
    raw_file = os.path.join(workdir, "demo_raw.lh5")

    wf, amp, bl = make_waveforms(n=64)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    lh5.write(tb, "ch001/raw", raw_file)

    # one browser: baseline-subtracted waveform + energy trapezoid as
    # curves, trapEmax as a horizontal line, tp_50 as a vertical line,
    # per-event values formatted into the legend
    browser = WaveformBrowser(
        raw_file,
        "ch001/raw",
        dsp_config=CONFIG,
        database=DB,
        lines=["wf_blsub", "wf_trap", "trapEmax", "tp_50"],
        styles=[
            {"color": ["tab:blue"], "ls": ["-"]},
            {"color": ["tab:orange"], "ls": ["--"]},
            {"color": ["tab:red"], "ls": [":"]},
            {"color": ["tab:green"], "ls": [":"]},
        ],
        # bare names expand to "name = {name}"; full format strings may
        # reference any chain variable
        legend=["bl_mean", "trapTmax", "E = {trapEmax:.0f} ADC",
                "tp50 = {tp_50:.0f}"],  # unit appended automatically
        x_unit="us",
        n_drawn=1,
    )

    for entry in (3, 17):
        plt.figure(figsize=(8, 4.5))
        browser.draw_entry(entry)
        png = os.path.join(workdir, f"event_{entry:04d}.png")
        plt.savefig(png, dpi=110)
        plt.close()
        print("wrote", png)

    # overlay three aligned, normalized events in one panel
    browser2 = WaveformBrowser(
        raw_file,
        "ch001/raw",
        dsp_config=CONFIG,
        database=DB,
        lines=["wf_pz"],
        norm="trapEmax",          # unit height
        align="tp_50",            # line up the 50% crossing
        x_unit="us",
        n_drawn=3,
    )
    plt.figure(figsize=(8, 4.5))
    browser2.draw_next()
    png = os.path.join(workdir, "aligned_overlay.png")
    plt.savefig(png, dpi=110)
    plt.close()
    print("wrote", png)


if __name__ == "__main__":
    main()
