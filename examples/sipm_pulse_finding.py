"""dspeed-tpu tutorial 2: SiPM pulse finding with variable-length outputs.

The HPGe walk-through (``examples/quickstart.py``) produces one scalar per
event per column. SiPM data is different: each waveform carries an
*unknown number* of photon pulses, so the interesting outputs — trigger
times and per-pulse energies — are ragged. This example shows the full
pipeline the reference covers in its SiPM notebook
(``/root/reference/tests/configs/sipm-dsp-config.json`` is the config
twin): smoothing, current derivative, a noise-adaptive peak search whose
threshold comes from a histogram of the waveform's own noise, SNR
filtering, and VectorOfVectors (VoV) output columns.

Runs end-to-end under pytest (``tests/test_tutorial.py``); run directly:

    JAX_PLATFORMS=cpu python examples/sipm_pulse_finding.py
"""

import os
import tempfile

import numpy as np

import dspeed_tpu as dspeed
from dspeed_tpu import lh5

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.path.join(HERE, "..", "configs", "sipm-pulse-finding.yaml")


# ---------------------------------------------------------------- step 1
def make_sipm_waveforms(n=128, nsamp=1024, seed=3):
    """SiPM-like traces: flat noisy baseline + a Poisson number of fast
    pulses (sharp rise, ~80-sample exponential tail) at random times.
    Returns the waveforms AND the truth (pulse times per event) so the
    found triggers can be validated against it."""
    rng = np.random.default_rng(seed)
    t = np.arange(nsamp)[None, :]
    wf = rng.normal(0.0, 1.0, (n, nsamp))
    n_pulse = rng.poisson(2.0, n)
    truth = []
    for i in range(n):
        t0s = np.sort(rng.uniform(50, nsamp - 50, n_pulse[i]))
        for t0 in t0s:
            a = rng.uniform(20, 200)
            wf[i] += a * np.exp(-np.abs(t[0] - t0) / np.where(t[0] > t0, 80, 3))
        truth.append(t0s)
    return wf.astype("float32"), truth


# ---------------------------------------------------------------- step 2
def step2_production(workdir):
    """Variable-length outputs are declared in the config with
    ``vector_len``: the peak search fills fixed NaN-padded slot arrays on
    device (XLA needs static shapes) plus a per-event count, and the VoV
    output manager flattens them into a ragged VectorOfVectors column on
    write — the same dense-on-device / ragged-on-disk split the engine
    uses everywhere."""
    raw_file = os.path.join(workdir, "sipm_raw.lh5")
    wf, truth = make_sipm_waveforms()
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            )
        }
    )
    lh5.write(tb, "spm01/raw", raw_file)

    dsp_file = os.path.join(workdir, "sipm_dsp.lh5")
    dspeed.build_dsp(raw_file, dsp_file, CONFIG, write_mode="r")
    print(f"[2] production complete -> {dsp_file}")
    return dsp_file, truth


# ---------------------------------------------------------------- step 3
def step3_read_vov(dsp_file, truth):
    """Read the ragged columns back. A VectorOfVectors holds a flat data
    array plus cumulative lengths; ``vov[i]`` is event i's pulse list."""
    dsp = lh5.read("spm01/dsp", dsp_file)
    trig = dsp["trigger_pos"]
    ene = dsp["energies"]
    n_found = np.array([len(trig[i]) for i in range(len(trig))])
    print(f"[3] events: {len(n_found)}; "
          f"pulses found: {n_found.sum()} "
          f"(mean {n_found.mean():.2f}/event)")

    # validate against the injected truth: pulse times are in ns
    # (dt = 16 ns), and the current-derivative trigger fires on the rise
    dt = 16.0
    matched = total_true = 0
    for i, t0s in enumerate(truth):
        found_samples = np.asarray(trig[i]) / dt
        for t0 in t0s:
            total_true += 1
            if len(found_samples) and np.min(np.abs(found_samples - t0)) < 12:
                matched += 1
    eff = matched / max(total_true, 1)
    print(f"    trigger efficiency vs injected truth: {eff:.1%}")
    assert eff > 0.85, f"pulse-finding efficiency collapsed: {eff:.1%}"

    # energies: every found pulse gets a positive current amplitude
    flat_e = np.concatenate(
        [np.asarray(ene[i]) for i in range(len(ene))]
    ) if n_found.sum() else np.array([])
    assert (flat_e > 0).all()
    print(f"    energies: {flat_e.min():.1f}..{flat_e.max():.1f} ADC")
    return n_found


# ---------------------------------------------------------------- step 4
def step4_checked_mode(workdir):
    """Checked mode works for SiPM chains too: the per-event data checks
    (pick-off indices, search starts) halt production with the exact
    entry instead of silently NaN-ing the event."""
    raw_file = os.path.join(workdir, "sipm_raw.lh5")
    out = os.path.join(workdir, "sipm_checked_dsp.lh5")
    dspeed.build_dsp(raw_file, out, CONFIG, write_mode="r", checked=True)
    print("[4] checked-mode production: clean data passes unchanged")


def main():
    with tempfile.TemporaryDirectory() as workdir:
        dsp_file, truth = step2_production(workdir)
        step3_read_vov(dsp_file, truth)
        step4_checked_mode(workdir)
        print("tutorial 2 complete")


if __name__ == "__main__":
    main()
