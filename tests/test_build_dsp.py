"""Driver tests over the flagship HPGe energy+timing chain, mirroring the
reference's strategy (``tests/test_build_dsp.py``): full-config production on
a (synthetic) raw file, input-type equivalence, write modes, and physics
sanity checks on the outputs (trapEmax recovers the injected amplitude).
"""

import os

import numpy as np
import pytest

from dspeed_tpu import build_dsp, lh5

CONFIG = os.path.join(os.path.dirname(__file__), "..", "configs", "hpge-energy-timing.yaml")
# file inputs get a per-channel database slice keyed by the table name
# (reference build_dsp.py:247-253); flat dict applies to Table inputs
DB_FLAT = {"pz": {"tau": 27460.5}}
DB = {"geds": DB_FLAT}


def make_hpge_waveforms(n=64, nsamp=4096, seed=11, dt=16.0):
    """Synthetic HPGe pulses: flat baseline, linear rise over ``rt`` samples
    at ``t0``, then exponential decay with tau=27460.5 samples. ``t0`` sits
    inside the CUSP/ZAC 'valid' convolution window for 4096-sample traces."""
    rng = np.random.default_rng(seed)
    tau = 27460.5
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
    return wf.astype("float32"), amp, t0, bl


@pytest.fixture(scope="module")
def raw_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("raw") / "test_raw.lh5")
    wf, amp, t0, bl = make_hpge_waveforms()
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    lh5.write(tb, "geds/raw", path)
    return path, amp, t0


def test_build_dsp_file(raw_file, tmp_path):
    path, amp, t0 = raw_file
    out = str(tmp_path / "test_dsp.lh5")
    build_dsp(path, out, CONFIG, database=DB, write_mode="r")
    assert os.path.exists(out)
    dsp = lh5.read("geds/dsp", out)
    assert isinstance(dsp, lh5.Table)

    # energy estimates recover the injected amplitude to better than 1%
    trapEmax = dsp["trapEmax"].nda
    assert np.all(np.isfinite(trapEmax))
    np.testing.assert_allclose(trapEmax, amp, rtol=1e-2)

    # the three energy estimators agree with each other at the few-% level
    assert np.corrcoef(trapEmax, dsp["cuspEmax"].nda)[0, 1] > 0.999
    assert np.corrcoef(trapEmax, dsp["zacEmax"].nda)[0, 1] > 0.999

    # tp_0 estimate lands near (systematically slightly before, by the
    # t0-filter group delay) the injected start time
    tp_0 = dsp["tp_0_est"].nda
    valid = np.isfinite(tp_0)
    assert valid.mean() > 0.9
    diff = t0[valid] * 16.0 - tp_0[valid]
    assert np.all(diff > -200) and np.all(diff < 2000)

    # rise-time points are ordered
    for lo, hi in [("tp_10", "tp_50"), ("tp_50", "tp_90"), ("tp_90", "tp_100")]:
        a, b = dsp[lo].nda, dsp[hi].nda
        m = np.isfinite(a) & np.isfinite(b)
        assert np.all(a[m] <= b[m] + 1e-3)

    # units survived to disk
    assert dsp["tp_50"].attrs.get("units") == "ns"
    assert dsp["trapEmax"].attrs.get("units") == "ADC"


def test_input_type_equivalence(raw_file):
    """file / LH5Iterator / Table inputs give identical outputs (ref :116-154)."""
    path, _, _ = raw_file
    out_file = build_dsp(path, None, CONFIG, database=DB)
    tbl = lh5.read("geds/raw", path)
    out_tbl = build_dsp(tbl, None, CONFIG, database=DB_FLAT)
    it = lh5.LH5Iterator(path, "geds/raw", buffer_len=16)
    out_it = build_dsp(it, None, CONFIG, database=DB_FLAT)

    dsp_f = out_file["geds"]["dsp"]
    for name in ("trapEmax", "cuspEmax", "tp_50", "A_max"):
        np.testing.assert_allclose(
            dsp_f[name].nda, out_tbl[name].nda, rtol=1e-5, equal_nan=True
        )
        np.testing.assert_allclose(
            dsp_f[name].nda, out_it[name].nda, rtol=1e-5, equal_nan=True
        )


def test_chunked_matches_single(raw_file):
    path, _, _ = raw_file
    small = build_dsp(path, None, CONFIG, database=DB, buffer_len=24)
    big = build_dsp(path, None, CONFIG, database=DB, buffer_len=3200)
    for name in ("trapEmax", "tp_50"):
        np.testing.assert_allclose(
            small["geds"]["dsp"][name].nda,
            big["geds"]["dsp"][name].nda,
            rtol=1e-5,
            equal_nan=True,
        )


def test_buffer_len_auto(raw_file):
    """``buffer_len="auto"`` probes the transport on accelerators and keeps
    the reference default on CPU — results identical either way."""
    from dspeed_tpu.build_dsp import _auto_buffer_len

    assert _auto_buffer_len() == 3200  # CPU backend: reference default
    path, _, _ = raw_file
    auto = build_dsp(path, None, CONFIG, database=DB, buffer_len="auto")
    ref = build_dsp(path, None, CONFIG, database=DB)
    for name in ("trapEmax", "tp_50"):
        np.testing.assert_array_equal(
            auto["geds"]["dsp"][name].nda, ref["geds"]["dsp"][name].nda
        )


def test_outputs_subset_and_n_entries(raw_file):
    path, _, _ = raw_file
    st = build_dsp(
        path, None, CONFIG, database=DB, outputs=["trapEmax"], n_entries=10
    )
    tb = st["geds"]["dsp"]
    assert list(tb.keys()) == ["trapEmax"]
    assert len(tb) == 10


def test_write_modes(raw_file, tmp_path):
    path, _, _ = raw_file
    out = str(tmp_path / "dsp.lh5")
    build_dsp(path, out, CONFIG, database=DB, outputs=["trapEmax"], n_entries=8)
    with pytest.raises(FileExistsError):
        build_dsp(path, out, CONFIG, database=DB, outputs=["trapEmax"])
    # overwrite
    build_dsp(
        path, out, CONFIG, database=DB, outputs=["trapEmax"], n_entries=8,
        write_mode="r",
    )
    assert len(lh5.read("geds/dsp", out)) == 8


SIPM_CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "configs", "sipm-pulse-finding.yaml"
)


def make_sipm_waveforms(n=24, nsamp=512, seed=21):
    """SPE-pulse trains on a noisy baseline."""
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 0.5, (n, nsamp))
    n_pulses = rng.integers(1, 5, n)
    for ev in range(n):
        for p in rng.choice(np.arange(30, nsamp - 60), n_pulses[ev], replace=False):
            t = np.arange(nsamp) - p
            w[ev] += np.where(t >= 0, 400.0 * (t / 8.0) * np.exp(-t / 8.0), 0.0)
    return w.astype("float32"), n_pulses


@pytest.fixture(scope="module")
def sipm_raw_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("spm") / "spms_raw.lh5")
    wf, n_pulses = make_sipm_waveforms()
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            )
        }
    )
    for ch in ("ch0", "ch1", "ch2"):
        lh5.write(tb, f"{ch}/raw", path)
    return path, n_pulses


def test_sipm_channelwise_vov(sipm_raw_file, tmp_path):
    """Channel-wise production with VectorOfVectors outputs
    (reference tests/test_build_dsp.py:230-264)."""
    path, n_pulses = sipm_raw_file
    out = str(tmp_path / "spms_dsp.lh5")
    chan_config = {
        "ch0/raw": SIPM_CONFIG,
        "ch1/raw": SIPM_CONFIG,
        "ch2/raw": SIPM_CONFIG,
    }
    build_dsp(
        path,
        out,
        {},
        n_entries=20,
        lh5_tables=list(chan_config.keys()),
        chan_config=chan_config,
        write_mode="r",
    )
    assert sorted(lh5.ls(out)) == ["ch0", "ch1", "ch2"]
    assert lh5.ls(out, "ch0/") == ["ch0/dsp"]
    energies = lh5.read("ch0/dsp/energies", out)
    assert isinstance(energies, lh5.VectorOfVectors)
    assert len(energies) == 20

    trig = lh5.read("ch0/dsp/trigger_pos", out)
    assert isinstance(trig, lh5.VectorOfVectors)
    # most events should find about the injected number of pulses
    found = np.array([len(trig[i]) for i in range(20)])
    assert np.abs(found - n_pulses[:20]).mean() < 1.5
