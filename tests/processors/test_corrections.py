"""Parity tests for corrections/alignment/injection kernels
(reference ``inl_correction.py``, ``wf_correction.py``, ``wf_alignment.py``,
``get_wf_centroid.py``, ``pulse_injector.py``, ``pmt_pulse_injector.py``)."""

import numpy as np

from dspeed_tpu import processors as dp


def test_inl_correction(rng):
    codes = rng.integers(0, 50, (2, 64)).astype("int32")
    inl = rng.normal(0, 0.1, 50)
    (y,) = dp.inl_correction(codes, inl)
    np.testing.assert_allclose(np.asarray(y), codes + inl[codes])
    # out-of-range code poisons the event
    bad = codes.copy()
    bad[0, 3] = 99
    (y2,) = dp.inl_correction(bad, inl)
    assert np.all(np.isnan(np.asarray(y2)[0]))
    assert np.all(np.isfinite(np.asarray(y2)[1]))


def test_inl_correction_batched_inl_nan_is_per_event(rng):
    """A NaN in ONE event's INL table (batched inl) poisons only that event;
    a NaN in a shared 1-D table poisons all (round-2 review finding)."""
    codes = rng.integers(0, 50, (3, 64)).astype("int32")
    inl = np.tile(rng.normal(0, 0.1, 50), (3, 1))
    inl[1, 7] = np.nan
    (y,) = dp.inl_correction(codes, inl)
    y = np.asarray(y)
    assert np.all(np.isfinite(y[0])) and np.all(np.isfinite(y[2]))
    assert np.all(np.isnan(y[1]))
    # shared 1-D table with NaN: every event poisoned
    inl1 = rng.normal(0, 0.1, 50)
    inl1[3] = np.nan
    (y2,) = dp.inl_correction(codes, inl1)
    assert np.all(np.isnan(np.asarray(y2)))


def test_wf_correction(rng):
    w = rng.normal(0, 1, (3, 128)).astype("float64")
    corr = rng.normal(0, 1, 30)
    (y,) = dp.wf_correction(w, corr, 10, 40)
    exp = w.copy()
    exp[:, 10:40] -= corr[:30]
    np.testing.assert_allclose(np.asarray(y), exp)


def test_inject_sig_pulse(rng):
    w = rng.normal(0, 1, (3, 128)).astype("float64")
    (y,) = dp.inject_sig_pulse(w, 30.0, 10.0, 5.0, 100.0)
    t = np.arange(128)
    rise = 4 * np.log(99) / 10.0
    exp = w + 5.0 / (1 + np.exp(-rise * (t - 35.0))) * np.exp(-(t - 30) / 100.0)
    np.testing.assert_allclose(np.asarray(y), exp, rtol=1e-12)


def test_inject_exp_pulse(rng):
    w = rng.normal(0, 1, (3, 128)).astype("float64")
    (y,) = dp.inject_exp_pulse(w, 30.0, 10.0, 5.0, 100.0)
    p = np.zeros(128)
    for t in range(128):
        if t <= 30:
            p[t] = 5.0 * np.exp((t - 40) / 10.0) * np.exp(-(t - 30) / 100.0)
        elif t > 40:
            p[t] = 5.0 * np.exp(-(t - 30) / 100.0)
    np.testing.assert_allclose(np.asarray(y), w + p, rtol=1e-12)


def test_inject_gumbel(rng):
    w = rng.normal(0, 1, (2, 128)).astype("float64")
    (y,) = dp.inject_gumbel(w, 3.0, 20.0, 4.0)
    t = np.arange(128)
    mu = 28.0
    z = (t - mu) / 4.0
    g = (3.0 / 4.0) * np.exp(-(z + np.exp(-z)))
    g[(t < 20) | (t >= mu + 32)] = 0
    np.testing.assert_allclose(np.asarray(y), w + g, rtol=1e-12)


def test_inject_general_logistic(rng):
    w = rng.normal(0, 1, (2, 128)).astype("float64")
    (y,) = dp.inject_general_logistic(w, 5.0, 30.0, 10.0, 2.0, 3.0, 100.0)
    t = np.arange(128)
    rise = 4 * np.log(99) / 10.0
    p = 5.0 / (1 + 2.0 * np.exp(-rise * (t - 35.0))) ** (1 / 3.0) * np.exp(
        -(t - 30) / 100.0
    )
    np.testing.assert_allclose(np.asarray(y), w + p, rtol=1e-12)


def test_wf_alignment(rng):
    w = rng.normal(0, 1, (3, 128)).astype("float64")
    (y,) = dp.wf_alignment(w, 60.0, 5.0, 40, dims={"m": 40})
    np.testing.assert_allclose(np.asarray(y), w[:, 40:80])
    # centroid past the right edge falls back to the first `size` samples
    (y2,) = dp.wf_alignment(w, 120.0, 5.0, 40, dims={"m": 40})
    np.testing.assert_allclose(np.asarray(y2), w[:, :40])


def test_get_wf_centroid():
    # step-convolution-like ramp crossing zero mid-window
    conv = np.linspace(-1.0, 1.0, 128)[None]
    (c,) = dp.get_wf_centroid(conv, 2.0)
    rel = conv[0, 0:127]
    c_a = np.where(rel > 0)[0][0] + 0 + 2
    c_b = np.where(rel < 0)[0][-1] + 0 + 2
    assert np.asarray(c)[0] == np.round((c_a + c_b) / 2)
