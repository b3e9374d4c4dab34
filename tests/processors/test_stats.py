"""Parity tests for fits/histograms against reference-semantics oracles
(reference ``poly_fit.py``, ``soft_pileup_corr.py``, ``histogram.py``,
``histogram_stats.py``)."""

import numpy as np
import pytest

from dspeed_tpu import processors as dp


class TestPolyFit:
    def test_fit_recovers_poly(self, rng):
        n = 200
        i = np.arange(n)
        coefs = np.array([3.0, -0.5, 0.01])
        w = (coefs[0] + coefs[1] * i + coefs[2] * i**2)[None] + rng.normal(
            0, 1e-6, (4, n)
        )
        kern = dp.poly_fit(n, 2)
        (pars,) = kern(w.astype("float64"))
        np.testing.assert_allclose(
            np.asarray(pars), np.broadcast_to(coefs, (4, 3)), rtol=1e-4
        )

    def test_poly_diff_oracle(self, rng):
        n = 64
        w = rng.normal(0, 1, (3, n)).astype("float64")
        pars = np.array([[0.5, 0.01], [1.0, -0.02], [0.0, 0.0]])
        mean, rms = dp.poly_diff(w, pars)
        i = np.arange(n)
        for b in range(3):
            resid = w[b] - (pars[b, 0] + pars[b, 1] * i)
            exp_mean = np.sum(resid / (i + 1))
            exp_rms = np.sqrt(np.sum(resid**2) / (n - 1))
            assert np.asarray(mean)[b] == pytest.approx(exp_mean, rel=1e-10)
            assert np.asarray(rms)[b] == pytest.approx(exp_rms, rel=1e-10)


class TestSoftPileup:
    def test_recovers_exponential(self, rng):
        n, tau = 1000, 500.0
        i = np.arange(n)
        a, b = 50.0, 300.0
        w = (a * np.exp(-i / tau) + b)[None] + rng.normal(0, 0.01, (4, n))
        (out,) = dp.soft_pileup_corr(w.astype("float64"), 800, tau)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=0.1)

    def test_fixed_baseline(self, rng):
        n, tau = 1000, 500.0
        i = np.arange(n)
        w = (50.0 * np.exp(-i / tau) + 300.0)[None] + rng.normal(0, 0.01, (2, n))
        (out,) = dp.soft_pileup_corr_bl(w.astype("float64"), 800, tau, 300.0)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=0.1)


def hist_oracle(w, m):
    wf_min, wf_max = w.min(), w.max()
    delta = (wf_max - wf_min) / m
    borders = np.linspace(wf_min, wf_max, m + 1)
    weights = np.zeros(m)
    if delta == 0:
        return weights, borders
    for x in w:
        if x == wf_max:
            continue
        weights[int(np.floor((x - borders[0]) / delta))] += 1
    return weights, borders


class TestHistogram:
    def test_parity(self, rng):
        w = rng.normal(100, 10, (3, 500)).astype("float64")
        weights, borders = dp.histogram(w, dims={"m": 50, "p": 51})
        for b in range(3):
            exp_w, exp_b = hist_oracle(w[b], 50)
            np.testing.assert_allclose(np.asarray(weights)[b], exp_w)
            np.testing.assert_allclose(np.asarray(borders)[b], exp_b, rtol=1e-12)

    def test_around_mode(self, rng):
        w = np.round(rng.normal(1000, 5, (2, 800))).astype("float64")
        weights, borders = dp.histogram_around_mode(
            w, np.nan, 1.0, dims={"m": 31, "p": 32}
        )
        weights = np.asarray(weights)
        borders = np.asarray(borders)
        for b in range(2):
            # total counts within the window
            inside = (w[b] >= borders[b, 0]) & (w[b] < borders[b, -1])
            assert weights[b].sum() == inside.sum()
            # the mode bin is centered
            kmax = np.argmax(weights[b])
            center = borders[b, kmax] + 0.5
            vals, counts = np.unique(w[b], return_counts=True)
            assert center == vals[np.argmax(counts)]

    def test_accel_compare_reduce_matches_scatter(self, rng, monkeypatch):
        """The TPU branch of _scatter_hist (broadcast-compare fused into the
        sample reduction — scatter-add lowers to a sort loop on TPU) must be
        exact-integer-identical to the CPU scatter branch."""
        import jax

        w = rng.normal(0, 5, (7, 300))
        wt0, bo0 = dp.histogram(w, dims={"m": 100, "p": 101})
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        wt1, bo1 = dp.histogram(w, dims={"m": 100, "p": 101})
        np.testing.assert_array_equal(np.asarray(wt0), np.asarray(wt1))
        np.testing.assert_array_equal(np.asarray(bo0), np.asarray(bo1))

    def test_given_center(self, rng):
        w = rng.normal(50, 3, (1, 400)).astype("float64")
        weights, borders = dp.histogram_around_mode(
            w, 50.0, 2.0, dims={"m": 11, "p": 12}
        )
        b = np.asarray(borders)[0]
        # center 50 sits in the middle bin's center
        mid = 11 // 2
        assert (b[mid] + b[mid + 1]) / 2 == pytest.approx(50.0)


class TestHistogramStats:
    def test_auto_mode_and_hwhm(self):
        weights = np.array([[0.0, 1, 3, 10, 4, 2, 1, 0]])
        edges = np.arange(9, dtype="float64")[None] * 2.0
        idx, mode, fwhm = dp.histogram_stats(weights, edges, np.nan)
        assert int(np.asarray(idx)[0]) == 3
        assert np.asarray(mode)[0] == 6.0
        # right walk: first w<=5,!=0 at i=4 (w=4): |6-8|=2; no left hit
        assert np.asarray(fwhm)[0] == 2.0

    def test_peakstats_fwhm(self):
        weights = np.array([[0.0, 1, 3, 10, 4, 2, 1, 0]])
        edges = np.arange(9, dtype="float64")[None] * 2.0
        mode, width = dp.histogram_peakstats(weights, edges, np.nan, 0, 0)
        # mode = center of bin 3 = 7.0
        assert np.asarray(mode)[0] == 7.0
        # right: first w<=5 from i=3 -> i=4 (w=4): |7-8|=1
        # left: first from i=3 down with w<=5 -> i=2 (w=3): right edge 6: |7-6|=1
        assert np.asarray(width)[0] == 2.0
