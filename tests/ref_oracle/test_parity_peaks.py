"""Reference-code parity: peak finding and histogram kernels.

Reference bodies: ``get_multi_local_extrema.py``, ``peak_snr_threshold.py``,
``multi_t_filter.py``, ``multi_a_filter.py``, ``histogram.py``,
``histogram_stats.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from .conftest import assert_ref_parity as parity
from .stubs import call_ref


@pytest.fixture
def pulse_batch(rng):
    """SiPM-like multi-pulse waveforms with one all-NaN row."""
    n, nsamp = 6, 512
    t = np.arange(nsamp, dtype=np.float64)
    w = np.zeros((n, nsamp))
    for i in range(n):
        for c in rng.integers(40, 480, size=rng.integers(2, 6)):
            a = rng.uniform(50, 400)
            w[i] += a * np.exp(-((t - c) ** 2) / (2 * 4.0**2))
    w += rng.normal(0, 1.0, size=w.shape)
    w[4] = np.nan
    return w


EXTREMA_KW = dict(
    dims={"m": 10, "p": 10},
    out_idx=(6, 7, 8, 9),
    out_dtypes=(np.float64, np.float64, np.uint32, np.uint32),
)


class TestGetMultiLocalExtrema:
    @pytest.mark.parametrize("direction", [0, 1, 3])
    def test_directions(self, pulse_batch, direction):
        parity(
            "get_multi_local_extrema",
            pulse_batch, 20.0, 20.0, direction, np.nan, np.nan,
            **EXTREMA_KW,
        )

    def test_abs_thresholds(self, pulse_batch):
        parity(
            "get_multi_local_extrema",
            pulse_batch, 20.0, 20.0, 0, 350.0, -5.0,
            **EXTREMA_KW,
        )

    def test_and_mode_maxima_only(self, pulse_batch):
        # Mode 2's minima block in the reference indexes the *max* arrays by
        # the minima NaN masks (get_multi_local_extrema.py:255-256), a
        # copy-paste slip; dspeed_tpu diverges deliberately (documented in
        # peak_finding.py). Compare maxima outputs + counts only.
        from dspeed_tpu import processors as dp

        exp = call_ref(
            "get_multi_local_extrema",
            pulse_batch, 20.0, 20.0, 2, np.nan, np.nan,
            **EXTREMA_KW,
        )
        got = dp.get_multi_local_extrema(
            pulse_batch, 20.0, 20.0, 2, np.nan, np.nan,
            dims={"m": 10, "p": 10},
        )
        np.testing.assert_allclose(
            np.asarray(got[0], dtype=np.float64), exp[0], equal_nan=True
        )
        np.testing.assert_array_equal(
            np.asarray(got[2]).astype(np.uint32), exp[2]
        )


class TestPeakPostprocessing:
    @pytest.fixture
    def found_peaks(self, pulse_batch):
        exp = call_ref(
            "get_multi_local_extrema",
            np.nan_to_num(pulse_batch), 20.0, 20.0, 0, np.nan, np.nan,
            **EXTREMA_KW,
        )
        return exp[0], exp[1]  # vt_max, vt_min (NaN-padded)

    def test_multi_a_filter(self, pulse_batch, found_peaks):
        vt_max, _ = found_peaks
        parity("multi_a_filter", np.nan_to_num(pulse_batch), vt_max)

    def test_peak_snr_threshold(self, pulse_batch, found_peaks):
        vt_max, _ = found_peaks
        parity(
            "peak_snr_threshold",
            np.nan_to_num(pulse_batch), vt_max, 0.8, 10.0,
            out_dtypes=(np.float64, np.uint32),
        )

    def test_multi_t_filter(self, pulse_batch, found_peaks):
        vt_max, vt_min = found_peaks
        parity(
            "multi_t_filter",
            np.nan_to_num(pulse_batch), 15.0, vt_max, vt_min,
            dims={"m": 10},
            out_args=1,
        )

    def test_remove_duplicates(self, found_peaks):
        vt_max, vt_min = found_peaks
        t_in = vt_max.copy()
        t_in[:, 1] = t_in[:, 0]  # force duplicates
        parity("remove_duplicates", t_in, vt_min)


class TestHistogram:
    def test_histogram(self, pulse_batch):
        parity(
            "histogram", pulse_batch,
            dims={"m": 32, "p": 33}, out_args=2,
        )

    def test_histogram_around_mode(self, pulse_batch):
        # reference raises DSPFatal on NaN input (histogram.py) — a per-event
        # raise dspeed_tpu replaces with NaN outputs (jit convention); parity
        # on clean rows only.
        parity(
            "histogram_around_mode", np.nan_to_num(pulse_batch), np.nan, 2.0,
            dims={"m": 32, "p": 33}, out_args=2,
        )

    def test_histogram_around_mode_center(self, pulse_batch):
        parity(
            "histogram_around_mode", np.nan_to_num(pulse_batch), 10.0, 2.0,
            dims={"m": 16, "p": 17}, out_args=2,
        )


@pytest.fixture
def hist_fixture(rng):
    """A peaked histogram (weights, edges) batch, one NaN row."""
    n, nb = 6, 48
    edges = np.linspace(-10, 10, nb + 1)
    w = np.zeros((n, nb))
    for i in range(n):
        x = rng.normal(rng.uniform(-3, 3), rng.uniform(0.5, 2.0), size=400)
        w[i], _ = np.histogram(x, bins=edges)
    # (no NaN row: the reference raises DSPFatal on NaN weights; dspeed_tpu's
    # NaN-poisoning convention is covered by its own kernel tests)
    edges_b = np.broadcast_to(edges, (n, nb + 1)).copy()
    return w.astype(np.float64), edges_b


class TestHistogramStats:
    @pytest.mark.parametrize("max_in", [np.nan, 1.5])
    def test_histogram_stats(self, hist_fixture, max_in):
        w, e = hist_fixture
        parity(
            "histogram_stats", w, e, max_in,
            out_idx=(2, 3, 4),
        )

    @pytest.mark.parametrize("width_type", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("skip_zeroes", [0, 1])
    def test_histogram_peakstats(self, hist_fixture, width_type, skip_zeroes):
        w, e = hist_fixture
        parity(
            "histogram_peakstats", w, e, np.nan, skip_zeroes, width_type,
        )
