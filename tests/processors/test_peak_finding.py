"""Parity tests for the peak-finding kernel group.

Each test implements the reference's sequential algorithm in plain numpy
(the *oracle*, following ``get_multi_local_extrema.py`` /
``peak_snr_threshold.py`` / ``multi_t_filter.py`` /
``time_point_thresh.py:412`` semantics) and checks the scan/mask-based TPU
kernels against it on randomized waveforms — the analog of the reference's
``compare_numba_vs_python`` oracle (``tests/conftest.py:62-180``).
"""

import numpy as np
import pytest

from dspeed_tpu import processors as dp


def peakdet_oracle(w, dmax, dmin, amax, amin, m_max, m_min, reverse=False):
    """Single-direction Billauer sweep, reference loop semantics."""
    n = len(w)
    order = range(n - 1, -1, -1) if reverse else range(n)
    start = n - 1 if reverse else 0
    vt_max = np.full(m_max, np.nan)
    vt_min = np.full(m_min, np.nan)
    nmx = nmn = 0
    imax = imin = start
    find_max = True
    for i in order:
        if w[i] > w[imax]:
            imax = i
        if w[i] < w[imin]:
            imin = i
        if find_max:
            if w[i] < w[imax] - dmax and nmx < m_max and w[imax] > amax:
                vt_max[nmx] = imax
                nmx += 1
                imin = i
                find_max = False
        else:
            if w[i] > w[imin] + dmin and nmn < m_min and w[imin] < amin:
                vt_min[nmn] = imin
                nmn += 1
                imax = i
                find_max = True
    return vt_max, vt_min, nmx, nmn


def make_pulse_train(rng, n=512, n_pulses=4):
    w = rng.normal(0, 0.05, n)
    pos = np.sort(rng.choice(np.arange(50, n - 50), n_pulses, replace=False))
    for p in pos:
        t = np.arange(n) - p
        w += 5.0 * np.exp(-np.abs(t) / 10.0) * (t >= 0) * np.exp(-t / 40.0)
    return w


class TestGetMultiLocalExtrema:
    @pytest.mark.parametrize("direction", [0, 1])
    def test_single_sweep_parity(self, direction):
        rng = np.random.default_rng(3)
        m = 8
        for trial in range(5):
            w = make_pulse_train(rng).astype("float32")
            got_max, got_min, got_nmx, got_nmn = dp.get_multi_local_extrema(
                w[None], 1.0, 1.0, direction, 0.5, 0.1, dims={"m": m, "p": m}
            )
            exp_max, exp_min, exp_nmx, exp_nmn = peakdet_oracle(
                w, 1.0, 1.0, 0.5, 0.1, m, m, reverse=direction == 1
            )
            np.testing.assert_allclose(
                np.asarray(got_max)[0], exp_max, equal_nan=True
            )
            np.testing.assert_allclose(
                np.asarray(got_min)[0], exp_min, equal_nan=True
            )
            assert int(np.asarray(got_nmx)[0]) == exp_nmx
            assert int(np.asarray(got_nmn)[0]) == exp_nmn

    def test_and_or_modes(self):
        rng = np.random.default_rng(5)
        m = 8
        w = make_pulse_train(rng).astype("float64")
        l_max, l_min, _, _ = peakdet_oracle(w, 1.0, 1.0, 0.5, 0.1, m, m)
        r_max, r_min, _, _ = peakdet_oracle(w, 1.0, 1.0, 0.5, 0.1, m, m, True)

        got = dp.get_multi_local_extrema(
            w[None], 1.0, 1.0, 2, 0.5, 0.1, dims={"m": m, "p": m}
        )
        and_max = np.asarray(got[0])[0]
        expect_and = [v for v in l_max[~np.isnan(l_max)] if v in r_max]
        np.testing.assert_allclose(
            and_max[: len(expect_and)], expect_and, equal_nan=True
        )
        assert np.all(np.isnan(and_max[len(expect_and) :]))

        got = dp.get_multi_local_extrema(
            w[None], 1.0, 1.0, 3, 0.5, 0.1, dims={"m": m, "p": m}
        )
        or_max = np.asarray(got[0])[0]
        expect_or = np.unique(
            np.concatenate([l_max[~np.isnan(l_max)], r_max[~np.isnan(r_max)]])
        )[:m]
        np.testing.assert_allclose(
            or_max[: len(expect_or)], expect_or, equal_nan=True
        )

    def test_nan_poisoning(self):
        w = np.ones((1, 64), "float32")
        w[0, 5] = np.nan
        got = dp.get_multi_local_extrema(
            w, 1.0, 1.0, 0, 0.5, 0.1, dims={"m": 4, "p": 4}
        )
        assert np.all(np.isnan(np.asarray(got[0])))
        assert int(np.asarray(got[2])[0]) == 0


class TestPeakSnr:
    def test_parity(self):
        rng = np.random.default_rng(7)
        n, m, width, ratio = 256, 6, 10, 0.5
        w = make_pulse_train(rng, n=n).astype("float64") + 2.0
        idx = np.full(m, np.nan)
        peaks = np.sort(rng.choice(np.arange(20, n - 20), 4, replace=False))
        idx[:4] = peaks

        # oracle: reference loop
        exp = np.full(m, np.nan)
        k = 0
        for i in range(m):
            if not np.isnan(idx[i]):
                a = max(0, int(idx[i]) - width)
                b = min(n - 1, int(idx[i]) + width)
                mi = a
                for j in range(a, b):
                    if w[j] < w[mi]:
                        mi = j
                if abs(w[mi] / w[int(idx[i])]) < ratio:
                    exp[k] = idx[i]
                    k += 1

        got_idx, got_n = dp.peak_snr_threshold(w[None], idx[None], ratio, width)
        np.testing.assert_allclose(np.asarray(got_idx)[0], exp, equal_nan=True)
        assert int(np.asarray(got_n)[0]) == k

    def test_accel_compare_reduce_matches_gather(self, monkeypatch):
        """The TPU branch (windowed min / peak pickoff as broadcast compares
        fused into the sample reduction — gathers serialize on TPU) must be
        bit-identical to the CPU gather branch, including NaN candidates,
        window clipping at both edges, and empty windows."""
        import jax

        rng = np.random.default_rng(11)
        n, m, width, ratio = 200, 12, 10, 0.5
        w = make_pulse_train(rng, n=n).astype("float64") + 2.0
        w2 = w.copy()
        w2[37] = np.nan  # NaN inside some window
        for wf in (w, w2):
            idx = np.full(m, np.nan)
            # include edge candidates so both clips and the empty-window
            # (b <= a) path are exercised
            idx[:8] = [0, 3, n - 1, n - 5, 50, 90, 130, 170]
            ref = dp.peak_snr_threshold(wf[None], idx[None], ratio, width)
            monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
            got = dp.peak_snr_threshold(wf[None], idx[None], ratio, width)
            monkeypatch.undo()
            for r, g in zip(ref, got):
                np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


class TestMultiAFilter:
    def test_accel_pickoff_matches_gather(self, monkeypatch):
        """take_per_row's accelerator branch (compare-reduce pickoff) must
        be bit-identical to the CPU gather, including NaN candidates and
        out-of-range indices."""
        import jax

        rng = np.random.default_rng(3)
        w = make_pulse_train(rng, n=300).astype("float32")
        w[17] = np.nan
        idx = np.array([[0.0, 5.0, 299.0, 400.0, -3.0, np.nan, 17.0, 60.0]])
        ref = dp.multi_a_filter(w[None], idx)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        got = dp.multi_a_filter(w[None], idx)
        monkeypatch.undo()
        np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))


class TestMultiTFilter:
    def test_remove_duplicates(self):
        t_in = np.array([[5.0, 9.0, 9.0, np.nan]])
        vt_min = np.array([[7.0, 8.0, np.nan, np.nan]])
        (out,) = dp.remove_duplicates(t_in, vt_min)
        # duplicate at slot 2 replaced by vt_min[last matching i1] = vt_min[1]
        np.testing.assert_allclose(
            np.asarray(out)[0], [5.0, 9.0, 8.0, np.nan], equal_nan=True
        )

    def test_leading_zero_shift(self):
        t_in = np.array([[0.0, 4.0, np.nan, np.nan]])
        vt_min = np.full((1, 4), np.nan)
        (out,) = dp.remove_duplicates(t_in, vt_min)
        np.testing.assert_allclose(
            np.asarray(out)[0], [4.0, np.nan, np.nan, np.nan], equal_nan=True
        )

    def test_multi_t_filter_runs(self):
        rng = np.random.default_rng(11)
        w = make_pulse_train(rng).astype("float32")
        m = 6
        vmax, vmin, nmx, nmn = dp.get_multi_local_extrema(
            w[None], 1.0, 1.0, 0, 0.5, 0.1, dims={"m": m, "p": m}
        )
        (t_out,) = dp.multi_t_filter(w[None], 0.1, vmax, vmin)
        t = np.asarray(t_out)[0]
        vm = np.asarray(vmax)[0]
        valid = ~np.isnan(t)
        assert valid.sum() > 0
        # each leading edge is at or before its maximum
        assert np.all(t[valid] <= vm[valid])


class TestMultiAFilter:
    def test_gather(self):
        w = np.arange(32, dtype="float32")[None] * 2.0
        vt = np.array([[3.0, 10.0, np.nan, np.nan]])
        (out,) = dp.multi_a_filter(w, vt)
        np.testing.assert_allclose(
            np.asarray(out)[0], [6.0, 20.0, np.nan, np.nan], equal_nan=True
        )


def bi_level_oracle(w, pos_th, neg_th, gate, t_start, m):
    """Reference loop (``time_point_thresh.py:412``) in plain python."""
    is_above = False
    is_below = False
    crossed = False
    nc = 0
    pol = np.full(m, np.nan)
    trig = np.full(m, np.nan)
    pos_cand = neg_cand = 0
    for i in range(int(t_start), len(w) - 1):
        if is_below is not False and (w[i] <= 0 < w[i + 1]):
            crossed = True
            neg_cand = i
        if w[i] <= pos_th < w[i + 1]:
            if crossed and is_below is not False:
                if i - is_below < gate:
                    if nc < m:
                        trig[nc] = neg_cand
                        pol[nc] = 0
                    nc += 1
                else:
                    is_above = i
                is_below = False
                crossed = False
            else:
                is_above = i
        if is_above is not False and (w[i] >= 0 > w[i + 1]):
            crossed = True
            pos_cand = i
        if w[i] >= neg_th > w[i + 1]:
            if crossed and is_above is not False:
                if i - is_above < gate:
                    if nc < m:
                        trig[nc] = pos_cand
                        pol[nc] = 1
                    nc += 1
                else:
                    is_below = i
                is_above = False
                crossed = False
            else:
                is_below = i
    return nc, pol, trig


class TestBiLevel:
    def test_parity_bipolar_pulses(self):
        rng = np.random.default_rng(13)
        n, m = 512, 5
        for trial in range(5):
            # RC-CR2-like bipolar wiggles
            w = np.zeros(n)
            for p in np.sort(rng.choice(np.arange(40, n - 60), 3, replace=False)):
                t = np.arange(n) - p
                w += np.where(
                    t >= 0, 4.0 * np.sin(t / 12.0) * np.exp(-t / 30.0), 0.0
                )
            w += rng.normal(0, 0.05, n)
            exp_nc, exp_pol, exp_trig = bi_level_oracle(w, 1.0, -1.0, 100, 0, m)
            got_nc, got_pol, got_trig = dp.bi_level_zero_crossing_time_points(
                w[None].astype("float64"), 1.0, -1.0, 100, 0, dims={"m": m}
            )
            assert int(np.asarray(got_nc)[0]) == exp_nc, f"trial {trial}"
            np.testing.assert_allclose(
                np.asarray(got_trig)[0], exp_trig, equal_nan=True
            )
            np.testing.assert_allclose(
                np.asarray(got_pol)[0], exp_pol, equal_nan=True
            )
