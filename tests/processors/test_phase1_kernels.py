"""Parity tests for the phase-1 kernel set against reference-loop oracles
(reference ``trap_filters.py``, ``pole_zero.py``, ``time_point_thresh.py:20``,
``fixed_time_pickoff.py``, ``moving_windows.py``, ``windower.py``,
``upsampler.py``, ``misc`` processors) — the ``compare_numba_vs_python``
analog for the kernels the flagship chain exercises only end-to-end."""

import numpy as np
import pytest

from dspeed_tpu import processors as dp
from dspeed_tpu.errors import DSPFatal


@pytest.fixture
def wf(rng):
    return np.cumsum(rng.normal(0, 1, (4, 256)), axis=1).astype("float64")


class TestTrapFilters:
    def test_trap_filter_oracle(self, wf):
        rise, flat = 10, 4
        (got,) = dp.trap_filter(wf, rise, flat)

        def oracle(w):
            S = np.concatenate([[0.0], np.cumsum(w)])
            out = np.empty_like(w)
            for i in range(len(w)):
                s0 = S[i + 1] - S[max(i + 1 - rise, 0)]
                j = i - rise - flat
                s1 = S[max(j + 1, 0)] - S[max(j + 1 - rise, 0)]
                out[i] = s0 - s1
            return out

        exp = np.stack([oracle(w) for w in wf])
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9, atol=1e-9)

    def test_trap_norm_is_scaled(self, wf):
        (t,) = dp.trap_filter(wf, 10, 4)
        (tn,) = dp.trap_norm(wf, 10, 4)
        np.testing.assert_allclose(np.asarray(tn), np.asarray(t) / 10, rtol=1e-12)

    def test_trap_pickoff(self, wf):
        rise, flat = 8, 3
        (full,) = dp.trap_filter(wf, rise, flat)
        for t in (100.0, 37.0):
            (got,) = dp.trap_pickoff(wf, rise, flat, t)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(full)[:, int(t)] / rise, rtol=1e-9
            )
        # non-integer pickoff -> NaN
        (got,) = dp.trap_pickoff(wf, rise, flat, 50.5)
        assert np.all(np.isnan(np.asarray(got)))

    def test_too_wide_raises(self, wf):
        with pytest.raises(DSPFatal):
            dp.trap_filter(wf, 200, 100)

    def test_asym_trap(self, wf):
        rise, flat, fall = 10, 4, 20
        (got,) = dp.asym_trap_filter(wf, rise, flat, fall)

        def oracle(w):
            S = np.concatenate([[0.0], np.cumsum(w)])
            out = np.empty_like(w)
            for i in range(len(w)):
                s0 = (S[i + 1] - S[max(i + 1 - rise, 0)]) / rise
                j = i - rise - flat
                s1 = (S[max(j + 1, 0)] - S[max(j + 1 - fall, 0)]) / fall
                out[i] = s0 - s1
            return out

        exp = np.stack([oracle(w) for w in wf])
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9, atol=1e-9)


class TestPoleZero:
    def test_step_recovery(self):
        # the reference's canonical test: pz of a tau-decay is a step
        # (reference tests/processors/test_pole_zero.py:33-48)
        n, tau, t0, amp = 1000, 250.0, 100, 500.0
        t = np.arange(n)
        wf = np.where(t >= t0, amp * np.exp(-(t - t0) / tau), 0.0)
        (out,) = dp.pole_zero(wf[None].astype("float64"), tau)
        out = np.asarray(out)[0]
        np.testing.assert_allclose(out[t0:], amp, rtol=1e-7)
        (outf,) = dp.pole_zero(wf[None].astype("float32"), tau)
        np.testing.assert_allclose(np.asarray(outf)[0][t0:], amp, rtol=1e-6)

    def test_double_pole_zero_recursion_oracle(self, rng):
        # exact parity with the reference recursion (pole_zero.py:159-199)
        tau1, tau2, frac = 400.0, 40.0, 0.8
        w = np.cumsum(rng.normal(0, 1, (3, 512)), 1)
        (out,) = dp.double_pole_zero(w, tau1, tau2, frac)
        a, b = np.exp(-1 / tau1), np.exp(-1 / tau2)
        d1 = frac * b - frac * a - b - 1
        d2 = -(frac * b - frac * a - b)
        n1, n2 = -(a + b), a * b

        def oracle(x):
            y = np.empty_like(x)
            y[0], y[1] = x[0], x[1]
            t0, t1 = x[0], x[1]
            for i in range(2, len(x)):
                t2 = x[i] + n1 * x[i - 1] + n2 * x[i - 2] - d1 * t1 - d2 * t0
                y[i] = t2
                t0, t1 = t1, t2
            return y

        exp = np.stack([oracle(x) for x in w])
        np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-7, atol=1e-7)

    def test_nan_poison(self, wf):
        w = wf.copy()
        w[2, 7] = np.nan
        (out,) = dp.pole_zero(w, 100.0)
        assert np.all(np.isnan(np.asarray(out)[2]))
        assert np.all(np.isfinite(np.asarray(out)[0]))


class TestTimePointThresh:
    def test_forward_backward_oracle(self, rng):
        n = 200
        for trial in range(10):
            w = np.cumsum(rng.normal(0, 1, n))
            a = float(rng.uniform(w.min(), w.max()))
            ts = int(rng.integers(0, n))
            for fwd in (0, 1):
                (got,) = dp.time_point_thresh(
                    w[None].astype("float64"), a, float(ts), fwd
                )
                exp = np.nan
                if fwd:
                    for i in range(ts, n - 1):
                        if (w[i] <= a < w[i + 1]) or (w[i] >= a > w[i + 1]):
                            exp = i
                            break
                else:
                    for i in range(ts, 0, -1):
                        if (w[i - 1] < a <= w[i]) or (w[i - 1] > a >= w[i]):
                            exp = i
                            break
                np.testing.assert_allclose(
                    np.asarray(got)[0], exp, equal_nan=True
                )

    def test_interpolated_modes(self, rng):
        w = np.linspace(0.0, 10.0, 101)[None]
        # threshold 2.5 crossed between samples 25 exactly
        # crossing of 2.55 on a 0..10 ramp lies between samples 25 and 26
        (ti,) = dp.interpolated_time_point_thresh(w, 2.55, 50.0, 0, ord("i"))
        (ta,) = dp.interpolated_time_point_thresh(w, 2.55, 50.0, 0, ord("a"))
        (tn,) = dp.interpolated_time_point_thresh(w, 2.55, 50.0, 0, ord("n"))
        (tl,) = dp.interpolated_time_point_thresh(w, 2.55, 50.0, 0, ord("l"))
        assert np.asarray(ti)[0] == 25  # index before crossing
        assert np.asarray(ta)[0] == 26  # 'a' = index after crossing
        assert np.asarray(tn)[0] == 25.5
        assert np.asarray(tl)[0] == pytest.approx(25.5)


class TestFixedTimePickoff:
    def test_modes(self):
        w = np.arange(64, dtype="float64")[None] ** 2
        t = 10.4
        (vi,) = dp.fixed_time_pickoff(w, 10.0, ord("i"))
        assert np.asarray(vi)[0] == 100.0
        (vn,) = dp.fixed_time_pickoff(w, t, ord("n"))
        assert np.asarray(vn)[0] == 100.0
        (vf,) = dp.fixed_time_pickoff(w, t, ord("f"))
        assert np.asarray(vf)[0] == 100.0
        (vc,) = dp.fixed_time_pickoff(w, t, ord("c"))
        assert np.asarray(vc)[0] == 121.0
        (vl,) = dp.fixed_time_pickoff(w, t, ord("l"))
        assert np.asarray(vl)[0] == pytest.approx(100 + 0.4 * 21)
        # 'i' with non-integer index -> NaN (engine-level divergence doc'd)
        (vbad,) = dp.fixed_time_pickoff(w, t, ord("i"))
        assert np.isnan(np.asarray(vbad)[0])
        # out of range -> NaN
        (voob,) = dp.fixed_time_pickoff(w, 1000.0, ord("l"))
        assert np.isnan(np.asarray(voob)[0])

    def test_static_t_matches_array_t(self):
        # the static-index fast path (config-constant pickoff time ->
        # direct column slices, no compare-reduce) must match the
        # per-event array route, including clip/OOR/NaN edges and the
        # near-integer floor-cast case (10.99999999999 rounds to 11.0 in
        # f32 on BOTH routes). Bit-identical under x64; the two compiled
        # graphs fuse/FMA differently under f32, so ~1-ulp there.
        import jax

        exact = jax.config.jax_enable_x64
        rng = np.random.default_rng(7)
        w = rng.normal(size=(8, 64)).astype("float64")
        ts = (10.4, 10.0, 0.0, 0.3, 62.6, 63.0, -1.0, 64.0, np.nan,
              10.99999999999)
        for t in ts:
            tarr = np.full((8,), t, dtype="float64")
            for m in "infclhs":
                (vs,) = dp.fixed_time_pickoff(w, t, ord(m))
                (va,) = dp.fixed_time_pickoff(w, tarr, ord(m))
                if exact:
                    np.testing.assert_array_equal(
                        np.asarray(vs), np.asarray(va), err_msg=f"{m} t={t}"
                    )
                else:
                    np.testing.assert_allclose(
                        np.asarray(vs), np.asarray(va), rtol=1e-6,
                        err_msg=f"{m} t={t}"
                    )


class TestMovingWindows:
    def test_moving_window_left_oracle(self, wf):
        ln = 8
        (got,) = dp.moving_window_left(wf, ln)

        def oracle(w):
            out = np.empty_like(w)
            acc = 0.0
            for i in range(len(w)):
                if i < ln:
                    # reference ramp: average-so-far behavior
                    acc += w[i]
                    out[i] = w[0] + (acc - (i + 1) * w[0]) / ln
                else:
                    acc += w[i] - w[i - ln]
                    out[i] = acc / ln
            return out

        exp = np.stack([oracle(w) for w in wf])
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8, atol=1e-8)

    def test_right_is_reversed_left(self, wf):
        (r,) = dp.moving_window_right(wf, 8)
        (l,) = dp.moving_window_left(wf[:, ::-1].copy(), 8)
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(l)[:, ::-1], rtol=1e-10
        )

    def test_avg_current(self, wf):
        ln = 5
        m = wf.shape[1] - ln
        (got,) = dp.avg_current(wf, ln, dims={"m": m})
        exp = (wf[:, ln:] - wf[:, :-ln]) / ln
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9)


class TestWindowerUpsampler:
    def test_windower_center_and_edges(self, wf):
        m = 32
        (got,) = dp.windower(wf, 100.0, dims={"m": m})
        np.testing.assert_allclose(np.asarray(got), wf[:, 100:132], rtol=1e-12)
        # negative start: NaN padding at the left edge
        (got2,) = dp.windower(wf, -5.0, dims={"m": m})
        assert np.all(np.isnan(np.asarray(got2)[:, :5]))
        np.testing.assert_allclose(
            np.asarray(got2)[:, 5:], wf[:, : m - 5], rtol=1e-12
        )

    def test_upsampler(self, wf):
        # reference semantics: centered replication, NaN at uncovered edges
        # (upsampler.py:40-44: t_out = t_in*up - floor(up/2))
        up = 4
        m = wf.shape[1] * up
        (got,) = dp.upsampler(wf, float(up), dims={"m": m})
        got = np.asarray(got)
        exp = np.full_like(got, np.nan)
        for t_in in range(wf.shape[1]):
            t_out = t_in * up - up // 2
            for k in range(up):
                j = t_out + k
                if 0 <= j < m:
                    exp[:, j] = wf[:, t_in]
        np.testing.assert_allclose(got, exp, rtol=1e-12, equal_nan=True)

    def test_interpolating_upsampler_linear(self):
        w = np.arange(16, dtype="float64")[None]
        (got,) = dp.interpolating_upsampler(w, ord("l"), dims={"m": 64})
        got = np.asarray(got)[0]
        # linear interpolation of a ramp is a finer ramp; the last input
        # sample is held at the right edge (no sample to interpolate toward)
        np.testing.assert_allclose(got[:61], np.arange(61) * 0.25, rtol=1e-9)
        np.testing.assert_allclose(got[61:], 15.0, rtol=1e-12)


class TestMisc:
    def test_time_over_threshold(self, wf):
        (got,) = dp.time_over_threshold(wf, 0.0)
        exp = (wf > 0).sum(axis=1).astype("float64")
        np.testing.assert_array_equal(np.asarray(got), exp)

    def test_saturation(self):
        # the reference's high rail is 2**bits - bits (saturation.py:69)
        hi = 2**8 - 8
        w = np.array([[0.0, 0, 5, hi, hi, 128, hi]])
        n_lo, n_hi = dp.saturation(w, 8.0)
        assert np.asarray(n_lo)[0] == 2
        assert np.asarray(n_hi)[0] == 3

    def test_presum(self, wf):
        m = wf.shape[1] // 4
        ps_fact, out = dp.presum(wf, 1.0, dims={"m": m})
        np.testing.assert_array_equal(np.asarray(ps_fact), 4.0)
        exp = wf.reshape(4, m, 4).sum(axis=2) / 4
        np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-6)
        ps_fact, out = dp.presum(wf, 0.0, dims={"m": m})
        np.testing.assert_allclose(
            np.asarray(out), wf.reshape(4, m, 4).sum(axis=2), rtol=1e-6
        )

    def test_log_check(self, wf):
        pos = np.abs(wf) + 1.0
        (got,) = dp.log_check(pos)
        np.testing.assert_allclose(np.asarray(got), np.log(pos), rtol=1e-12)
        neg = pos.copy()
        neg[1, 3] = -1.0
        (got2,) = dp.log_check(neg)
        assert np.all(np.isnan(np.asarray(got2)[1]))

    def test_sort(self, wf):
        (got,) = dp.sort(wf)
        np.testing.assert_array_equal(np.asarray(got), np.sort(wf, axis=1))

    def test_min_max_norm(self, wf):
        mn, mx = wf.min(1), wf.max(1)
        (got,) = dp.min_max_norm(wf, mn, mx)
        denom = np.maximum(np.abs(mn), np.abs(mx))
        np.testing.assert_allclose(np.asarray(got), wf / denom[:, None], rtol=1e-9)

    def test_linear_slope_fit(self, rng):
        slope, icpt = 0.5, 10.0
        x = np.arange(128)
        w = (icpt + slope * x)[None] + rng.normal(0, 1e-9, (3, 128))
        mean, std, got_slope, got_icpt = dp.linear_slope_fit(w)
        np.testing.assert_allclose(np.asarray(got_slope), slope, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got_icpt), icpt, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(mean), w.mean(1), rtol=1e-9)


def test_window_rows_matches_gather(rng):
    """The TPU log-shift window path must agree with take_along_axis."""
    import jax.numpy as jnp

    from dspeed_tpu.processors.windower import _window_rows

    n, m = 257, 33  # non-power-of-two length
    w = rng.normal(size=(16, n)).astype(np.float32)
    beg = np.array([0, 1, 5, 100, 200, 224, 255, 256, -1, -5, -32, -33,
                    13, 77, 150, 211], np.int32)
    got = np.asarray(_window_rows(jnp.asarray(w), jnp.asarray(beg), n, m))
    idx = (beg[:, None] + np.arange(m)) % n
    want = np.take_along_axis(w, idx, axis=-1)
    np.testing.assert_array_equal(got, want)


def test_upsampler_integer_ratio_matches_gather_map(rng):
    """The integer-ratio repeat path must equal the general gather map."""
    import dspeed_tpu.processors as dp

    def oracle(w, up, m):
        n = w.shape[-1]
        src = np.full(m, -1, "int32")
        width = int(up)
        half = int(np.floor(up / 2))
        for t in range(n):
            t0 = int(t * up - half)
            lo, hi = max(t0, 0), min(t0 + width, m)
            if lo < hi:
                src[lo:hi] = t
        out = np.where(src >= 0, w[..., np.where(src >= 0, src, 0)], np.nan)
        return out.astype(w.dtype)

    for n, up, m in [(301, 16.0, 4784), (300, 16.0, 4816), (50, 4.0, 210),
                     (64, 3.0, 192), (40, 2.5, 100)]:
        w = rng.normal(size=(6, n)).astype(np.float32)
        (got,) = dp.upsampler(w, up, dims={"m": m})
        np.testing.assert_array_equal(np.asarray(got), oracle(w, up, m),
                                      err_msg=f"n={n} up={up} m={m}")
