"""Parity tests for the IIR/convolution/Fourier filter kernels against
reference-semantics numpy oracles (reference ``recursive_filter.py:21``,
``rc_cr2.py:17``, ``iir_filter.py``, ``fft.py``, ``dwt.py:23``)."""

import numpy as np
import pytest

from dspeed_tpu import processors as dp


def recursive_oracle(x, a, b, init_in, init_out):
    ys = []
    for i in range(len(x)):
        acc = 0.0
        for j in range(len(a)):
            acc += a[j] * (x[i - j] if j <= i else init_in)
        for j in range(1, len(b)):
            acc -= b[j] * (ys[i - j] if i - j >= 0 else init_out)
        ys.append(acc / b[0])
    return np.array(ys)


@pytest.fixture
def walk(rng):
    return np.cumsum(rng.normal(0, 1, (4, 256)), axis=1).astype("float64")


class TestRecursiveFilter:
    def test_first_order(self, walk):
        a, b = np.array([1.0]), np.array([1.0, -0.9])
        (y,) = dp.recursive_filter(walk, a, b, walk[..., 0], walk[..., 0])
        exp = np.stack(
            [recursive_oracle(w, a, b, w[0], w[0]) for w in walk]
        )
        np.testing.assert_allclose(np.asarray(y), exp, rtol=1e-10)

    def test_third_order_biquad(self, walk):
        a = np.array([0.2, 0.3, 0.1])
        b = np.array([1.0, -1.1, 0.5, -0.1])
        (y,) = dp.recursive_filter(walk, a, b, walk[..., 0], 0.0)
        exp = np.stack([recursive_oracle(w, a, b, w[0], 0.0) for w in walk])
        np.testing.assert_allclose(np.asarray(y), exp, rtol=1e-8, atol=1e-8)

    def test_nan_poisoning(self, walk):
        w = walk.copy()
        w[1, 10] = np.nan
        (y,) = dp.recursive_filter(
            w, np.array([1.0]), np.array([1.0, -0.5]), 0.0, 0.0
        )
        assert np.all(np.isnan(np.asarray(y)[1]))
        assert np.all(np.isfinite(np.asarray(y)[0]))


class TestRcCr2:
    def test_parity(self, walk):
        tau = 40.0
        (y,) = dp.rc_cr2(walk, tau)
        aa = np.exp(-1.0 / tau)

        def oracle(x):
            out = np.empty_like(x)
            out[:3] = x[:3]
            hist = [x[0], x[1], x[2]]
            for i in range(3, len(x)):
                v = (
                    3 * aa * hist[2]
                    - 3 * aa**2 * hist[1]
                    + aa**3 * hist[0]
                    + x[i]
                    - 2 * x[i - 1]
                    + x[i - 2]
                )
                out[i] = v
                hist = [hist[1], hist[2], v]
            return out

        exp = np.stack([oracle(w) for w in walk])
        np.testing.assert_allclose(np.asarray(y), exp, atol=1e-5)

    def test_step_response_bipolar(self):
        # RC-CR² of a step is bipolar with zero crossing after the peak
        w = np.zeros((1, 512), "float64")
        w[0, 100:] = 100.0
        (y,) = dp.rc_cr2(w, 20.0)
        y = np.asarray(y)[0]
        assert y.max() > 1 and y.min() < -1
        assert np.argmax(y) < np.argmin(y)


class TestIIRDesign:
    def test_lowpass_dc_gain(self, walk):
        kern = dp.iir_filter(0.1, 4, ftype="butter", btype="lowpass")
        const = np.full((2, 300), 7.0)
        (y,) = kern(const)
        # unit DC gain (init conditions make constants exact from sample 0)
        np.testing.assert_allclose(np.asarray(y), 7.0, rtol=1e-5)

    def test_notch_kills_tone(self):
        import scipy.signal as sg

        f0, fs = 0.25, 1.0
        t = np.arange(2048)
        tone = np.sin(2 * np.pi * f0 * t)[None].astype("float64")
        kern = dp.notch_filter(2 * f0, 0.02)  # q = freq/bandwidth = 25
        (y,) = kern(tone)
        # steady-state attenuation: tone mostly removed
        assert np.abs(np.asarray(y)[0, 500:]).max() < 0.1

    def test_bad_freq_raises(self):
        from dspeed_tpu.errors import DSPFatal

        with pytest.raises(DSPFatal):
            dp.iir_filter(1.5, 2)


class TestFourier:
    def test_fft_psd_ifft_roundtrip(self, walk):
        n = walk.shape[-1]
        (f,) = dp.fft(walk, dims={"m": n // 2 + 1})
        np.testing.assert_allclose(
            np.asarray(f), np.fft.rfft(walk, axis=-1), rtol=1e-9
        )
        (p,) = dp.psd(walk, dims={"m": n // 2 + 1})
        np.testing.assert_allclose(
            np.asarray(p), np.abs(np.fft.rfft(walk, axis=-1)) ** 2 / n, rtol=1e-9
        )
        (w2,) = dp.ifft(np.asarray(f), dims={"m": n})
        np.testing.assert_allclose(np.asarray(w2), walk, atol=1e-9)

    def test_size_contract(self, walk):
        from dspeed_tpu.errors import DSPFatal

        with pytest.raises(DSPFatal):
            dp.fft(walk, dims={"m": 5})


class TestConvolveExp:
    def test_matches_recursive(self, walk):
        tau = 30.0
        (y,) = dp.convolve_exp(walk, tau)
        rc = np.exp(-1.0 / tau)
        exp = np.stack(
            [
                recursive_oracle(w, [1.0], [1.0, -rc], w[0], w[0])
                for w in walk
            ]
        )
        np.testing.assert_allclose(np.asarray(y), exp, rtol=1e-8, atol=1e-8)


class TestGaussianAndDWT:
    def test_gaussian_matches_scipy(self, walk):
        from scipy.ndimage import gaussian_filter1d as sgf

        sigma, trunc = 3.0, 4.0
        m = 2 * int(trunc * sigma + 0.5) + 1
        (taps,) = dp.gaussian_filter1d(sigma, trunc, dims={"n": m})
        (g,) = dp.reflected_convolve_wf(
            walk, np.asarray(taps), dims={"p": walk.shape[-1]}
        )
        # numpy-reflect padding == scipy "mirror" mode
        np.testing.assert_allclose(
            np.asarray(g),
            sgf(walk, sigma, axis=-1, mode="mirror", truncate=trunc),
            atol=1e-10,
        )

    def test_haar_approx_detail(self, walk):
        (ca,) = dp.discrete_wavelet_transform(
            walk, 2, ord("h"), ord("a"), dims={"m": 64}
        )
        x = walk
        for _ in range(2):
            x = (x[..., ::2] + x[..., 1::2]) / np.sqrt(2)
        np.testing.assert_allclose(np.asarray(ca), x[..., :64], rtol=1e-10)

        (cd,) = dp.discrete_wavelet_transform(
            walk, 2, ord("h"), ord("d"), dims={"m": 64}
        )
        x = walk
        x = (x[..., ::2] + x[..., 1::2]) / np.sqrt(2)
        d = (x[..., ::2] - x[..., 1::2]) / np.sqrt(2)
        np.testing.assert_allclose(np.asarray(cd), d[..., :64], rtol=1e-10)


class TestWiener:
    def test_factory_and_apply(self, tmp_path, rng):
        from dspeed_tpu import lh5

        n = 256
        t = np.arange(n)
        sp = np.exp(-((t - 100.0) ** 2) / 50.0)
        noise = rng.normal(0, 0.1, n)
        st = lh5.Struct(
            {
                "spms": lh5.Struct(
                    {
                        "processed": lh5.Struct(
                            {
                                "superpulse": lh5.Array(sp),
                                "noise_wf": lh5.Array(noise),
                            }
                        )
                    }
                )
            }
        )
        path = str(tmp_path / "wiener.lh5")
        lh5.write(lh5.Array(sp), "spms/processed/superpulse", path)
        lh5.write(lh5.Array(noise), "spms/processed/noise_wf", path)
        kern = dp.wiener_filter([path])
        x = np.fft.fft(rng.normal(0, 1, (3, n)), axis=-1)
        (y,) = kern(x)
        assert np.asarray(y).shape == (3, n)
        # spectrum-underflow bins may produce non-finite taps (reference
        # divides PSDs with no guard); the bulk of the band must be finite
        assert np.isfinite(np.asarray(y).real).mean() > 0.9
