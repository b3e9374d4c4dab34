"""Reference-code parity: convolutions, Fourier kernels, recursive filters,
and filter-kernel generators.

Each test runs the reference's actual kernel body (loaded unmodified via the
numba stub) and the dspeed_tpu JAX kernel on the same inputs and asserts
allclose with NaN equality. Reference bodies:
``/root/reference/src/dspeed/processors/{convolutions,fft,pole_zero,
recursive_filter,kernels,energy_kernels,gaussian_filter1d,dwt}.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from .conftest import assert_ref_parity as parity


def _ramp_kernel(m=16):
    k = np.arange(1.0, m + 1.0)
    return k / k.sum()


class TestConvolve:
    @pytest.mark.parametrize("mode", ["f", "v", "s"])
    def test_convolve_wf(self, wf_batch, mode):
        n, m = wf_batch.shape[-1], 16
        p = {"f": n + m - 1, "v": n - m + 1, "s": n}[mode]
        parity(
            "convolve_wf", wf_batch, _ramp_kernel(m), ord(mode),
            dims={"p": p}, out_args=1,
        )

    def test_convolve_wf_nan_kernel(self, wf_batch):
        k = _ramp_kernel(8)
        k[3] = np.nan
        n = wf_batch.shape[-1]
        parity("convolve_wf", wf_batch, k, ord("s"), dims={"p": n}, out_args=1)

    @pytest.mark.parametrize("mode", ["f", "v", "s"])
    def test_fft_convolve_wf(self, wf_batch, mode):
        n, m = wf_batch.shape[-1], 24
        p = {"f": n + m - 1, "v": n - m + 1, "s": n}[mode]
        parity(
            "fft_convolve_wf", wf_batch, _ramp_kernel(m), ord(mode),
            dims={"p": p}, out_args=1, atol=1e-9,
        )

    def test_reflected_convolve_wf(self, wf_batch):
        n = wf_batch.shape[-1]
        parity(
            "reflected_convolve_wf", wf_batch, _ramp_kernel(15),
            dims={"p": n}, out_args=1, atol=1e-9,
        )


class TestFourier:
    def test_fft(self, wf_batch):
        n = wf_batch.shape[-1]
        parity(
            "fft", wf_batch, dims={"m": n // 2 + 1}, out_args=1,
            out_dtypes=np.complex128,
        )

    def test_ifft(self, wf_batch):
        spec = np.fft.rfft(np.nan_to_num(wf_batch), axis=-1)
        spec[2] = np.nan  # poisoned event
        n = wf_batch.shape[-1]
        parity("ifft", spec, dims={"m": n}, out_args=1, out_dtypes=np.float64)

    def test_psd(self, wf_batch):
        n = wf_batch.shape[-1]
        parity("psd", wf_batch, dims={"m": n // 2 + 1}, out_args=1, atol=1e-9)

    def test_abs2norm(self, wf_batch):
        from .stubs import ref_module

        spec = np.fft.rfft(np.nan_to_num(wf_batch), axis=-1)
        parity(
            "abs2norm", spec, np.uint32(wf_batch.shape[-1]),
            ref_fn=ref_module("fft").abs2norm, rtol=1e-12,
        )


class TestRecursiveFilter:
    def test_recursive_filter_iir(self, wf_batch):
        from scipy.signal import butter

        b_num, a_den = butter(2, 0.2)
        parity(
            "recursive_filter", wf_batch, b_num, a_den,
            wf_batch[:, 0], wf_batch[:, 0], rtol=1e-8, atol=1e-9,
        )

    def test_recursive_filter_fir(self, wf_batch):
        # pure FIR: b = [1] denominator
        a = _ramp_kernel(5)
        parity(
            "recursive_filter", wf_batch, a, np.ones(1),
            0.0, 0.0, rtol=1e-9, atol=1e-10,
        )

    def test_recursive_filter_nan_coeff(self, wf_batch):
        a = np.array([1.0, np.nan])
        parity("recursive_filter", wf_batch, a, np.ones(2), 0.0, 0.0)


class TestExpFamily:
    def test_rc_exp(self):
        from .stubs import ref_module

        tau = np.array([0.0, 1.0, 80.0, 3000.0])
        parity("rc_exp", tau, ref_fn=ref_module("pole_zero").rc_exp)

    # f32 note for the exp/oscillator family: these accumulate a growing
    # convolution sum over 256 samples, so the rounding scales with the
    # *largest partial sum*, not the output — rel_floor anchors the bound.
    def test_convolve_exp(self, wf_batch):
        parity(
            "convolve_exp", wf_batch, 40.0, rtol=1e-8, atol=1e-9,
            f32_rel_floor=1e-5,
        )

    def test_convolve_exp_per_event(self, wf_batch, rng):
        tau = rng.uniform(20, 120, size=wf_batch.shape[0])
        parity(
            "convolve_exp", wf_batch, tau, rtol=1e-8, atol=1e-9,
            f32_rel_floor=1e-5,
        )

    def test_convolve_damped_oscillator(self, wf_batch):
        # oscillating kernel: partial sums cancel, worst of the family
        parity(
            "convolve_damped_oscillator", wf_batch, 60.0, 0.1, 0.4,
            rtol=1e-8, atol=1e-9, f32_rel_floor=2e-4,
        )

    def test_inject_damped_oscillation(self, wf_batch):
        parity(
            "inject_damped_oscillation", wf_batch, 60.0, 0.1, 0.4, 0.05,
            rtol=1e-8, atol=1e-9, f32_rel_floor=2e-4,
        )


class TestKernelGenerators:
    def test_t0_filter(self):
        parity("t0_filter", 16.0, 48.0, dims={"n": 64}, out_args=1)

    def test_moving_slope(self):
        parity("moving_slope", dims={"n": 12}, out_args=1)

    @pytest.mark.parametrize("weight_pos", [1.0, 4.0])
    def test_step(self, weight_pos):
        parity("step", weight_pos, dims={"n": 32}, out_args=1)

    def test_cusp_filter(self):
        parity(
            "cusp_filter", 10.0, 5.0, 200.0, dims={"n": 101}, out_args=1,
            rtol=1e-10,
        )

    def test_zac_filter(self):
        parity(
            "zac_filter", 10.0, 5.0, 200.0, dims={"n": 101}, out_args=1,
            rtol=1e-10,
        )

    @pytest.mark.parametrize("ff", [1.0])
    def test_dplms(self, rng, ff):
        length, ssize = 32, 256
        m = rng.normal(0, 0.1, size=(length, length))
        noise_mat = m @ m.T + np.eye(length)
        t = np.arange(ssize, dtype=np.float64)
        reference = 1.0 / (1.0 + np.exp(-(t - ssize / 2) / 4.0))
        parity(
            "dplms", noise_mat, reference, 50.0, 0.1, 1.0, ff,
            dims={"n": length}, rtol=1e-8, atol=1e-10,
        )

    def test_gaussian_filter1d(self):
        sigma, truncate = 3.0, 4.0
        lw = int(truncate * sigma + 0.5)
        parity(
            "gaussian_filter1d", sigma, truncate, dims={"n": 2 * lw + 1},
            out_args=1,
        )


class TestDWT:
    @pytest.mark.parametrize("wave", ["h", "d"])
    @pytest.mark.parametrize("coeff", ["a", "d"])
    @pytest.mark.parametrize("level", [1, 2, 3])
    def test_dwt(self, wf_batch, wave, coeff, level):
        n = wf_batch.shape[-1]
        # f32: per-level filter-bank rounding ~1e-5 relative to the band peak
        parity(
            "discrete_wavelet_transform", wf_batch, level, ord(wave),
            ord(coeff), dims={"m": n >> level}, out_args=1,
            f32_rtol=5e-5, f32_rel_floor=1e-5,
        )
