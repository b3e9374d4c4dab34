"""Matmul four-step FFT vs numpy reference."""

import numpy as np
import pytest

from dspeed_tpu.processors import _mmfft


@pytest.mark.parametrize("nfft", [256, 2048, 8192])
def test_forward_matches_numpy(rng, nfft):
    x = rng.normal(size=(5, nfft)).astype(np.float32)
    re, im = _mmfft.fft4(x, None, nfft)
    want = np.fft.fft(x.astype(np.float64), axis=-1)
    got = np.asarray(re).astype(np.float64) + 1j * np.asarray(im)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 2e-6


@pytest.mark.parametrize("nfft", [2048, 8192])
def test_roundtrip(rng, nfft):
    x = rng.normal(size=(3, nfft)).astype(np.float32)
    re, im = _mmfft.fft4(x, None, nfft)
    back_re, back_im = _mmfft.fft4(re, im, nfft, inverse=True)
    assert np.abs(np.asarray(back_re) - x).max() < 2e-5
    assert np.abs(np.asarray(back_im)).max() < 2e-5


@pytest.mark.parametrize("m", [133, 700, 2000])
def test_convolution_matches_numpy(rng, m):
    n = 4096
    x = rng.normal(size=(4, n)).astype(np.float32).cumsum(-1)
    k = rng.normal(size=m).astype(np.float32)
    size = n + m - 1
    nfft = 1 << (size - 1).bit_length()
    assert _mmfft.plan_ok(nfft)
    got = np.asarray(_mmfft.fft_convolve_full(x, k, nfft, size))
    want = np.stack(
        [np.convolve(x[i].astype(np.float64), k.astype(np.float64)) for i in range(4)]
    )
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-6


def test_plan_ok():
    assert _mmfft.plan_ok(8192)
    assert _mmfft.plan_ok(2048)
    assert not _mmfft.plan_ok(100)     # not a multiple of 128
    assert not _mmfft.plan_ok(128)     # N1 == 1
    assert not _mmfft.plan_ok(1 << 20)  # N1 too large


def test_traced_kernel_convolution(rng):
    """Kernel arrays produced inside a jit trace take the device-FFT path."""
    import jax
    import jax.numpy as jnp

    n, m = 1024, 133
    x = rng.normal(size=(3, n)).astype(np.float32)
    k = rng.normal(size=m).astype(np.float32)
    size = n + m - 1
    nfft = 1 << (size - 1).bit_length()

    @jax.jit
    def f(xx, kk):
        return _mmfft.fft_convolve_full(xx, kk * 1.0, nfft, size)  # kk traced

    got = np.asarray(f(x, k))
    want = np.stack([
        np.convolve(x[i].astype(np.float64), k.astype(np.float64)) for i in range(3)
    ])
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6


def test_non_power_of_two_nfft(rng):
    """The factorization supports any (N1<=256)x128 length — e.g. 4352 for a
    4228-sample convolution instead of padding to 8192."""
    n, m = 4096, 133
    size = n + m - 1
    nfft = -(-size // 256) * 256
    assert nfft == 4352 and _mmfft.plan_ok(nfft // 2)
    x = rng.normal(size=(4, n)).astype(np.float32).cumsum(-1)
    k = rng.normal(size=m).astype(np.float32)
    got = np.asarray(_mmfft.fft_convolve_full(x, k, nfft, size))
    want = np.stack(
        [np.convolve(x[i].astype(np.float64), k.astype(np.float64)) for i in range(4)]
    )
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6

    re, im = _mmfft.fft4(x[:, :2176].copy(), None, 2176)
    wantf = np.fft.fft(x[:, :2176].astype(np.float64), axis=-1)
    gotf = np.asarray(re).astype(np.float64) + 1j * np.asarray(im)
    assert np.abs(gotf - wantf).max() / np.abs(wantf).max() < 2e-6
