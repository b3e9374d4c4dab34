"""Convolution routing: banded-matmul vs FFT vs direct must agree with
numpy.convolve for every mode (reference ``convolutions.py:24,81``; routing
is a TPU-performance concern with no semantic surface)."""

import numpy as np
import pytest

from dspeed_tpu import processors as dp
from dspeed_tpu.processors.convolutions import (
    _conv_banded_matmul,
    _mode_window,
)


@pytest.fixture
def batch(rng):
    w = rng.normal(0, 1, (4, 600)).astype("float64")
    w[:, 100:] += 50.0
    return w


class TestBandedMatmul:
    @pytest.mark.parametrize("mode", ["f", "v", "s"])
    @pytest.mark.parametrize("m", [9, 64, 301])
    def test_matches_numpy(self, batch, rng, mode, m):
        taps = rng.normal(0, 1, m)
        n = batch.shape[-1]
        lo, p = _mode_window(mode, n, m)
        got = np.asarray(_conv_banded_matmul(batch, taps, lo, p))
        exp = np.stack([np.convolve(x, taps, {"f": "full", "v": "valid",
                                              "s": "same"}[mode])
                        for x in batch])
        np.testing.assert_allclose(got, exp, rtol=1e-10,
                                   atol=1e-10 * np.abs(exp).max())

    def test_blocked_band(self, batch, rng):
        # p > blk exercises the shared-matrix block tiling
        taps = rng.normal(0, 1, 133)
        n = batch.shape[-1]
        lo, p = _mode_window("s", n, 133)
        got = np.asarray(_conv_banded_matmul(batch, taps, lo, p, blk=128))
        exp = np.stack([np.convolve(x, taps, "same") for x in batch])
        np.testing.assert_allclose(got, exp, rtol=1e-10,
                                   atol=1e-10 * np.abs(exp).max())

    def test_env_routes_agree(self, batch, rng, monkeypatch):
        taps = rng.normal(0, 1, 301)
        n = batch.shape[-1]
        outs = {}
        for route in ("matmul", "fft", "direct"):
            monkeypatch.setenv("DSPEED_TPU_CONV", route)
            (y,) = dp.convolve_wf(batch, taps, ord("v"),
                                  dims={"p": n - 301 + 1})
            outs[route] = np.asarray(y)
        np.testing.assert_allclose(outs["matmul"], outs["direct"],
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(outs["fft"], outs["direct"],
                                   rtol=1e-7, atol=1e-7)

    def test_accel_shiftadd_matches_conv(self, batch, monkeypatch, rng):
        """The accelerator branch of _conv_full_direct_only (m weighted
        shifted slices — a 1-channel conv_general_dilated wastes the MXU's
        feature lanes) must match the conv lowering to accumulation-order
        rounding for short kernels, traced or concrete."""
        import jax

        from dspeed_tpu.processors.convolutions import _conv_full_direct_only

        for m in (1, 2, 9, 33):
            taps = rng.normal(0, 1, m)
            ref = np.asarray(_conv_full_direct_only(batch, taps))
            monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
            got = np.asarray(_conv_full_direct_only(batch, taps))
            traced = np.asarray(
                jax.jit(_conv_full_direct_only)(batch, taps)
            )
            monkeypatch.undo()
            np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)
            np.testing.assert_allclose(traced, ref, rtol=1e-12, atol=1e-12)
        # above the unroll cut the conv lowering is kept verbatim
        taps = rng.normal(0, 1, 65)
        ref = np.asarray(_conv_full_direct_only(batch, taps))
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        got = np.asarray(_conv_full_direct_only(batch, taps))
        monkeypatch.undo()
        np.testing.assert_array_equal(got, ref)
