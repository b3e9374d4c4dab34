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


class TestTileBlk:
    """Geometry of the in-tile banded block chooser (r5: adaptive width
    gates which convolutions may join generic row-tile groups)."""

    def test_flagship_geometries(self):
        from dspeed_tpu.processors.convolutions import _tile_blk

        # t0 filter: m=133 over 4096 outputs -> 384 (512's band matrix is
        # ~1.32 MB, just over the budget; 384 fits and is lane-aligned)
        assert _tile_blk(133, 4096) == 384
        # CUSP/ZAC: m=1696 over 301 outputs -> 128 (the tile-safety gate
        # then rejects them: < 256 columns starves the schedule)
        assert _tile_blk(1696, 301) == 128
        # short dplms kernel: full 512 block fits
        assert _tile_blk(50, 974) == 512
        # tiny output window: clamped to p
        assert _tile_blk(50, 25) == 25

    def test_budget_respected(self):
        from dspeed_tpu.processors.convolutions import (
            _TILE_BAND_BYTES, _tile_blk,
        )

        for m in (17, 133, 500, 1696, 4000):
            for p in (25, 301, 974, 4096):
                blk = _tile_blk(m, p)
                if blk is not None:
                    assert (blk + m - 1) * blk * 4 <= _TILE_BAND_BYTES
                    assert blk <= p or blk == 64

    def test_tile_safety_gate(self):
        """The step-level predicate admits the t0 conv and rejects the
        CUSP/ZAC geometry (blk < 256) and FFT-sized MAC counts."""
        import types

        from dspeed_tpu.processors.convolutions import _conv_tile_safe

        def step(m, n, mode, p=None):
            kern = np.ones(m, np.float64)
            w = types.SimpleNamespace(shape=(n,))
            return types.SimpleNamespace(params=[w, kern, mode])

        assert _conv_tile_safe(step(133, 4096, "s"))
        assert not _conv_tile_safe(step(1696, 1996, "v"))
        assert _conv_tile_safe(step(9, 4096, "s"))  # direct shifted-adds
