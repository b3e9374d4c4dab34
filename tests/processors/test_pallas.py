"""Interpret-mode correctness tests for the Pallas TPU kernels
(real-hardware performance is exercised by bench.py on the TPU runner)."""

import numpy as np
import pytest

from dspeed_tpu.processors._pallas import fir_convolve_full


@pytest.mark.parametrize("n,m", [(1000, 133), (4096, 48), (300, 7)])
def test_fir_convolve_matches_numpy(rng, n, m):
    w = rng.normal(0, 1, (5, n)).astype("float32")
    taps = rng.normal(0, 1, m).astype("float32")
    got = np.asarray(fir_convolve_full(w, taps, interpret=True))
    exp = np.stack([np.convolve(w[i], taps, "full") for i in range(5)])
    assert got.shape == exp.shape
    np.testing.assert_allclose(got, exp, atol=5e-4 * np.abs(exp).max())


def test_fir_convolve_batch_rank(rng):
    # extra leading (channel) dims survive
    w = rng.normal(0, 1, (2, 3, 256)).astype("float32")
    taps = rng.normal(0, 1, 17).astype("float32")
    got = np.asarray(fir_convolve_full(w, taps, interpret=True))
    assert got.shape == (2, 3, 256 + 16)
    exp = np.convolve(w[1, 2], taps, "full")
    np.testing.assert_allclose(got[1, 2], exp, atol=1e-4 * np.abs(exp).max())
