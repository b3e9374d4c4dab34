"""Tests for ML layers, tau optimization, and NNLS
(reference ``ml.py``, ``optimize.py``, ``nnls.py``)."""

import numpy as np
import pytest

from dspeed_tpu import processors as dp


class TestMlLayers:
    def test_dense_with_bias_relu(self, rng):
        x = rng.normal(0, 1, (4, 16)).astype("float64")
        K = rng.normal(0, 1, (16, 8))
        b = rng.normal(0, 1, 8)
        (y,) = dp.dense_layer_with_bias(x, K, b, ord("r"))
        np.testing.assert_allclose(np.asarray(y), np.maximum(x @ K + b, 0))

    def test_dense_no_bias_sigmoid(self, rng):
        x = rng.normal(0, 1, (4, 16)).astype("float64")
        K = rng.normal(0, 1, (16, 8))
        (y,) = dp.dense_layer_no_bias(x, K, ord("s"))
        np.testing.assert_allclose(
            np.asarray(y), 1 / (1 + np.exp(-(x @ K))), rtol=1e-12
        )

    def test_classification_tanh(self, rng):
        x = rng.normal(0, 1, (4, 16)).astype("float64")
        k = rng.normal(0, 1, 16)
        (y,) = dp.classification_layer_with_bias(x, k, 0.5, ord("t"))
        np.testing.assert_allclose(np.asarray(y), np.tanh(x @ k + 0.5), rtol=1e-12)

    def test_normalisation(self, rng):
        x = rng.normal(0, 1, (4, 16)).astype("float64")
        (y,) = dp.normalisation_layer(x, np.zeros(16), np.full(16, 4.0))
        np.testing.assert_allclose(np.asarray(y), x / 2)

    def test_bad_activation_raises(self, rng):
        from dspeed_tpu.errors import DSPFatal

        x = rng.normal(0, 1, (2, 8)).astype("float64")
        with pytest.raises(DSPFatal):
            dp.dense_layer_no_bias(x, np.eye(8), ord("x"))


class TestOptimize:
    def test_optimize_1pz_recovers_tau(self, rng):
        n, tau_true = 2048, 400.0
        t = np.arange(n)
        w = np.where(t >= 100, 1000 * np.exp(-(t - 100) / tau_true), 0.0)[
            None
        ] + rng.normal(0, 0.01, (3, n))
        (tau,) = dp.optimize_1pz(w.astype("float64"), 0.0, 200, 1800, 300.0)
        np.testing.assert_allclose(np.asarray(tau), tau_true, rtol=0.02)

    def test_optimize_2pz_improves_flatness(self, rng):
        # two-exponential decay; check the optimizer flattens the PZ output
        n = 2048
        t = np.arange(n)
        wf = np.where(
            t >= 100,
            1000 * (0.8 * np.exp(-(t - 100) / 500.0) + 0.2 * np.exp(-(t - 100) / 80.0)),
            0.0,
        )[None] + rng.normal(0, 0.01, (2, n))
        tau1, tau2, frac = dp.optimize_2pz(
            wf.astype("float64"), 0.0, 200, 1800, 2000.0, 1.0, 400.0,
            100.0, 0.5
        )
        from dspeed_tpu.processors.optimize import _dpz_traced, _slope_objective
        import jax.numpy as jnp

        w = jnp.asarray(wf)
        before = _slope_objective(
            _dpz_traced(w, jnp.full(2, 400.0), jnp.full(2, 100.0), jnp.full(2, 0.5)),
            200, 1800,
        )
        after = _slope_objective(
            _dpz_traced(w, jnp.asarray(tau1), jnp.asarray(tau2), jnp.asarray(frac)),
            200, 1800,
        )
        assert np.all(np.asarray(after) < 0.15 * np.asarray(before))


class TestNnls:
    def test_matches_scipy(self, rng):
        from scipy.optimize import nnls as scipy_nnls

        A = np.abs(rng.normal(0, 1, (20, 8)))
        xs = np.abs(rng.normal(0, 1, (3, 8))) * np.array(
            [1, 0, 1, 1, 0, 1, 0, 1.0]
        )
        b = np.einsum("mn,bn->bm", A, xs)
        (sol,) = dp.optimize_nnls(
            A, b, 0, 1e-8, 0, 0.0, dims={"m": 20, "n": 8}
        )
        for i in range(3):
            exp, _ = scipy_nnls(A, b[i])
            np.testing.assert_allclose(np.asarray(sol)[i], exp, atol=1e-10)
