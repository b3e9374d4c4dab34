"""Reference-code parity: designed IIR filters, ML layers, NNLS,
pole-zero optimizers, SVM / TF wrappers, Wiener filter.

Reference bodies: ``/root/reference/src/dspeed/processors/{iir_filter,ml,
nnls,optimize,svm,tf_model,wiener_filter}.py``.
"""

from __future__ import annotations

import pickle

import numpy as np
import pytest

from .conftest import assert_ref_parity as parity
from .stubs import ref_module


def _dp(name):
    from dspeed_tpu import processors as dp

    return getattr(dp, name)


class TestDesignedFilters:
    def test_iir_butter_lowpass(self, wf_batch):
        ref = ref_module("iir_filter").iir_filter(0.2, 4)
        mine = _dp("iir_filter")(0.2, 4)
        # f32: order-4 feedback recursion rounds ~1e-5 relative over 256 samples
        parity("iir_filter", wf_batch, ref_fn=ref, my_kernel=mine,
               rtol=1e-8, atol=1e-8, f32_rtol=1e-4, f32_rel_floor=1e-5)

    def test_iir_cheby1_highpass(self, wf_batch):
        ref = ref_module("iir_filter").iir_filter(
            0.1, 3, rp=1.0, ftype="cheby1", btype="highpass"
        )
        mine = _dp("iir_filter")(0.1, 3, rp=1.0, ftype="cheby1",
                                 btype="highpass")
        # f32: highpass output is small vs the recursion state magnitude,
        # so the bound must anchor to max|expected| (rel_floor), not rtol
        parity("iir_filter", wf_batch, ref_fn=ref, my_kernel=mine,
               rtol=1e-8, atol=1e-8, f32_rel_floor=1e-5)

    def test_iir_bandpass(self, wf_batch):
        ref = ref_module("iir_filter").iir_filter([0.1, 0.4], 2,
                                                  btype="bandpass")
        mine = _dp("iir_filter")([0.1, 0.4], 2, btype="bandpass")
        # f32: order-4 (2x biquad) recursion, ~4e-5 relative
        parity("iir_filter", wf_batch, ref_fn=ref, my_kernel=mine,
               rtol=1e-8, atol=1e-8, f32_rtol=2e-4, f32_rel_floor=1e-5)

    def test_notch_filter(self, wf_batch):
        ref = ref_module("iir_filter").notch_filter(0.3, 0.02)
        mine = _dp("notch_filter")(0.3, 0.02)
        parity("notch_filter", wf_batch, ref_fn=ref, my_kernel=mine,
               rtol=1e-8, atol=1e-8)

    def test_peak_filter(self, wf_batch):
        ref = ref_module("iir_filter").peak_filter(0.25, 0.05)
        mine = _dp("peak_filter")(0.25, 0.05)
        parity("peak_filter", wf_batch, ref_fn=ref, my_kernel=mine,
               rtol=1e-8, atol=1e-8)


ACTS = ["s", "r", "l", "m", "t"]


class TestMlLayers:
    @pytest.mark.parametrize("act", ACTS)
    def test_dense_layer_no_bias(self, rng, act):
        x = rng.normal(size=(5, 16))
        x[2] = np.nan
        kern = rng.normal(size=(16, 8))
        parity("dense_layer_no_bias", x, kern, ord(act), rtol=1e-9)

    def test_dense_layer_with_bias(self, rng):
        x = rng.normal(size=(5, 16))
        kern = rng.normal(size=(16, 8))
        bias = rng.normal(size=8)
        parity("dense_layer_with_bias", x, kern, bias, ord("s"), rtol=1e-9)

    @pytest.mark.parametrize("act", ACTS)
    def test_classification_layer_no_bias(self, rng, act):
        x = rng.normal(size=(5, 16))
        kern = rng.normal(size=16)
        parity("classification_layer_no_bias", x, kern, ord(act), rtol=1e-9)

    def test_classification_layer_with_bias(self, rng):
        x = rng.normal(size=(5, 16))
        kern = rng.normal(size=16)
        bias = rng.normal(size=1)
        parity("classification_layer_with_bias", x, kern, bias, ord("t"),
               rtol=1e-9)

    def test_normalisation_layer(self, rng):
        x = rng.normal(size=(5, 16))
        x[1] = np.nan
        means = rng.normal(size=16)
        variances = np.abs(rng.normal(size=16)) + 0.1
        parity("normalisation_layer", x, means, variances, rtol=1e-9)


class TestNNLS:
    def test_optimize_nnls(self, rng):
        m, n = 20, 8
        A = np.abs(rng.normal(0, 1, (m, n)))
        xs = np.abs(rng.normal(0, 1, (3, n))) * np.array(
            [1, 0, 1, 1, 0, 1, 0, 1.0]
        )
        b = np.einsum("mn,bn->bm", A, xs)
        parity(
            "optimize_nnls", A, b, 1000.0, 1e-10, False, 0.0,
            dims={"m": m, "n": n}, out_args=1, int_args=(2,),
            rtol=1e-6, atol=1e-8,
        )


class TestOptimizePZ:
    def _decay_batch(self, rng, tau):
        n = 512
        t = np.arange(n, dtype=np.float64)
        amp = rng.uniform(500, 2000, size=(4, 1))
        w = np.where(t >= 20, amp * np.exp(-(t - 20) / tau), 0.0)
        return w

    def test_optimize_1pz(self, rng):
        tau = 120.0
        w = self._decay_batch(rng, tau)
        got, exp = parity(
            "optimize_1pz", w, 0.0, 40.0, 500.0, 100.0,
            rtol=5e-3, atol=1e-3,
        )
        # both optimizers must also land on the true time constant
        np.testing.assert_allclose(np.asarray(got[0]), tau, rtol=1e-2)

    def test_optimize_2pz(self, rng):
        # two-exponential decay; the slope objective has a degenerate valley
        # in (tau2, frac), so optimizers legitimately stop at different
        # points on it — compare achieved objective values, not raw params
        from .stubs import call_ref

        n, t1, t2, frac = 512, 150.0, 20.0, 0.3
        t = np.arange(n, dtype=np.float64)
        amp = rng.uniform(500, 2000, size=(3, 1))
        w = np.where(
            t >= 20,
            amp * ((1 - frac) * np.exp(-(t - 20) / t1)
                   + frac * np.exp(-(t - 20) / t2)),
            0.0,
        )
        args = (w, 0.0, 40.0, 500.0, 1000.0, 1.0, 120.0, 30.0, 0.25)
        exp = call_ref("optimize_2pz", *args)
        got = _dp("optimize_2pz")(*args)

        from dspeed_tpu.processors.optimize import (
            _dpz_traced,
            _slope_objective,
        )
        import jax.numpy as jnp

        def objective(tau1, tau2, fr):
            y = _dpz_traced(
                jnp.asarray(w),
                jnp.asarray(np.asarray(tau1, dtype=np.float64)),
                jnp.asarray(np.asarray(tau2, dtype=np.float64)),
                jnp.asarray(np.asarray(fr, dtype=np.float64)),
            )
            return np.asarray(_slope_objective(y, 40, 500))

        o_ref = objective(*exp)
        o_mine = objective(*(np.asarray(g) for g in got))
        # both must flatten the tail (init objective is ~1e9; anything below
        # 1e-2 is converged to float-noise level); neither may be much worse
        assert np.all(o_mine <= np.maximum(2.0 * o_ref, 1e-2)), (
            o_mine, o_ref,
        )


class TestHostModelWrappers:
    class _StubSVM:
        def predict(self, x):
            return (np.asarray(x).sum(axis=-1) > 0).astype("int64")

    def test_svm_predict(self, tmp_path, rng):
        path = str(tmp_path / "svm.pkl")
        with open(path, "wb") as f:
            pickle.dump(self._StubSVM(), f)
        ref = ref_module("svm").svm_predict(path)
        mine = _dp("svm_predict")(path)
        x = rng.normal(size=(10, 8))
        x[3] = np.nan
        parity("svm_predict", x, ref_fn=ref, my_kernel=mine)

    def test_tf_model(self, tmp_path, rng):
        tf = pytest.importorskip("tensorflow")

        model = tf.keras.Sequential(
            [tf.keras.layers.Input(shape=(12,)),
             tf.keras.layers.Dense(1, activation="sigmoid")]
        )
        path = str(tmp_path / "model.keras")
        model.save(path)
        ref = ref_module("tf_model").tf_model(path)
        kern = _dp("tf_model")(path)

        def mine(x):
            outs = kern(x)
            return tuple(np.squeeze(np.asarray(o), -1) for o in outs)

        x = rng.normal(size=(6, 12)).astype(np.float64)
        parity("tf_model", x, ref_fn=ref, my_kernel=mine, rtol=1e-5,
               atol=1e-6, batched_call=True)


class TestWiener:
    def test_wiener_filter(self, tmp_path, rng):
        from dspeed_tpu import lh5

        n = 128
        t = np.arange(n, dtype=np.float64)
        superpulse = np.exp(-0.5 * ((t - 40) / 6.0) ** 2)
        noise = rng.normal(0, 0.05, size=n)
        path = str(tmp_path / "wiener.lh5")
        lh5.write(lh5.Array(superpulse), "spms/processed/superpulse", path)
        lh5.write(lh5.Array(noise), "spms/processed/noise_wf", path)

        ref = ref_module("wiener_filter").wiener_filter([path])
        mine = _dp("wiener_filter")([path])
        spec = np.fft.fft(rng.normal(0, 1, size=(4, n)) + superpulse)
        parity("wiener_filter", spec, ref_fn=ref, my_kernel=mine,
               rtol=1e-9, atol=1e-10, out_dtypes=np.complex128)
