"""svm_predict / tf_model factory wrappers (reference ``svm.py:13``,
``tf_model.py:10``): host-callback inference with dependency gating."""

import pickle

import numpy as np
import pytest

from dspeed_tpu.errors import DSPFatal
from dspeed_tpu.processors import svm_predict, tf_model


class _StubSVM:
    """Duck-typed stand-in: sklearn is pickled the same way by the factory."""

    def predict(self, x):
        return (np.asarray(x).sum(axis=-1) > 0).astype("int64")


def test_svm_predict_roundtrip(tmp_path, rng):
    path = tmp_path / "svm.pkl"
    with open(path, "wb") as f:
        pickle.dump(_StubSVM(), f)
    kern = svm_predict(str(path))
    x = rng.normal(size=(12, 8)).astype(np.float32)
    got = np.asarray(kern(x)).reshape(-1)
    want = (x.sum(axis=-1) > 0).astype("float64")
    np.testing.assert_array_equal(got, want)


def test_svm_predict_real_sklearn(tmp_path, rng):
    svm_mod = pytest.importorskip("sklearn.svm")

    x_train = rng.normal(size=(40, 6))
    y_train = (x_train[:, 0] > 0).astype(int)
    clf = svm_mod.SVC().fit(x_train, y_train)
    path = tmp_path / "real_svm.pkl"
    with open(path, "wb") as f:
        pickle.dump(clf, f)

    kern = svm_predict(str(path))
    x = rng.normal(size=(10, 6)).astype(np.float64)
    got = np.asarray(kern(x)).reshape(-1)
    want = clf.predict(x).astype("float64")
    np.testing.assert_array_equal(got, want)


def test_svm_predict_missing_file(tmp_path):
    with pytest.raises(DSPFatal, match="could not load"):
        svm_predict(str(tmp_path / "nope.pkl"))


def test_svm_predict_wrong_object(tmp_path):
    path = tmp_path / "notsvm.pkl"
    with open(path, "wb") as f:
        pickle.dump({"not": "an svm"}, f)
    with pytest.raises(DSPFatal, match="predict"):
        svm_predict(str(path))


def test_tf_model_gated_without_tensorflow(tmp_path):
    try:
        import tensorflow  # noqa: F401

        pytest.skip("tensorflow present; gating branch not reachable")
    except ImportError:
        pass
    with pytest.raises(DSPFatal, match="requires tensorflow"):
        tf_model(str(tmp_path / "model.keras"))


def test_tf_model_roundtrip(tmp_path, rng):
    keras = pytest.importorskip("tensorflow.keras")

    model = keras.Sequential(
        [keras.layers.Input(shape=(8,)), keras.layers.Dense(3, activation=None)]
    )
    path = str(tmp_path / "model.keras")
    model.save(path)

    kern = tf_model(path)
    x = rng.normal(size=(5, 8)).astype(np.float32)
    got = np.asarray(kern(x))
    want = np.asarray(model.predict(x, verbose=0), dtype="float64")
    np.testing.assert_allclose(got.reshape(5, 3), want, rtol=1e-6)
