"""SVM inference factory (reference ``dspeed/processors/svm.py:13``).

Unpickles a scikit-learn SVM at build time and wraps ``.predict`` as a host
callback — off the traced hot path, like the reference's object-mode wrapper.
"""

from __future__ import annotations

import pickle

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._kernel import Kernel

__all__ = ["svm_predict"]


def svm_predict(svm_file: str) -> Kernel:
    try:
        with open(svm_file, "rb") as f:
            svm = pickle.load(f)
    except OSError as e:
        raise DSPFatal(f"could not load SVM pickle {svm_file!r}") from e
    if not hasattr(svm, "predict"):
        raise DSPFatal(f"{svm_file!r} does not contain an object with .predict")

    def host_predict(x):
        flat = np.asarray(x, dtype="float64").reshape(-1, x.shape[-1])
        return (
            np.asarray(svm.predict(flat))
            .reshape(x.shape[:-1])
            .astype(jax.dtypes.canonicalize_dtype(np.float64))
        )

    def fn(w_in):
        # f64 when x64 is on (CPU parity), f32 otherwise (the host model
        # still predicts in f64; only the device-side result is demoted)
        out_dt = jax.dtypes.canonicalize_dtype(jnp.float64)
        out_shape = jax.ShapeDtypeStruct(w_in.shape[:-1], out_dt)
        out = jax.pure_callback(
            host_predict, out_shape, jnp.nan_to_num(w_in),
            vmap_method="sequential",
        )
        # reference svm.py:55 returns NaN for NaN inputs
        return jnp.where(jnp.any(jnp.isnan(w_in), axis=-1), jnp.nan, out)

    return Kernel(fn, "(n)->()", ["f->d", "d->d"], name="svm_predict")
