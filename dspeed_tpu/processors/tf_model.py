"""TensorFlow/Keras model inference factory (reference
``dspeed/processors/tf_model.py:10``).

TensorFlow is not part of this image; when available, the loaded model runs
as a host callback (off the traced hot path — the ML-layer processors in
:mod:`.ml` are the native path for config-defined networks).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._kernel import Kernel

__all__ = ["tf_model"]


def tf_model(model_file: str) -> Kernel:
    try:
        from tensorflow import keras  # noqa: PLC0415
    except ImportError as e:
        raise DSPFatal(
            "tf_model requires tensorflow, which is not installed; use the "
            "dspeed_tpu.processors.ml layers for config-defined networks"
        ) from e
    model = keras.models.load_model(model_file)
    out_dim = int(model.output_shape[-1])

    def host_infer(x):
        flat = np.asarray(x).reshape(-1, x.shape[-1])
        pred = np.asarray(model.predict(flat, verbose=0)).astype(
            jax.dtypes.canonicalize_dtype(np.float64)
        )
        return pred.reshape(*x.shape[:-1], out_dim)

    def fn(w_in):
        # f64 when x64 is on (CPU parity), f32 otherwise
        out_dt = jax.dtypes.canonicalize_dtype(jnp.float64)
        out_shape = jax.ShapeDtypeStruct(w_in.shape[:-1] + (out_dim,), out_dt)
        return jax.pure_callback(
            host_infer, out_shape, w_in, vmap_method="sequential"
        )

    return Kernel(fn, "(n)->(m)", ["f->d", "d->d"], name="tf_model")
