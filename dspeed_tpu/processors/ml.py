"""Small neural-network layers built from DSP configs
(reference ``dspeed/processors/ml.py:48-358``): matmul + activation — exactly
the ops the MXU is built for. Activation flags (static chars): ``s`` sigmoid,
``r`` ReLU, ``l`` leaky ReLU, ``m`` softplus, ``t`` tanh.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_int
from ._kernel import kernel

__all__ = [
    "dense_layer_no_bias",
    "dense_layer_with_bias",
    "classification_layer_no_bias",
    "classification_layer_with_bias",
    "normalisation_layer",
]


def _activate(temp, flag: int, name: str):
    ch = chr(flag)
    if ch == "s":
        return 1.0 / (1.0 + jnp.exp(-temp))
    if ch == "r":
        return temp * (temp > 0)
    if ch == "l":
        return temp * (temp > 0) + 0.01 * temp * (temp < 0)
    if ch == "m":
        return jnp.log1p(jnp.exp(temp))
    if ch == "t":
        return jnp.tanh(temp)
    raise DSPFatal(f"unrecognized activation flag {ch!r} in {name}")


def _matmul(x, kern):
    import jax

    hp = jax.lax.Precision.HIGHEST
    kern = jnp.asarray(kern, x.dtype)
    if kern.ndim == 2:
        return jnp.einsum("...n,nm->...m", x, kern, precision=hp)
    return jnp.einsum("...n,...nm->...m", x, kern, precision=hp)


def _dot(x, kern):
    import jax

    kern = jnp.asarray(kern, x.dtype)
    return jnp.einsum(
        "...n,...n->..." if kern.ndim > 1 else "...n,n->...",
        x, kern, precision=jax.lax.Precision.HIGHEST,
    )


@kernel("(n),(n,m),()->(m)", ["ffb->f", "ddb->d"], static=[2])
def dense_layer_no_bias(x_in, kernel_in, activation_func):
    flag = static_int(activation_func, "dense_layer_no_bias", "activation_func")
    out = _activate(_matmul(x_in, kernel_in), flag, "dense_layer_no_bias")
    return nanmask(isnan_any(x_in, 1), out.astype(x_in.dtype))


@kernel("(n),(n,m),(m),()->(m)", ["fffb->f", "dddb->d"], static=[3])
def dense_layer_with_bias(x_in, kernel_in, bias, activation_func):
    flag = static_int(activation_func, "dense_layer_with_bias", "activation_func")
    temp = _matmul(x_in, kernel_in) + jnp.asarray(bias, x_in.dtype)
    out = _activate(temp, flag, "dense_layer_with_bias")
    return nanmask(isnan_any(x_in, 1), out.astype(x_in.dtype))


@kernel("(n),(n),()->()", ["ffb->f", "ddb->d"], static=[2])
def classification_layer_no_bias(x_in, kernel_in, activation_func):
    flag = static_int(
        activation_func, "classification_layer_no_bias", "activation_func"
    )
    out = _activate(_dot(x_in, kernel_in), flag, "classification_layer_no_bias")
    return nanmask(isnan_any(x_in, 1), out.astype(x_in.dtype))


@kernel("(n),(n),(),()->()", ["fffb->f", "dddb->d"], static=[3])
def classification_layer_with_bias(x_in, kernel_in, bias, activation_func):
    flag = static_int(
        activation_func, "classification_layer_with_bias", "activation_func"
    )
    temp = _dot(x_in, kernel_in) + jnp.asarray(bias, x_in.dtype)
    out = _activate(temp, flag, "classification_layer_with_bias")
    return nanmask(isnan_any(x_in, 1), out.astype(x_in.dtype))


@kernel("(n),(n),(n)->(n)", ["fff->f", "ddd->d"])
def normalisation_layer(x_in, means, variances):
    out = (x_in - jnp.asarray(means, x_in.dtype)) / jnp.sqrt(
        jnp.asarray(variances, x_in.dtype)
    )
    return nanmask(isnan_any(x_in, 1), out.astype(x_in.dtype))

# generic row-tile fusion (r5 audit): elementwise/reduce/small-matmul bodies
# with no scans, sorts, FFTs or per-row dynamic gathers — Mosaic-lowerable;
# the two-tile probe compile still guards every group at trace time
dense_layer_no_bias.tile_safe = True
dense_layer_with_bias.tile_safe = True
classification_layer_no_bias.tile_safe = True
classification_layer_with_bias.tile_safe = True
normalisation_layer.tile_safe = True
