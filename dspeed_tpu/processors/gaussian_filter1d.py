"""Gaussian smoothing (reference ``dspeed/processors/gaussian_filter1d.py:56``).

A kernel-generator factory: the truncated Gaussian taps are computed host-side
once per configuration; the runtime is a reflect-padded XLA convolution.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask
from ._kernel import Kernel

__all__ = ["gaussian_filter1d"]


def _gaussian_taps(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1)
    phi = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return (phi / phi.sum()).astype("float64")


def gaussian_filter1d(sigma: float, truncate: float = 4.0) -> Kernel:
    """Return a processor convolving with a truncated Gaussian of width
    ``sigma`` samples, reflect-padded at the edges (scipy ``mode="reflect"``
    semantics, matching the reference's scipy-derived kernel)."""
    taps = _gaussian_taps(sigma, truncate)
    radius = (len(taps) - 1) // 2

    def fn(w_in):
        n = w_in.shape[-1]
        if n < radius + 1:
            raise DSPFatal("waveform shorter than the Gaussian radius")
        # reflect padding: w[radius-1 .. 0] | w | w[n-1 .. n-radius]
        left = w_in[..., :radius][..., ::-1]
        right = w_in[..., n - radius :][..., ::-1]
        wp = jnp.concatenate([left, w_in, right], axis=-1)
        lhs = wp.reshape(-1, 1, wp.shape[-1])
        rhs = jnp.asarray(taps[::-1].copy(), w_in.dtype).reshape(1, 1, -1)
        out = jax.lax.conv_general_dilated(
            lhs, rhs, (1,), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(w_in.shape)
        return nanmask(isnan_any(w_in, 1), out.astype(w_in.dtype))

    return Kernel(fn, "(n)->(n)", ["f->f", "d->d"], name="gaussian_filter1d")
