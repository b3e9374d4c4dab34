"""Gaussian kernel generator (reference
``dspeed/processors/gaussian_filter1d.py:56``): computes truncated Gaussian
taps once per configuration (const-folded at build time); convolve with
:func:`.convolutions.reflected_convolve_wf` for scipy ``mode="reflect"``
smoothing semantics.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import static_float
from ._kernel import kernel

__all__ = ["gaussian_filter1d"]


@kernel("(),(),(n)", ["fff", "ddd"], nout=1, uses_dims=True)
def gaussian_filter1d(sigma, truncate, dims):
    """Fill a length-``n`` buffer with normalized truncated-Gaussian taps;
    ``n`` should be ``2*int(truncate*sigma + 0.5) + 1``."""
    sd = static_float(sigma, "gaussian_filter1d", "sigma")
    trunc = static_float(truncate, "gaussian_filter1d", "truncate")
    if sd <= 0:
        raise DSPFatal("sigma must be positive")
    lw = int(trunc * sd + 0.5)
    n = dims["n"]
    if n != 2 * lw + 1:
        raise DSPFatal(
            f"weights buffer must have length 2*int(truncate*sigma+0.5)+1 = "
            f"{2 * lw + 1}"
        )
    x = np.arange(-lw, lw + 1)
    phi = np.exp(-0.5 / (sd * sd) * x**2)
    return jnp.asarray(phi / phi.sum())
