"""Soft pile-up correction (reference ``dspeed/processors/soft_pileup_corr.py``).

Closed-form least-squares fit of ``A*exp(-i/tau) + B`` over the first ``n_in``
samples, subtracted from the whole waveform. The fit sums are masked
reductions (no loops) at accumulation precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import cdim, isnan_any, nanmask, static_int
from ._kernel import kernel

__all__ = ["soft_pileup_corr", "soft_pileup_corr_bl"]


def _exp_fit_sums(w_in, n_fit: int, tau):
    acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    n = w_in.shape[-1]
    i = jnp.arange(n, dtype=acc)
    mask = (i < n_fit).astype(acc)
    tau = jnp.asarray(tau, acc)
    e1 = jnp.exp(-i / cdim(tau, 1)) if getattr(tau, "ndim", 0) else jnp.exp(-i / tau)
    w = jnp.asarray(w_in, acc)
    s1 = jnp.asarray(float(n_fit), acc)
    s2 = jnp.sum(e1 * mask, axis=-1)
    s3 = jnp.sum(e1 * e1 * mask, axis=-1)
    s4 = jnp.sum(e1 * w * mask, axis=-1)
    s5 = jnp.sum(w * mask, axis=-1)
    return e1, s1, s2, s3, s4, s5


def _check_n(n_in, n, name):
    nf = static_int(n_in, name, "n_in")
    if nf < 2:
        raise DSPFatal("The number of samples is not enough for a fit")
    if nf > n:
        raise DSPFatal("The number of samples is more than the waveform length")
    return nf


@kernel("(n),(),()->(n)", ["fff->f", "ddd->d"])
def soft_pileup_corr(w_in, n_in, tau_in):
    """Fit A*exp(-i/tau)+B to the start and subtract it
    (reference ``soft_pileup_corr.py:20``)."""
    n = w_in.shape[-1]
    nf = _check_n(n_in, n, "soft_pileup_corr")
    e1, s1, s2, s3, s4, s5 = _exp_fit_sums(w_in, nf, tau_in)
    b = (s5 - s2 * (s4 * s1 - s2 * s5) / (s3 * s1 - s2 * s2)) / s1
    a = (s4 - b * s2) / s3
    out = (jnp.asarray(w_in, e1.dtype) - (cdim(a) * e1 + cdim(b))).astype(
        w_in.dtype
    )
    return nanmask(isnan_any(w_in, 1) | isnan_any(jnp.asarray(tau_in)), out)


@kernel("(n),(),(),()->(n)", ["ffff->f", "dddd->d"])
def soft_pileup_corr_bl(w_in, n_in, tau_in, b_in):
    """Same with a fixed baseline ``b_in``
    (reference ``soft_pileup_corr.py:91``)."""
    n = w_in.shape[-1]
    nf = _check_n(n_in, n, "soft_pileup_corr_bl")
    e1, s1, s2, s3, s4, s5 = _exp_fit_sums(w_in, nf, tau_in)
    b = jnp.asarray(b_in, e1.dtype)
    a = (s4 - b * s2) / s3
    out = (jnp.asarray(w_in, e1.dtype) - (cdim(a) * e1 + cdim(b))).astype(
        w_in.dtype
    )
    bad = (
        isnan_any(w_in, 1)
        | isnan_any(jnp.asarray(tau_in))
        | isnan_any(jnp.asarray(b_in))
    )
    return nanmask(bad, out)

# generic row-tile fusion (r5 audit): elementwise/reduce/small-matmul bodies
# with no scans, sorts, FFTs or per-row dynamic gathers — Mosaic-lowerable;
# the two-tile probe compile still guards every group at trace time
soft_pileup_corr.tile_safe = True
soft_pileup_corr_bl.tile_safe = True
