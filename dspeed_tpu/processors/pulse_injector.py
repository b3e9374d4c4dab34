"""Pulse injection for pileup/robustness studies (reference
``dspeed/processors/pulse_injector.py:21,74`` and
``pmt_pulse_injector.py:19,68``): the reference's "fault injection in the
physics sense" (SURVEY.md §5). All closed-form elementwise adds.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ._helpers import cdim, isnan_any, nanmask
from ._kernel import kernel

__all__ = [
    "inject_sig_pulse",
    "inject_exp_pulse",
    "inject_gumbel",
    "inject_general_logistic",
]

_LOG99x4 = 4.0 * np.log(99.0)


def _bparam(x, w):
    v = jnp.asarray(x, w.dtype)
    return v[..., None] if v.ndim else v


@kernel("(n),(),(),(),()->(n)", ["fffff->f", "ddddd->d"])
def inject_sig_pulse(wf_in, t0, rt, a, decay):
    """Add ``A / (1 + exp(-4 ln99 (t-t0-rt/2)/rt)) * exp(-(t-t0)/tau)``
    (reference ``pulse_injector.py:21``)."""
    n = wf_in.shape[-1]
    t = jnp.arange(n, dtype=wf_in.dtype)
    t0b, rtb, ab, db = (_bparam(x, wf_in) for x in (t0, rt, a, decay))
    rise = _LOG99x4 / rtb
    pulse = ab / (1.0 + jnp.exp(-rise * (t - (t0b + rtb / 2.0)))) * jnp.exp(
        -(t - t0b) / db
    )
    bad = (
        isnan_any(wf_in, 1)
        | isnan_any(jnp.asarray(rt)) | isnan_any(jnp.asarray(t0))
        | isnan_any(jnp.asarray(a)) | isnan_any(jnp.asarray(decay))
    )
    return nanmask(bad, (wf_in + pulse).astype(wf_in.dtype))


@kernel("(n),(),(),(),()->(n)", ["fffff->f", "ddddd->d"])
def inject_exp_pulse(wf_in, t0, rt, a, decay):
    """Add an exponentially-rising then decaying pulse
    (reference ``pulse_injector.py:74``)."""
    n = wf_in.shape[-1]
    t = jnp.arange(n, dtype=wf_in.dtype)
    t0b, rtb, ab, db = (_bparam(x, wf_in) for x in (t0, rt, a, decay))
    during = ab * jnp.exp((t - t0b - rtb) / rtb) * jnp.exp(-(t - t0b) / db)
    after = ab * jnp.exp(-(t - t0b) / db)
    pulse = jnp.where(
        (t <= t0b) & (t <= t0b + rtb), during, jnp.where(t > t0b + rtb, after, 0.0)
    )
    bad = (
        isnan_any(wf_in, 1)
        | isnan_any(jnp.asarray(rt)) | isnan_any(jnp.asarray(t0))
        | isnan_any(jnp.asarray(a)) | isnan_any(jnp.asarray(decay))
    )
    return nanmask(bad, (wf_in + pulse).astype(wf_in.dtype))


@kernel("(n),(),(),()->(n)", ["ffff->f", "dddd->d"])
def inject_gumbel(wf_in, a, t0, beta):
    """Add a Gumbel-distribution PMT pulse over ``[t0, t0+10*beta)``
    (reference ``pmt_pulse_injector.py:19``)."""
    n = wf_in.shape[-1]
    t = jnp.arange(n, dtype=wf_in.dtype)
    ab, t0b, bb = (_bparam(x, wf_in) for x in (a, t0, beta))
    mu = t0b + 2.0 * bb
    z = (t - mu) / bb
    pulse = (ab / bb) * jnp.exp(-(z + jnp.exp(-z)))
    window = (t >= t0b) & (t < mu + 8.0 * bb)
    bad = (
        isnan_any(wf_in, 1)
        | isnan_any(jnp.asarray(a)) | isnan_any(jnp.asarray(t0))
        | isnan_any(jnp.asarray(beta))
    )
    return nanmask(bad, (wf_in + jnp.where(window, pulse, 0.0)).astype(wf_in.dtype))


@kernel("(n),(),(),(),(),(),()->(n)", ["fffffff->f", "ddddddd->d"])
def inject_general_logistic(wf_in, a, t0, rt, q, v, decay):
    """Add a generalized-logistic pulse
    (reference ``pmt_pulse_injector.py:68``; arg order a, t0, rt, q, v,
    decay matches the reference signature)."""
    n = wf_in.shape[-1]
    t = jnp.arange(n, dtype=wf_in.dtype)
    t0b, rtb, ab, db, qb, vb = (
        _bparam(x, wf_in) for x in (t0, rt, a, decay, q, v)
    )
    rise = _LOG99x4 / rtb
    pulse = ab / (
        (1.0 + qb * jnp.exp(-rise * (t - t0b - rtb / 2.0))) ** (1.0 / vb)
    ) * jnp.exp(-(t - t0b) / db)
    bad = (
        isnan_any(wf_in, 1)
        | isnan_any(jnp.asarray(rt)) | isnan_any(jnp.asarray(t0))
        | isnan_any(jnp.asarray(a)) | isnan_any(jnp.asarray(decay))
        | isnan_any(jnp.asarray(q)) | isnan_any(jnp.asarray(v))
    )
    return nanmask(bad, (wf_in + pulse).astype(wf_in.dtype))

# generic row-tile fusion (r5 audit): elementwise/reduce/small-matmul bodies
# with no scans, sorts, FFTs or per-row dynamic gathers — Mosaic-lowerable;
# the two-tile probe compile still guards every group at trace time
inject_sig_pulse.tile_safe = True
inject_exp_pulse.tile_safe = True
