"""Pole-zero time-constant optimization (reference
``dspeed/processors/optimize.py:16-241``).

The reference minimizes the post-PZ slope objective
``|Σx·Σy - N·Σ(x·y)|`` with iminuit per waveform. TPU-native: the same
objective, but minimized with a fixed-iteration **golden-section search**
(1-pole) / **Adam gradient descent** (2-pole) traced in JAX — every event
optimizes in parallel on device, no per-event host round trips. Results agree
with Minuit to the tolerance of the objective's flatness (see tests); exact
optimizer parity is a non-goal (SURVEY.md §7 hard-parts #6).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_int
from ._kernel import kernel
from ._numerics import shift_right

__all__ = ["optimize_1pz", "optimize_2pz"]

_GOLD = (np.sqrt(5.0) - 1.0) / 2.0


def _pz_traced(w, tau):
    """pole_zero with traced per-event tau (telescoped prefix form)."""
    one_minus_c = -jnp.expm1(-1.0 / tau)
    prefix = shift_right(jnp.cumsum(w, axis=-1), 1)
    return w + one_minus_c[..., None] * prefix


def _dpz_traced(w, tau1, tau2, frac):
    """double_pole_zero with traced params: FIR numerator, integrator,
    then a single traced pole via an affine associative_scan."""
    a = jnp.exp(-1.0 / tau1)[..., None]
    b = jnp.exp(-1.0 / tau2)[..., None]
    fr = frac[..., None]
    x1 = shift_right(w, 1)
    x2 = shift_right(w, 2)
    u = w - (a + b) * x1 + a * b * x2
    integ = jnp.cumsum(u, axis=-1)
    p = (b + fr * (a - b)) * jnp.ones_like(w)

    def comb(c1, c2):
        (m1, v1), (m2, v2) = c1, c2
        return m1 * m2, v2 + m2 * v1

    # denominator factors as integrator x single pole: the integrator is the
    # cumsum above; solve y[i] = integ[i] + p*y[i-1] via affine scan
    _, y = jax.lax.associative_scan(comb, (p, integ), axis=-1)
    return y


def _slope_objective(y, beg: int, end: int):
    """|Σx·Σy - N·Σ(x·y)| over window [beg, end) (reference ``Model``)."""
    x = jnp.arange(beg, end, dtype=y.dtype)
    yw = y[..., beg:end]
    n = end - beg
    return jnp.abs(
        jnp.sum(x) * jnp.sum(yw, axis=-1) - n * jnp.sum(x * yw, axis=-1)
    )


@kernel("(n),(),(),(),()->()", ["fffff->f", "ddddd->d"])
def optimize_1pz(w_in, a_baseline_in, t_beg_in, t_end_in, p0_in):
    """Best single-pole-zero tau minimizing the post-PZ slope in
    ``[t_beg, t_end)`` (reference ``optimize.py:48``)."""
    n = w_in.shape[-1]
    beg = static_int(t_beg_in, "optimize_1pz", "t_beg_in")
    end = static_int(t_end_in, "optimize_1pz", "t_end_in")
    if not 0 <= beg <= n or not 0 <= end <= n:
        raise DSPFatal("the time range is out of range")
    base = jnp.asarray(a_baseline_in, w_in.dtype)
    y = w_in - (base[..., None] if base.ndim else base)
    p0 = jnp.asarray(p0_in, w_in.dtype)
    if p0.ndim == 0:
        p0 = jnp.broadcast_to(p0, w_in.shape[:-1])

    # golden-section on log-tau in [p0/30, p0*30]
    lo = jnp.log(p0 / 30.0)
    hi = jnp.log(p0 * 30.0)

    def obj(ltau):
        return _slope_objective(_pz_traced(y, jnp.exp(ltau)), beg, end)

    def step(carry, _):
        a, b = carry
        c = b - _GOLD * (b - a)
        d = a + _GOLD * (b - a)
        fc, fd = obj(c), obj(d)
        keep_left = fc < fd
        return (jnp.where(keep_left, a, c), jnp.where(keep_left, d, b)), None

    (a_f, b_f), _ = jax.lax.scan(step, (lo, hi), None, length=60)
    tau = jnp.exp((a_f + b_f) / 2.0)
    bad = (
        isnan_any(w_in, 1)
        | isnan_any(base)
        | isnan_any(p0)
    )
    return nanmask(bad, tau.astype(w_in.dtype))


@kernel(
    "(n),(),(),(),(),(),()->(),(),()",
    ["fffffff->fff", "ddddddd->ddd"],
)
def optimize_2pz(
    w_in, a_baseline_in, t_beg_in, t_end_in, p0_in, p1_in, frac_in
):
    """Best double-pole-zero (tau1, tau2, frac) minimizing the post-PZ slope
    (reference ``optimize.py:137``): Adam on (log tau1, log tau2,
    logit frac)."""
    n = w_in.shape[-1]
    beg = static_int(t_beg_in, "optimize_2pz", "t_beg_in")
    end = static_int(t_end_in, "optimize_2pz", "t_end_in")
    if not 0 <= beg <= n or not 0 <= end <= n:
        raise DSPFatal("the time range is out of range")
    base = jnp.asarray(a_baseline_in, w_in.dtype)
    y = w_in - (base[..., None] if base.ndim else base)

    def bcast(x):
        v = jnp.asarray(x, w_in.dtype)
        return jnp.broadcast_to(v, w_in.shape[:-1]) if v.ndim == 0 else v

    p0, p1, fr0 = bcast(p0_in), bcast(p1_in), bcast(frac_in)
    params0 = jnp.stack(
        [jnp.log(p0), jnp.log(p1), jnp.log(fr0 / (1.0 - fr0))], axis=-1
    )

    def obj(params):
        tau1 = jnp.exp(params[..., 0])
        tau2 = jnp.exp(params[..., 1])
        frac = jax.nn.sigmoid(params[..., 2])
        return jnp.sum(
            _slope_objective(_dpz_traced(y, tau1, tau2, frac), beg, end)
        )

    grad = jax.grad(obj)

    def adam_step(carry, i):
        params, m, v = carry
        g = grad(params)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mhat = m / (1 - 0.9 ** (i + 1))
        vhat = v / (1 - 0.999 ** (i + 1))
        params = params - 0.05 * mhat / (jnp.sqrt(vhat) + 1e-8)
        return (params, m, v), None

    (params, _, _), _ = jax.lax.scan(
        adam_step,
        (params0, jnp.zeros_like(params0), jnp.zeros_like(params0)),
        jnp.arange(200),
    )
    tau1 = jnp.exp(params[..., 0])
    tau2 = jnp.exp(params[..., 1])
    frac = jax.nn.sigmoid(params[..., 2])
    bad = isnan_any(w_in, 1) | isnan_any(base) | isnan_any(p0) | isnan_any(p1)
    return (
        nanmask(bad, tau1.astype(w_in.dtype)),
        nanmask(bad, tau2.astype(w_in.dtype)),
        nanmask(bad, frac.astype(w_in.dtype)),
    )
