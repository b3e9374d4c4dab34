"""Pole-zero time-constant optimization (reference
``dspeed/processors/optimize.py:16-241``).

The reference minimizes the post-PZ slope objective
``|Σx·Σy - N·Σ(x·y)|`` with iminuit per waveform. TPU-native: the same
objective, but minimized with a fixed-iteration **golden-section search**
(1-pole) / **batched Nelder-Mead simplex** (2-pole) traced in JAX — every
event optimizes in parallel on device, no per-event host round trips.
Results agree with Minuit to the tolerance of the objective's flatness (see
tests); exact optimizer parity is a non-goal (SURVEY.md §7 hard-parts #6).
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


def _nelder_mead(f, x0, iters: int = 150, step: float = 0.15):
    """Batched Nelder-Mead: minimize ``f`` from ``x0`` of shape ``(..., k)``.

    ``f`` maps a ``(..., v, k)`` stack of points to ``(..., v)`` values.
    All events run the same fixed iteration count in lockstep (branch-free
    reflection/expansion/contraction/shrink via masks), so the whole batch
    traces to one XLA program.
    """
    k = x0.shape[-1]
    eye = jnp.eye(k, dtype=x0.dtype)
    simplex = jnp.concatenate(
        [x0[..., None, :], x0[..., None, :] + step * eye], axis=-2
    )
    fv = f(simplex)

    def it(carry, _):
        s, fv = carry
        order = jnp.argsort(fv, axis=-1)
        s = jnp.take_along_axis(s, order[..., None], axis=-2)
        fv = jnp.take_along_axis(fv, order, axis=-1)
        worst = s[..., -1, :]
        fb, fsw, fw = fv[..., 0], fv[..., -2], fv[..., -1]
        c = jnp.mean(s[..., :-1, :], axis=-2)
        cand = jnp.stack(
            [
                c + (c - worst),  # reflect
                c + 2.0 * (c - worst),  # expand
                c + 0.5 * (worst - c),  # contract
            ],
            axis=-2,
        )
        fr, fe, fc = jnp.moveaxis(f(cand), -1, 0)
        xr, xe, xc = jnp.moveaxis(cand, -2, 0)
        use_e = (fr < fb) & (fe < fr)
        use_r = ~use_e & (fr < fsw)
        use_c = ~use_e & ~use_r & (fc < fw)
        new_x = jnp.where(
            use_e[..., None],
            xe,
            jnp.where(use_r[..., None], xr, jnp.where(use_c[..., None], xc, worst)),
        )
        new_f = jnp.where(use_e, fe, jnp.where(use_r, fr, jnp.where(use_c, fc, fw)))
        s_acc = s.at[..., -1, :].set(new_x)
        f_acc = fv.at[..., -1].set(new_f)
        shrink = ~use_e & ~use_r & ~use_c
        s_shr = s.at[..., 1:, :].set(
            s[..., 0:1, :] + 0.5 * (s[..., 1:, :] - s[..., 0:1, :])
        )
        s_out = jnp.where(shrink[..., None, None], s_shr, s_acc)
        f_out = jnp.where(shrink[..., None], f(s_out), f_acc)
        return (s_out, f_out), None

    (s, fv), _ = jax.lax.scan(it, (simplex, fv), None, length=iters)
    best = jnp.argmin(fv, axis=-1)
    return jnp.take_along_axis(s, best[..., None, None], axis=-2)[..., 0, :]


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
    "(n),(),(),(),(),(),(),(),()->(),(),()",
    ["fffffffff->fff", "ddddddddd->ddd"],
)
def optimize_2pz(
    w_in, a_baseline_in, t_beg_in, t_end_in, tau_upper_bound,
    frac_upper_bound, p0_in, p1_in, p2_in
):
    """Best double-pole-zero (tau1, tau2, frac) minimizing the post-PZ slope
    (reference ``optimize.py:137``, same positional args incl. the upper
    bounds): Adam on (log tau1, log tau2, logit(frac/frac_ub)), taus clamped
    to ``(0, tau_upper_bound]`` and frac to ``(0, frac_upper_bound)``."""
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

    tau_ub = float(tau_upper_bound)
    frac_ub = float(frac_upper_bound)
    log_tau_ub = jnp.asarray(np.log(tau_ub), w_in.dtype)
    p0, p1, fr0 = bcast(p0_in), bcast(p1_in), bcast(p2_in)
    r0 = jnp.clip(fr0 / frac_ub, 1e-6, 1.0 - 1e-6)
    params0 = jnp.stack(
        [jnp.log(p0), jnp.log(p1), jnp.log(r0 / (1.0 - r0))], axis=-1
    )

    def obj(pstack):
        # pstack: (..., v, 3) simplex vertices -> (..., v) objectives
        tau1 = jnp.exp(jnp.minimum(pstack[..., 0], log_tau_ub))
        tau2 = jnp.exp(jnp.minimum(pstack[..., 1], log_tau_ub))
        frac = frac_ub * jax.nn.sigmoid(pstack[..., 2])
        y_exp = jnp.broadcast_to(
            y[..., None, :], y.shape[:-1] + (pstack.shape[-2], y.shape[-1])
        )
        return _slope_objective(_dpz_traced(y_exp, tau1, tau2, frac), beg, end)

    params = _nelder_mead(obj, params0, iters=150)
    tau1 = jnp.exp(jnp.minimum(params[..., 0], log_tau_ub))
    tau2 = jnp.exp(jnp.minimum(params[..., 1], log_tau_ub))
    frac = frac_ub * jax.nn.sigmoid(params[..., 2])
    bad = isnan_any(w_in, 1) | isnan_any(base) | isnan_any(p0) | isnan_any(p1)
    return (
        nanmask(bad, tau1.astype(w_in.dtype)),
        nanmask(bad, tau2.astype(w_in.dtype)),
        nanmask(bad, frac.astype(w_in.dtype)),
    )
