"""Pole-zero cancellation filters.

Reference semantics: ``dspeed/processors/pole_zero.py`` — ``pole_zero`` (:29)
is a first-order IIR run in a float64 recursion buffer; ``double_pole_zero``
(:90) a second-order IIR derived from the z-transform of a two-exponential
decay.

TPU-native reformulation
------------------------
``pole_zero``'s recursion ``y[i] = y[i-1] + x[i] - c*x[i-1]`` telescopes to

    ``y[i] = x[i] + (1-c) * sum_{j<i} x[j]``

i.e. one prefix sum scaled by the tiny ``(1-c) = -expm1(-1/tau)`` — no
sequential scan at all, and the ``(1-c)`` scaling shrinks the prefix-sum
rounding error far below float32 ulp of the output.

``double_pole_zero``'s denominator factors exactly as
``(1 - z^-1)(1 - p z^-1)`` with ``p = b + frac*(a - b)`` (one perfect
integrator and one decaying pole), so it becomes: FIR numerator → prefix sum
→ blocked first-order recurrence (:func:`.iir_first_order`, MXU matmuls).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import cdim, isnan_any, nanmask, static_float
from ._kernel import kernel
from ._numerics import hp_cumsum, iir_first_order, shift_right

__all__ = ["pole_zero", "double_pole_zero", "rc_exp", "convolve_exp", "convolve_damped_oscillator", "inject_damped_oscillation"]


@kernel("()->()", ["f->d", "d->d"])
def rc_exp(tau):
    """RC decay exponential with zero handling (reference ``pole_zero.py:17``)."""
    tau = jnp.asarray(tau)
    return jnp.where(tau != 0, jnp.exp(-1.0 / jnp.where(tau != 0, tau, 1.0)), 0.0)


@kernel("(n),()->(n)", ["ff->f", "dd->d"])
def pole_zero(w_in, t_tau):
    """Apply a single pole-zero cancellation with time constant ``t_tau``."""
    dtype = w_in.dtype
    if hasattr(t_tau, "ndim") and getattr(t_tau, "ndim", 0) > 0:
        # per-event tau (traced): compute 1-c on device
        one_minus_c = -jnp.expm1(-1.0 / t_tau)
        bad_tau = isnan_any(t_tau)
    else:
        tau = float(t_tau)
        one_minus_c = -np.expm1(-1.0 / tau) if tau != 0 else 1.0
        bad_tau = np.isnan(tau)
    prefix = shift_right(hp_cumsum(w_in).value(), 1)
    out = (w_in + (cdim(one_minus_c) * prefix).astype(dtype)).astype(dtype)
    return nanmask(isnan_any(w_in, 1) | bad_tau, out)


@kernel("(n),(),(),()->(n)", ["ffff->f", "dddd->d"])
def double_pole_zero(w_in, t_tau1, t_tau2, frac):
    """Apply a double pole-zero cancellation (reference ``pole_zero.py:90``).

    FIR numerator ``x[i] - (a+b)x[i-1] + ab x[i-2]`` followed by the factored
    denominator: integrator (prefix sum) then single pole ``p = b+frac*(a-b)``.
    """
    n = w_in.shape[-1]
    if n <= 3:
        raise DSPFatal(
            "The length of the waveform must be larger than 3 for the filter "
            "to work safely"
        )
    tau1 = static_float(t_tau1, "double_pole_zero", "t_tau1")
    tau2 = static_float(t_tau2, "double_pole_zero", "t_tau2")
    fr = static_float(frac, "double_pole_zero", "frac")
    a = np.exp(-1.0 / tau1)
    b = np.exp(-1.0 / tau2)
    p = b + fr * (a - b)
    dtype = w_in.dtype

    # numerator FIR on the input (zero-padded history)
    x1 = shift_right(w_in, 1)
    x2 = shift_right(w_in, 2)
    fir = w_in - dtype.type(a + b) * x1 + dtype.type(a * b) * x2

    # zero-state cascade: integrator then single pole p
    z = hp_cumsum(fir).value(dtype)
    y = iir_first_order(z, p)

    # The reference forces y[0]=x[0], y[1]=x[1] before recursing from i=2.
    # Both the zero-state cascade and the reference output satisfy the same
    # 2nd-order recursion for i>=2, so they differ by a homogeneous solution
    # alpha*1^i + beta*p^i. Matching the initial conditions:
    #   y_casc[0] - x[0] = 0            => beta = -alpha
    #   y_casc[1] - x[1] = x[0]*(1 - a + frac*(a-b)) =: e
    #   alpha*(1 - p) = e               => alpha = e / (1 - p)
    # and the reference output is y_casc[i] - alpha*(1 - p^i).
    e = w_in[..., :1] * dtype.type(1.0 - a + fr * (a - b))
    alpha = e / dtype.type(1.0 - p)
    i = np.arange(n)
    pi = jnp.asarray(np.power(p, i), dtype=dtype)
    y = y - alpha * (1.0 - pi)

    bad = isnan_any(w_in, 1) | np.isnan(tau1) | np.isnan(tau2) | np.isnan(fr)
    return nanmask(bad, y.astype(dtype))


def _rc(tau):
    tau = jnp.asarray(tau)
    return jnp.where(tau != 0, jnp.exp(-1.0 / jnp.where(tau != 0, tau, 1.0)), 0.0)


@kernel("(n),()->(n)", ["fd->f", "dd->d"])
def convolve_exp(w_in, tau):
    """Convolve with a peak-normalized decaying exponential via the recursive
    filter (reference ``pole_zero.py:207``)."""
    from .recursive_filter import recursive_filter_impl

    a = jnp.ones((1,))
    b = jnp.stack(jnp.broadcast_arrays(jnp.ones(()), -_rc(tau)), axis=-1)
    return recursive_filter_impl(w_in, a, b, w_in[..., 0], w_in[..., 0])


@kernel("(n),(),(),()->(n)", ["fddd->f", "dddd->d"])
def convolve_damped_oscillator(w_in, tau, omega, phase):
    """Convolve with a peak-normalized damped oscillator
    (reference ``pole_zero.py:242``)."""
    from .recursive_filter import recursive_filter_impl

    rc = _rc(tau)
    omega = jnp.asarray(omega)
    phase = jnp.asarray(phase)
    one = jnp.ones(())
    a = jnp.stack(
        jnp.broadcast_arrays(jnp.cos(phase), -rc * jnp.cos(omega - phase)),
        axis=-1,
    )
    b = jnp.stack(
        jnp.broadcast_arrays(one, -2.0 * rc * jnp.cos(omega), rc * rc), axis=-1
    )
    return recursive_filter_impl(w_in, a, b, w_in[..., 0], w_in[..., 0])


@kernel("(n),(),(),(),()->(n)", ["fdddd->f", "ddddd->d"])
def inject_damped_oscillation(w_in, tau, omega, phase, frac):
    """Add a damped oscillation scaled by ``frac`` onto the waveform
    (reference ``pole_zero.py:292``)."""
    from .recursive_filter import recursive_filter_impl

    rc = _rc(tau)
    omega = jnp.asarray(omega)
    phase = jnp.asarray(phase)
    frac = jnp.asarray(frac)
    cp = jnp.cos(phase)
    cw = jnp.cos(omega)
    cwp = jnp.cos(omega - phase)
    one = jnp.ones(())
    a = jnp.stack(
        jnp.broadcast_arrays(
            one + frac * cp,
            -(2.0 * rc * cw + frac * cp + frac * rc * cwp),
            rc * (rc + frac * cwp),
        ),
        axis=-1,
    )
    b = jnp.stack(
        jnp.broadcast_arrays(one, -2.0 * rc * cw, rc * rc), axis=-1
    )
    return recursive_filter_impl(w_in, a, b, w_in[..., 0], 0.0)


def _pz_checker(w_in, t_tau):
    """Checked-mode flag for the reference's output-NaN fatal
    (``pole_zero.py:76-77``): NaN inputs short-circuit to NaN outputs
    first (``:57-58``), so the raise fires only when FINITE inputs
    overflow the recursion into NaN (e.g. a tiny negative tau). The
    kernel output is recomputed here with the same traced ops — XLA CSE
    dedupes it against the real kernel call in the same program."""
    skip = isnan_any(w_in, 1) | isnan_any(t_tau)
    out = pole_zero.fn(w_in, t_tau)
    code = jnp.where(isnan_any(out, 1) & ~skip, 1, 0).astype(jnp.int32)
    lead = jnp.broadcast_shapes(code.shape, w_in.shape[:-1])
    return jnp.broadcast_to(code, lead)


pole_zero.checker = _pz_checker
pole_zero.check_messages = {1: "Pole-zero filter produced nans in output."}

# generic row-tile fusion: MXU blocked-cumsum telescoped recursions
pole_zero.tile_safe = True
double_pole_zero.tile_safe = True
