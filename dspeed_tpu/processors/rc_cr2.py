"""RC-CR² shaper (reference ``dspeed/processors/rc_cr2.py:17``).

Matched z-transform: numerator ``(1 - z⁻¹)²``, denominator ``(1 - a z⁻¹)³``
with ``a = exp(-1/tau)``. The reference runs the third-order recursion from
``i = 3`` with ``w_out[0:3] = w_in[0:3]`` as initial history.

TPU formulation: the *triple* pole makes the order-3 companion-matrix scan
numerically hostile in float32 (the companion matrix is defective at a
repeated root; entries of its k-step products carry ~k²·aᵏ binomial terms
with alternating signs, so the log-depth matrix products cancel
catastrophically — measured ~1300× the error of the sequential recursion).
Instead the denominator is factored into a cascade of three *first-order*
stages, each a cancellation-free affine scan:

    s1ᵢ = a·s1ᵢ₋₁ + uᵢ,   s2ᵢ = a·s2ᵢ₋₁ + s1ᵢ,   yᵢ = a·yᵢ₋₁ + s2ᵢ

with initial states ``s1₂ = y₂ - 2a·y₁ + a²·y₀``, ``s2₂ = y₂ - a·y₁``,
``y₂ = w₂`` — algebraically identical to the reference recursion. A static
(config-constant) tau routes each stage through the MXU-blocked
:func:`.._numerics.iir_first_order`; per-event tau uses a scalar
``associative_scan``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask
from ._kernel import kernel
from ._numerics import iir_first_order

__all__ = ["rc_cr2"]


def _one_pole_scan(u, a, y0):
    """``y[i] = a*y[i-1] + u[i]`` with ``y[-1] = y0``; ``a`` may be batched."""
    ab = (
        jnp.broadcast_to(a[..., None], u.shape)
        if getattr(a, "ndim", 0)
        else jnp.full_like(u, a)
    )

    def comb(x, y):
        p1, b1 = x
        p2, b2 = y
        return p1 * p2, p2 * b1 + b2

    P, B = jax.lax.associative_scan(
        comb, (jnp.moveaxis(ab, -1, 0), jnp.moveaxis(u, -1, 0)), axis=0
    )
    return jnp.moveaxis(P * y0 + B, 0, -1)


@kernel("(n),()->(n)", ["ff->f", "dd->d"])
def rc_cr2(w_in, t_tau):
    n = w_in.shape[-1]
    if n <= 3:
        raise DSPFatal(
            "The length of the waveform must be larger than 3 for the filter "
            "to work safely"
        )
    acc = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    w = jnp.asarray(w_in, acc)

    static_tau = isinstance(t_tau, (int, float, np.floating)) or (
        isinstance(t_tau, np.ndarray) and t_tau.ndim == 0
    )
    if static_tau:
        # IEEE semantics for tau == 0 (-1/0 -> -inf -> a = 0), matching the
        # traced path and the reference's numpy arithmetic
        with np.errstate(divide="ignore"):
            a = float(np.exp(np.divide(-1.0, float(t_tau))))
        bad_tau = bool(np.isnan(a))

        def one_pole(u, y0):
            return iir_first_order(u, a, y_init=y0)

    else:
        tau = jnp.asarray(t_tau, acc)
        a = jnp.exp(-1.0 / tau)
        bad_tau = isnan_any(tau)

        def one_pole(u, y0):
            return _one_pole_scan(u, a, y0)

    # u[i] = w[i] - 2 w[i-1] + w[i-2] for i in [3, n)
    u = w[..., 3:] - 2.0 * w[..., 2:-1] + w[..., 1:-2]
    y0, y1, y2 = w[..., 0], w[..., 1], w[..., 2]
    s1 = one_pole(u, y2 - 2.0 * a * y1 + a * a * y0)
    s2 = one_pole(s1, y2 - a * y1)
    y = one_pole(s2, y2)
    out = jnp.concatenate([w[..., :3], y], axis=-1).astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1) | bad_tau, out)


def _rc_cr2_checker(w_in, t_tau):
    """Checked-mode flag for the reference's output-NaN fatal
    (``rc_cr2.py:93-94``): NaN inputs short-circuit to NaN outputs first
    (``:47-48``), so the raise fires only when FINITE inputs overflow the
    recursion into NaN. The kernel output is recomputed with the same
    traced ops — XLA CSE dedupes it against the real kernel call."""
    skip = isnan_any(w_in, 1) | isnan_any(t_tau)
    out = rc_cr2.fn(w_in, t_tau)
    code = jnp.where(isnan_any(out, 1) & ~skip, 1, 0).astype(jnp.int32)
    lead = jnp.broadcast_shapes(code.shape, w_in.shape[:-1])
    return jnp.broadcast_to(code, lead)


rc_cr2.checker = _rc_cr2_checker
rc_cr2.check_messages = {1: "RC-CR^2 filter produced nans in output."}
