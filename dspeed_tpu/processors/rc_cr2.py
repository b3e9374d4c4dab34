"""RC-CR² shaper (reference ``dspeed/processors/rc_cr2.py:17``).

Matched z-transform: numerator ``(1 - z⁻¹)²``, denominator ``(1 - a z⁻¹)³``
with ``a = exp(-1/tau)``. The reference runs the third-order recursion from
``i = 3`` with ``w_out[0:3] = w_in[0:3]`` as initial history; here the same
recursion is an order-3 companion-matrix ``associative_scan``
(:func:`.recursive_filter.iir_companion`) over samples ``3..n``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import cdim, isnan_any, nanmask
from ._kernel import kernel
from .recursive_filter import iir_companion

__all__ = ["rc_cr2"]


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
    tau = jnp.asarray(t_tau, acc)
    a = jnp.exp(-1.0 / tau)
    bad_tau = isnan_any(tau)

    # u[i] = w[i] - 2 w[i-1] + w[i-2] for i in [3, n)
    u = w[..., 3:] - 2.0 * w[..., 2:-1] + w[..., 1:-2]
    c = jnp.stack(
        jnp.broadcast_arrays(-3.0 * a, 3.0 * a**2, -(a**3)), axis=-1
    )
    if c.ndim == 1:
        pass
    # initial history [y[2], y[1], y[0]] = w_in[2], w_in[1], w_in[0]
    s0 = jnp.stack([w[..., 2], w[..., 1], w[..., 0]], axis=-1)
    y = iir_companion(u, c, s0)
    out = jnp.concatenate([w[..., :3], y], axis=-1).astype(w_in.dtype)
    return nanmask(isnan_any(w_in, 1) | bad_tau, out)
