"""Fixed-time pick-off with interpolation modes
(reference ``dspeed/processors/fixed_time_pickoff.py:20``)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask, static_int, take_per_row
from ._kernel import kernel
from ._spline import natural_spline_w2

__all__ = ["fixed_time_pickoff"]

_MODES = tuple(ord(c) for c in "infclhs")


@kernel("(n),(),()->()", ["ffb->f", "ddb->d"], static=[2], badrow_arg=0)
def fixed_time_pickoff(w_in, t_in, mode_in, badrow=None):
    """Pick off the waveform value at (fractional) index ``t_in``.

    Interpolation modes (static char, passed as ``ord(c)``): ``i`` integer,
    ``n`` nearest, ``f`` floor, ``c`` ceil, ``l`` linear, ``h`` Hermite,
    ``s`` natural cubic spline. Out-of-range or NaN index gives NaN.

    Divergence from the reference: mode ``'i'`` with a non-integral ``t_in``
    yields NaN for that event instead of raising (data-dependent ``DSPFatal``
    cannot abort a compiled TPU program).
    """
    mode = static_int(mode_in, "fixed_time_pickoff", "mode_in")
    if mode not in _MODES:
        raise DSPFatal("Unrecognized interpolation mode")
    n = w_in.shape[-1]
    t = jnp.asarray(t_in, w_in.dtype)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, w_in.shape[:-1])

    i0 = jnp.floor(t).astype(jnp.int32)
    frac = t - i0
    exact = frac == 0
    t0 = frac
    t1 = 1.0 - t0

    ch = chr(mode)
    # one compare-reduce pass for every sample the mode needs: separate
    # take_last calls each re-read the full plane from HBM (two 268 MB
    # fusions per 'l' pickoff at flagship shapes, ~0.22 ms each on v5e);
    # a stacked take_per_row picks all of them in a single multi-output
    # reduction over one read. Bit-identical under x64; within ~1 ulp in
    # f32 (the two compiled graphs fuse/FMA differently). Config-constant
    # pickoff times skip the reduction entirely: a static column slice
    # reads nothing but the picked column (take_per_row clips, so the
    # slices clip identically).
    static_t = isinstance(t_in, (int, float, np.integer, np.floating))

    def pick(w, offs):
        if static_t and np.isfinite(t_in):
            # floor AFTER casting to the dtype the array path actually
            # floors (t.dtype — jnp.asarray truncates f64->f32 when x64 is
            # off), so e.g. 10.99999999999 in f32 mode is 11.0 on both
            # routes, not 10 here and 11 there.
            j0 = int(np.floor(np.dtype(t.dtype).type(t_in)))
            nn = w.shape[-1]
            return tuple(
                w[..., min(max(j0 + o, 0), nn - 1)] for o in offs
            )
        p = take_per_row(w, jnp.stack([i0 + o for o in offs], axis=-1))
        return tuple(p[..., k] for k in range(len(offs)))

    if ch == "h":
        w_im1, w_i, w_i1, w_i2 = pick(w_in, (-1, 0, 1, 2))
    else:
        w_i, w_i1 = pick(w_in, (0, 1))
    if ch == "i":
        val = w_i
        bad_mode = ~exact
    elif ch == "n":
        val = jnp.where(t0 < 0.5, w_i, w_i1)
        bad_mode = False
    elif ch == "f":
        val = w_i
        bad_mode = False
    elif ch == "c":
        val = jnp.where(exact, w_i, w_i1)
        bad_mode = False
    elif ch == "l":
        val = jnp.where(exact, w_i, t1 * w_i + t0 * w_i1)
        bad_mode = False
    elif ch == "h":
        m0 = jnp.where(i0 == 0, w_in[..., 1] - w_in[..., 0], (w_i1 - w_im1) / 2.0)
        m1 = jnp.where(
            i0 == n - 2, w_in[..., -1] - w_in[..., -2], (w_i2 - w_i) / 2.0
        )
        herm = (
            (-2.0 * t1**3 + 3.0 * t1**2) * w_i
            + (-2.0 * t0**3 + 3.0 * t0**2) * w_i1
            - (t1**3 - t1**2) * m0
            + (t0**3 - t0**2) * m1
        )
        val = jnp.where(exact, w_i, herm)
        bad_mode = False
    else:  # 's'
        w2 = natural_spline_w2(w_in)
        p2a, p2b = pick(w2, (0, 1))
        s = (
            t1 * w_i
            + t0 * w_i1
            + ((t1**3 - t1) * p2a + (t0**3 - t0) * p2b) / 6.0
        )
        val = jnp.where(exact, w_i, s)
        bad_mode = False

    in_range = (t >= 0) & (t <= n - 1)
    row = isnan_any(w_in, 1) if badrow is None else badrow
    bad = row | jnp.isnan(t) | ~in_range
    if not isinstance(bad_mode, bool):
        bad = bad | bad_mode
    return nanmask(bad, val.astype(w_in.dtype))


def _ftp_checker(w_in, t_in, mode_in):
    """Checked-mode flag: the reference raises only in mode 'i' on a
    non-integral in-range index (``fixed_time_pickoff.py:70-85``); NaN and
    out-of-range t_in silently yield NaN there too."""
    import jax.numpy as jnp

    from ._helpers import isnan_any, static_int

    n = w_in.shape[-1]
    mode = static_int(mode_in, "fixed_time_pickoff", "mode_in")
    t = jnp.asarray(t_in)
    lead_shape = jnp.broadcast_shapes(t.shape, w_in.shape[:-1])
    if chr(mode) != "i" or not jnp.issubdtype(t.dtype, jnp.floating):
        return jnp.zeros(lead_shape, jnp.int32)
    skip = isnan_any(w_in, 1) | jnp.isnan(t) | (t < 0) | (t > n - 1)
    code = jnp.where(
        ~skip & (jnp.trunc(t) != t), jnp.int32(1), jnp.int32(0)
    )
    return jnp.broadcast_to(code, lead_shape)


fixed_time_pickoff.checker = _ftp_checker
fixed_time_pickoff.check_messages = {
    1: "fixed_time_pickoff requires integer t_in when using mode 'i'",
}


def _ftp_tile_safe(step):
    """Mode 's' runs the associative-scan spline solver — keep it out of
    row-tile groups; every other mode is selects + compare-reduce picks."""
    m = step.params[2] if len(step.params) > 2 else None
    if isinstance(m, str):
        return m.strip("'\"") != "s"
    return isinstance(m, (int, np.integer)) and int(m) != ord("s")


fixed_time_pickoff.tile_safe = _ftp_tile_safe
