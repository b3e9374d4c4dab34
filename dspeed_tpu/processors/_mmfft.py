"""Four-step (Cooley–Tukey two-level) FFT as batched matmuls.

XLA's TPU FFT lowering runs far from the HBM roofline for the batched
mid-size transforms the convolution processors need (measured ~15x off for
4096x8192). A radix-(N1, N2) decomposition turns the same transform into two
dense matmuls plus a twiddle multiply — exactly what the MXU is built for:

    X[k2 + N2*k1] = sum_{n1} W1[n1,k1] * ( T[n1,k2] *
                    sum_{n2} x[n1 + N1*n2] * W2[n2,k2] )

with W2 = exp(-2πi n2 k2 / N2), T = exp(-2πi n1 k2 / N), W1 =
exp(-2πi n1 k1 / N1). Complex arithmetic is carried as separate re/im
planes (the MXU has no complex type); DFT/twiddle matrices are built
host-side in float64 once per (nfft, dtype) and cached.

Used by :func:`.convolutions._conv_full_fft` on non-CPU backends; the CPU
path keeps ``jnp.fft`` (pocketfft is already optimal there).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_PLANS: dict = {}


def plan_ok(nfft: int) -> bool:
    """True when ``nfft`` factors into a supported (N1, N2) pair."""
    return nfft % 128 == 0 and 2 <= nfft // 128 <= 256


def _plan(nfft: int, dtype):
    key = (nfft, np.dtype(dtype).name)
    p = _PLANS.get(key)
    if p is None:
        n2 = 128
        n1 = nfft // n2
        i1 = np.arange(n1)
        i2 = np.arange(n2)
        w2 = np.exp(-2j * np.pi * np.outer(i2, i2) / n2)
        w1 = np.exp(-2j * np.pi * np.outer(i1, i1) / n1)
        tw = np.exp(-2j * np.pi * np.outer(i1, i2) / nfft)
        c = lambda a: (
            a.real.astype(dtype),
            a.imag.astype(dtype),
        )
        p = (n1, n2, c(w2), c(w1), c(tw))
        _PLANS[key] = p
    return p


def _cmatmul(ar, ai, wr, wi, spec):
    """Complex einsum (ar+i*ai) @ (wr+i*wi) with true-f32 accumulation."""
    hp = jax.lax.Precision.HIGHEST
    rr = jnp.einsum(spec, ar, wr, precision=hp)
    ii = jnp.einsum(spec, ai, wi, precision=hp)
    ri = jnp.einsum(spec, ar, wi, precision=hp)
    ir = jnp.einsum(spec, ai, wr, precision=hp)
    return rr - ii, ri + ir


def fft4(x_re, x_im, nfft: int, inverse: bool = False):
    """Length-``nfft`` DFT along the last axis via two matmuls.

    ``x_re``/``x_im`` must already be length ``nfft``. Returns ``(re, im)``.
    """
    dtype = x_re.dtype
    n1, n2, (w2r, w2i), (w1r, w1i), (twr, twi) = _plan(nfft, dtype)
    w2r, w2i = jnp.asarray(w2r), jnp.asarray(w2i)
    w1r, w1i = jnp.asarray(w1r), jnp.asarray(w1i)
    twr, twi = jnp.asarray(twr), jnp.asarray(twi)
    if inverse:
        w2i, w1i, twi = -w2i, -w1i, -twi

    lead = x_re.shape[:-1]
    # element n1 + N1*n2 lands at row n2, column n1
    rr = x_re.reshape(*lead, n2, n1)
    ri = x_im.reshape(*lead, n2, n1) if x_im is not None else None

    # inner DFT over n2: (..., n2, n1) x (n2, k2) -> (..., n1, k2)
    spec_in = "...na,nk->...ak"
    if ri is None:  # real input: half the matmuls
        hp = jax.lax.Precision.HIGHEST
        ar = jnp.einsum(spec_in, rr, w2r, precision=hp)
        ai = jnp.einsum(spec_in, rr, w2i, precision=hp)
    else:
        ar, ai = _cmatmul(rr, ri, w2r, w2i, spec_in)

    # twiddle (n1, k2)
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr

    # outer DFT over n1: (..., n1, k2) x (n1, k1) -> (..., k1, k2)
    spec_out = "...nk,nm->...mk"
    cr, ci = _cmatmul(br, bi, w1r, w1i, spec_out)

    # output index k = k1*N2 + k2: plain reshape
    out_re = cr.reshape(*lead, nfft)
    out_im = ci.reshape(*lead, nfft)
    if inverse:
        s = dtype.type(1.0 / nfft)
        out_re, out_im = out_re * s, out_im * s
    return out_re, out_im


def fft_convolve_full(w, kern, nfft: int, size: int):
    """Full linear convolution of batched real ``w`` with shared real
    ``kern`` through the matmul FFT; returns the first ``size`` samples."""
    n = w.shape[-1]
    m = kern.shape[-1]
    dtype = w.dtype
    pad = [(0, 0)] * (w.ndim - 1) + [(0, nfft - n)]
    xr = jnp.pad(w.astype(dtype), pad)
    fr, fi = fft4(xr, None, nfft)
    kr = jnp.pad(kern.astype(dtype), [(0, nfft - m)])
    hr, hi = fft4(kr, None, nfft)  # const-folded at compile time
    pr = fr * hr - fi * hi
    pi = fr * hi + fi * hr
    out_re, _ = fft4(pr, pi, nfft, inverse=True)
    return out_re[..., :size]
