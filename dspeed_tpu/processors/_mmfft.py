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


def _prec():
    """DFT matmul precision. ``DSPEED_TPU_FFT_PRECISION=high`` trades
    convolution accuracy (~3e-5 rel, vs ~3e-7) for ~1.7x faster transforms;
    the default keeps true-f32 accumulation."""
    import os

    if os.getenv("DSPEED_TPU_FFT_PRECISION", "highest").lower() == "high":
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.HIGHEST


def _cmatmul(ar, ai, wr, wi, spec):
    """Complex einsum (ar+i*ai) @ (wr+i*wi)."""
    hp = _prec()
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
        hp = _prec()
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


def _half_twiddle(nfft: int, dtype):
    key = ("rtw", nfft, np.dtype(dtype).name)
    p = _PLANS.get(key)
    if p is None:
        k = np.arange(nfft // 2)
        e = np.exp(-2j * np.pi * k / nfft)
        p = (e.real.astype(dtype), e.imag.astype(dtype))
        _PLANS[key] = p
    return p


def _rev_half(a):
    """``a[..., (N2-k) mod N2]`` — index reversal for conjugate symmetry."""
    return jnp.concatenate([a[..., :1], a[..., :0:-1]], axis=-1)


def fft_convolve_full(w, kern, nfft: int, size: int):
    """Full linear convolution of batched real ``w`` with shared real
    ``kern``; returns the first ``size`` samples.

    Real input rides a half-length complex FFT: even samples become the real
    plane, odd the imaginary, one N/2 transform replaces the N transform,
    and the spectrum product folds the conjugate-symmetric untangle/retangle
    into a few elementwise passes — half the matmul FLOPs and HBM traffic.
    """
    n = w.shape[-1]
    m = kern.shape[-1]
    dtype = w.dtype
    n2 = nfft // 2
    if not plan_ok(n2):  # fall back to the full-length complex transform
        pad = [(0, 0)] * (w.ndim - 1) + [(0, nfft - n)]
        xr = jnp.pad(w.astype(dtype), pad)
        fr, fi = fft4(xr, None, nfft)
        kr = jnp.pad(kern.astype(dtype), [(0, nfft - m)])
        hr, hi = fft4(kr, None, nfft)
        pr = fr * hr - fi * hi
        pi = fr * hi + fi * hr
        out_re, _ = fft4(pr, pi, nfft, inverse=True)
        return out_re[..., :size]

    def rfft_half(x):
        """Packed half rfft: returns (re, im) for k < n2 plus the (real)
        Nyquist bin, via one n2-length complex transform."""
        lead_x = x.shape[:-1]
        z = x.reshape(*lead_x, n2, 2)
        fr, fi = fft4(z[..., 0], z[..., 1], n2)
        # untangle: E[k] = (Z[k]+conj(Z[-k]))/2, O[k] = (Z[k]-conj(Z[-k]))/2i
        #           X[k] = E[k] + e^{-2pi i k/nfft} O[k]
        frr, fir = _rev_half(fr), _rev_half(fi)
        er_, ei_ = (fr + frr) * 0.5, (fi - fir) * 0.5
        or_, oi_ = (fi + fir) * 0.5, (frr - fr) * 0.5
        twr_, twi_ = _half_twiddle(nfft, dtype)
        xr = er_ + or_ * twr_ - oi_ * twi_
        xi = ei_ + or_ * twi_ + oi_ * twr_
        return xr, xi, er_[..., 0] - or_[..., 0]  # X[n2] = E[0] - O[0]

    pad = [(0, 0)] * (w.ndim - 1) + [(0, nfft - n)]
    x = jnp.pad(w.astype(dtype), pad)
    lead = x.shape[:-1]
    xr_s, xi_s, x_nyq = rfft_half(x)
    twr, twi = _half_twiddle(nfft, dtype)

    if isinstance(kern, (np.ndarray, list, tuple)) or not isinstance(
        kern, jax.core.Tracer
    ):
        # concrete kernel: half spectrum host-exact in f64
        hk = np.fft.fft(np.asarray(kern, np.float64), nfft)[: n2 + 1]
        hr = jnp.asarray(hk.real[:n2].astype(dtype))
        hi = jnp.asarray(hk.imag[:n2].astype(dtype))
        h_nyq = dtype.type(hk.real[n2])
    else:
        # kernel produced inside the trace: transform it on device
        kp = jnp.pad(jnp.asarray(kern, dtype), [(0, nfft - m)])
        hr, hi, h_nyq = rfft_half(kp)
    pr = xr_s * hr - xi_s * hi
    pi = xr_s * hi + xi_s * hr
    p_nyq = x_nyq * h_nyq

    # retangle: rebuild the packed half-length spectrum of the real result
    #   Z'[k] = E'[k] + i W^{-k} O'[k],
    #   E'[k] = (P[k]+conj(P[n2-k]))/2, O'[k] = W^{-k}(P[k]-conj(P[n2-k]))/2
    # where the reversed array's k=0 slot must hold the Nyquist bin P[n2]
    prr = jnp.concatenate([p_nyq[..., None], pr[..., :0:-1]], axis=-1)
    pir = jnp.concatenate([jnp.zeros_like(p_nyq)[..., None], pi[..., :0:-1]], axis=-1)
    epr, epi = (pr + prr) * 0.5, (pi - pir) * 0.5
    opr, opi = (pr - prr) * 0.5, (pi + pir) * 0.5
    # multiply O' by i*e^{+2pi i k/nfft} = i*(twr - i*twi) = twi + i*twr
    zr2 = epr + opr * twi - opi * twr
    zi2 = epi + opr * twr + opi * twi
    br, bi = fft4(zr2, zi2, n2, inverse=True)
    out = jnp.stack([br, bi], axis=-1).reshape(*lead, nfft)
    return out[..., :size]
