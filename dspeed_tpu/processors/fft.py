"""Fourier-domain processors (reference ``dspeed/processors/fft.py``).

Size contracts match the reference: ``fft`` output is ``n//2+1`` complex
bins, ``ifft`` output is ``(m-1)*2`` real samples, ``psd`` is the bin
magnitude. Batched over events; one batched XLA FFT per call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..errors import DSPFatal
from ._helpers import isnan_any, nanmask
from ._kernel import kernel

__all__ = ["fft", "ifft", "psd", "abs2norm"]


def _flat_fft(fn, x, out_len):
    # CPU FFT thunks need dim0-major layouts: flatten batch dims
    lead = x.shape[:-1]
    y = fn(x.reshape(-1, x.shape[-1]))
    return y.reshape(*lead, out_len)


@kernel("(n),(m)", ["fF", "dD"], nout=1, uses_dims=True)
def fft(w_in, dims):
    """Real FFT; ``m`` must equal ``n//2+1`` (reference ``fft.py:17``)."""
    n = w_in.shape[-1]
    m = dims["m"]
    if m != n // 2 + 1:
        raise DSPFatal(f"Size of fft must be len(w_in)//2+1 = {n // 2 + 1}")
    out = _flat_fft(lambda x: jnp.fft.rfft(x, axis=-1), w_in, m)
    return nanmask(isnan_any(w_in, 1), out)


@kernel("(n),(m)", ["Ff", "Dd"], nout=1, uses_dims=True)
def ifft(dft_in, dims):
    """Inverse real FFT; ``m`` must equal ``(n-1)*2`` (reference ``fft.py:54``)."""
    n = dft_in.shape[-1]
    m = dims["m"]
    if m != (n - 1) * 2:
        raise DSPFatal(f"Size of wf must be (len(dft_in)-1)*2 = {(n - 1) * 2}")
    bad = jnp.any(jnp.isnan(dft_in.real) | jnp.isnan(dft_in.imag), axis=-1)
    out = _flat_fft(lambda x: jnp.fft.irfft(x, axis=-1), dft_in, m)
    return nanmask(bad, out)


@kernel("(n),(m)", ["ff", "dd"], nout=1, uses_dims=True)
def psd(w_in, dims):
    """Power spectral density ``|rfft|^2 / n``; ``m == n//2+1``
    (reference ``fft.py:97`` via ``abs2norm`` ``fft.py:87``)."""
    n = w_in.shape[-1]
    m = dims["m"]
    if m != n // 2 + 1:
        raise DSPFatal(f"Size of psd must be len(w_in)//2+1 = {n // 2 + 1}")
    spec = _flat_fft(lambda x: jnp.fft.rfft(x, axis=-1), w_in, m)
    out = (spec.real**2 + spec.imag**2) / n
    return nanmask(isnan_any(w_in, 1), out.astype(w_in.dtype))


@kernel("(),()->()", ["FI->d", "DI->d"])
def abs2norm(x, norm):
    """|x|²/norm of a complex value (reference ``fft.py:87``)."""
    x = jnp.asarray(x)
    return (x.real**2 + x.imag**2) / jnp.asarray(norm)
