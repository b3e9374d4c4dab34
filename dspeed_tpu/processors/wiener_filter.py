"""Wiener filter factory (reference ``dspeed/processors/wiener_filter.py:13``).

Loads a superpulse + noise waveform from an LH5 file at build time, designs
the Wiener filter in the frequency domain, and returns a processor that
multiplies a Fourier-domain waveform by it.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..errors import DSPFatal
from ._kernel import Kernel

__all__ = ["wiener_filter"]


def wiener_filter(file_name_array) -> Kernel:
    from ..lh5 import read

    try:
        file_name = file_name_array[0] if isinstance(
            file_name_array, (list, tuple, np.ndarray)
        ) else file_name_array
    except Exception:
        raise DSPFatal("init_args must be an array with the filename")

    try:
        superpulse = read("spms/processed/superpulse", file_name).nda
        noise_wf = read("spms/processed/noise_wf", file_name).nda
    except (OSError, KeyError) as e:
        raise DSPFatal(
            "File must be a valid lh5 file with spms/processed/superpulse "
            "and spms/processed/noise_wf"
        ) from e

    if len(superpulse) <= 0:
        raise DSPFatal("The length of the filter must be positive")
    if len(superpulse) != len(noise_wf):
        raise DSPFatal(
            "The length of the superpulse must be equal to the length of "
            "the noise waveform"
        )
    if np.argmax(superpulse) <= 0 or np.argmax(superpulse) > len(superpulse):
        raise DSPFatal(
            "The index of the maximum of the superpulse must occur within "
            "the waveform"
        )

    fft_sp = np.fft.fft(superpulse)
    fft_noise = np.fft.fft(noise_wf)
    # point-spread function: superpulse deconvolved with a delta at its max
    delta = np.zeros_like(superpulse)
    delta[np.argmax(superpulse)] = np.amax(superpulse)
    fft_psf = fft_sp / np.fft.fft(delta)
    psd_noise = fft_noise * np.conj(fft_noise)
    psd_sp = fft_sp * np.conj(fft_sp)
    taps = np.conj(fft_psf) / (fft_psf * np.conj(fft_psf) + psd_noise / psd_sp)

    def fn(fft_w_in):
        if fft_w_in.shape[-1] != len(taps):
            raise DSPFatal(
                "The filter is not the same length of the input waveform"
            )
        t = jnp.asarray(taps, fft_w_in.dtype)
        bad = jnp.any(
            jnp.isnan(fft_w_in.real) | jnp.isnan(fft_w_in.imag), axis=-1,
            keepdims=True,
        )
        out = fft_w_in * t
        return jnp.where(bad, jnp.nan, out)

    return Kernel(fn, "(n)->(n)", ["F->F", "D->D"], name="wiener_filter")
