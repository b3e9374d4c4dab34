"""Waveform visualization for dspeed_tpu."""

from .waveform_browser import WaveformBrowser

__all__ = ["WaveformBrowser"]
