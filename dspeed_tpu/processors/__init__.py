"""TPU-native DSP processor library.

Every processor is a :class:`~._kernel.Kernel`: a batched JAX function plus
gufunc-style ``signature``/``types`` metadata that drives the chain compiler's
shape/dtype/unit resolution — the same metadata contract the reference's numba
gufuncs expose (reference ``dspeed/processors/__init__.py:66-172``).

Processors are lazily imported on attribute access, mirroring the reference's
registry, so importing :mod:`dspeed_tpu.processors` stays cheap.
"""

from __future__ import annotations

import importlib
from typing import Any

from ._kernel import Kernel, kernel, parse_signature

_modules = {
    # kernel name -> module
    "bl_subtract": "bl_subtract",
    "mean_below_threshold": "arithmetic",
    "pole_zero": "pole_zero",
    "double_pole_zero": "pole_zero",
    "rc_exp": "pole_zero",
    "convolve_exp": "pole_zero",
    "convolve_damped_oscillator": "pole_zero",
    "inject_damped_oscillation": "pole_zero",
    "rc_cr2": "rc_cr2",
    "recursive_filter": "recursive_filter",
    "iir_filter": "iir_filter",
    "notch_filter": "iir_filter",
    "peak_filter": "iir_filter",
    "fft": "fft",
    "ifft": "fft",
    "psd": "fft",
    "abs2norm": "fft",
    "gaussian_filter1d": "gaussian_filter1d",
    "wiener_filter": "wiener_filter",
    "discrete_wavelet_transform": "dwt",
    "poly_fit": "poly_fit",
    "poly_diff": "poly_fit",
    "poly_exp_rms": "poly_fit",
    "soft_pileup_corr": "soft_pileup_corr",
    "soft_pileup_corr_bl": "soft_pileup_corr",
    "histogram": "histogram",
    "histogram_around_mode": "histogram",
    "histogram_stats": "histogram_stats",
    "histogram_peakstats": "histogram_stats",
    "inl_correction": "corrections",
    "wf_correction": "corrections",
    "wf_alignment": "corrections",
    "get_wf_centroid": "corrections",
    "inject_sig_pulse": "pulse_injector",
    "inject_exp_pulse": "pulse_injector",
    "inject_gumbel": "pmt_pulse_injector",
    "inject_general_logistic": "pmt_pulse_injector",
    "dense_layer_no_bias": "ml",
    "dense_layer_with_bias": "ml",
    "classification_layer_no_bias": "ml",
    "classification_layer_with_bias": "ml",
    "normalisation_layer": "ml",
    "optimize_1pz": "optimize",
    "optimize_2pz": "optimize",
    "optimize_nnls": "nnls",
    "svm_predict": "svm",
    "tf_model": "tf_model",
    "fused_energy_filter": "fused",
    "fused_energy_front": "fused",
    "fused_current_front": "fused",
    "fused_conv_bank": "fused",
    "fused_t0_front": "fused",
    "chained_time_point_thresh": "tp_chain",
    "trap_filter": "trap_filters",
    "trap_norm": "trap_filters",
    "asym_trap_filter": "trap_filters",
    "trap_pickoff": "trap_filters",
    "min_max": "min_max",
    "min_max_norm": "min_max",
    "linear_slope_fit": "linear_slope_fit",
    "linear_slope_diff": "linear_slope_fit",
    "fixed_time_pickoff": "fixed_time_pickoff",
    "time_point_thresh": "time_point_thresh",
    "interpolated_time_point_thresh": "time_point_thresh",
    "multi_time_point_thresh": "time_point_thresh",
    "bi_level_zero_crossing_time_points": "time_point_thresh",
    "get_multi_local_extrema": "peak_finding",
    "peak_snr_threshold": "peak_finding",
    "multi_t_filter": "peak_finding",
    "remove_duplicates": "peak_finding",
    "multi_a_filter": "peak_finding",
    "windower": "windower",
    "moving_window_left": "moving_windows",
    "moving_window_right": "moving_windows",
    "moving_window_multi": "moving_windows",
    "avg_current": "moving_windows",
    "where": "where",
    "round_to_nearest": "round_to_nearest",
    "floor_to_nearest": "round_to_nearest",
    "ceil_to_nearest": "round_to_nearest",
    "trunc_to_nearest": "round_to_nearest",
    "convert": "unit_conversion",
    "convert_int": "unit_conversion",
    "convert_round": "unit_conversion",
    "convert_floor": "unit_conversion",
    "convert_ceil": "unit_conversion",
    "convert_trunc": "unit_conversion",
    "get": "get",
    "get_default": "get",
    "time_over_threshold": "misc",
    "saturation": "misc",
    "presum": "misc",
    "pad": "misc",
    "log_check": "misc",
    "sort": "misc",
    "t0_filter": "kernels",
    "moving_slope": "kernels",
    "step": "kernels",
    "cusp_filter": "energy_kernels",
    "zac_filter": "energy_kernels",
    "dplms": "energy_kernels",
    "dplms_filter": "energy_kernels",
    "convolve_wf": "convolutions",
    "fft_convolve_wf": "convolutions",
    "reflected_convolve_wf": "convolutions",
    "upsampler": "upsampler",
    "interpolating_upsampler": "upsampler",
}

__all__ = ["Kernel", "kernel", "parse_signature", *sorted(set(_modules))]


def __getattr__(name: str) -> Any:
    try:
        module = _modules[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}") from None
    mod = importlib.import_module(f".{module}", __name__)
    val = getattr(mod, name)
    globals()[name] = val  # cache
    return val


def __dir__():
    return __all__


import sys as _sys
from types import ModuleType as _ModuleType


class _ProcessorsModule(_sys.modules[__name__].__class__):
    """Keeps registry names resolving to kernels even when a same-named
    submodule import rebinds the package attribute (several processors share
    their module's name, e.g. ``pole_zero``): Python's import system sets
    ``package.pole_zero = <module>`` after ``import ...processors.pole_zero``,
    which would shadow the kernel for every later lookup."""

    def __getattribute__(self, name: str) -> Any:
        if name in _modules:
            val = object.__getattribute__(self, "__dict__").get(name)
            if val is None or isinstance(val, _ModuleType):
                mod = importlib.import_module(f".{_modules[name]}", __name__)
                val = getattr(mod, name)
            return val
        return super().__getattribute__(name)


_sys.modules[__name__].__class__ = _ProcessorsModule
