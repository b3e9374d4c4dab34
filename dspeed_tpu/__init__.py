"""dspeed_tpu: TPU-native bulk digital signal processing for detector waveforms.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of legend-exp/dspeed:
JSON/YAML-declared DSP graphs compile into single fused XLA programs executed
over batched LH5 waveform tables, sharded across TPU meshes.

Top-level API mirrors the reference (``dspeed/__init__.py:6-10``):
``build_dsp``, ``ProcessingChain``, ``build_processing_chain``.
"""

from __future__ import annotations

__version__ = "0.1.0"

__all__ = [
    "__version__",
    "build_dsp",
    "ProcessingChain",
    "build_processing_chain",
]


def __getattr__(name):
    # lazy imports keep `import dspeed_tpu.lh5` cheap (no jax import)
    if name == "build_dsp":
        from .build_dsp import build_dsp

        # the submodule import binds `dspeed_tpu.build_dsp` to the module;
        # rebind to the function so repeated `from dspeed_tpu import
        # build_dsp` stays callable
        globals()["build_dsp"] = build_dsp
        return build_dsp
    if name in ("ProcessingChain", "build_processing_chain"):
        from . import processing_chain

        val = getattr(processing_chain, name)
        globals()[name] = val
        return val
    raise AttributeError(name)
