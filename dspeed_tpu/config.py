"""Global numerical policy for dspeed_tpu.

The reference performs its hot recursions in float64 scratch buffers even for
float32 data (e.g. ``dspeed/processors/pole_zero.py:62-73``). TPUs have no
native float64, so dspeed_tpu offers three accumulation policies for the
prefix-sum / recurrence reformulations of those kernels:

- ``"f64"``  — emulated float64 (requires ``jax_enable_x64``); closest to the
  reference bit-for-bit, slow on TPU, exact on CPU.
- ``"ds"``   — double-single compensated arithmetic (two float32 words,
  ~49-bit effective mantissa) via a log-depth ``associative_scan``.
- ``"blocked"`` — in-block float32 cumsum on the MXU (triangular matmul) with
  a compensated carry across block sums; rounding bounded by in-block
  magnitudes, ~6x fewer memory passes than ``"ds"``. Default on TPU.
- ``"f32"``  — plain float32; fastest, adequate for many chains.

``accumulation = "auto"`` picks ``"f64"`` when x64 is enabled, else
``"blocked"``.
"""

from __future__ import annotations

import jax

accumulation: str = "auto"


def accum_mode() -> str:
    if accumulation != "auto":
        return accumulation
    return "f64" if jax.config.jax_enable_x64 else "blocked"


# -- sequence (sample-axis) parallelism ------------------------------------
# Set by ProcessingChain.set_sharding(..., sample_axis=...) for the duration
# of a chain trace: (mesh, sample_axis_name, batch_axis_names). Kernels that
# can exploit a sharded sample axis (the long convolutions) consult it and
# route through the halo-exchange path (parallel/conv.py); everything else
# is partitioned by GSPMD automatically.
_sample_sharding = None


def set_sample_sharding(value) -> None:
    global _sample_sharding
    _sample_sharding = value


def sample_sharding():
    return _sample_sharding
