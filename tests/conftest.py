"""Pytest fixtures for dspeed_tpu.

Tests run on a virtual 8-device CPU mesh (the driver separately dry-runs the
multi-chip path): ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` and
``JAX_PLATFORMS=cpu`` must be set before jax initializes, so this conftest is
imported first. ``jax_enable_x64`` is on so float64 chains match the
reference's float64 numerics bit-for-bit on CPU.
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# x64 gives bit-level parity with the reference's float64 recursions; set
# DSPEED_TEST_X64=0 to run the suite in TPU-mode numerics (f32 + blocked
# accumulation) instead
if os.environ.get("DSPEED_TEST_X64", "1") not in ("0", "false"):
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def exp_decay_wf(rng):
    """Batch of exponential-decay step waveforms (HPGe-like), float32."""
    n, nsamp, tau = 8, 1024, 500.0
    t = np.arange(nsamp)
    amp = rng.uniform(100, 4000, size=(n, 1))
    t0 = 200
    wf = np.where(t >= t0, amp * np.exp(-(t - t0) / tau), 0.0)
    wf += rng.normal(0, 0.1, size=(n, nsamp))
    return wf.astype("float32")


def compare_kernel_vs_numpy(kernel, np_ref, inputs, rtol=1e-6, atol=1e-8):
    """Parity oracle: run a dspeed_tpu Kernel and a reference-semantics numpy
    implementation on the same batched inputs, assert allclose with NaN
    equality — the analog of the reference's ``compare_numba_vs_python``
    (``tests/conftest.py:62-180``).
    """
    outs = kernel(*inputs)
    ref = np_ref(*[np.asarray(x) for x in inputs])
    if not isinstance(ref, tuple):
        ref = (ref,)
    assert len(outs) == len(ref)
    for o, r in zip(outs, ref):
        np.testing.assert_allclose(
            np.asarray(o), r, rtol=rtol, atol=atol, equal_nan=True
        )
    return outs


@pytest.fixture
def kernel_oracle():
    return compare_kernel_vs_numpy
