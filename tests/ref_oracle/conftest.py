"""Fixtures for reference-code parity tests.

These tests run the *reference's actual kernel bodies* (via the pure-Python
numba stub in ``stubs.py``) as oracles against dspeed_tpu's batched JAX
kernels — the cross-implementation harness the reference itself uses as
``compare_numba_vs_python`` (``/root/reference/tests/conftest.py:62-180``).

They assert f64-level tolerances and are skipped in TPU-numerics mode
(``DSPEED_TEST_X64=0``); the integration suites cover that mode.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import jax

from .stubs import call_ref, load_ref_processors, ref_kernel

if os.environ.get("DSPEED_TEST_X64", "1") in ("0", "false"):
    collect_ignore_glob = ["test_*"]
    pytestmark = pytest.mark.skip("reference parity requires x64 numerics")


@pytest.fixture(scope="session")
def refp():
    return load_ref_processors()


def assert_ref_parity(
    name,
    *inputs,
    dims=None,
    rtol=1e-9,
    atol=1e-12,
    out_dtypes=None,
    my_kernel=None,
    my_inputs=None,
    ref_inputs=None,
    ref_fn=None,
    **ref_kwargs,
):
    """Run reference kernel and dspeed_tpu kernel on the same inputs, compare.

    ``my_inputs``/``ref_inputs`` override the shared input list when the two
    sides take arguments in different forms (e.g. char codes vs strings).
    """
    from dspeed_tpu import processors as dp

    rfn = ref_fn if ref_fn is not None else ref_kernel(name)
    exp = call_ref(
        rfn,
        *(ref_inputs if ref_inputs is not None else inputs),
        dims=dims,
        out_dtypes=out_dtypes,
        **ref_kwargs,
    )

    k = my_kernel if my_kernel is not None else getattr(dp, name)
    mi = my_inputs if my_inputs is not None else inputs
    if getattr(k, "uses_dims", False):
        got = k(*mi, dims=dims)
    else:
        got = k(*mi)

    assert len(got) == len(exp), f"{name}: nout {len(got)} != {len(exp)}"
    for i, (g, e) in enumerate(zip(got, exp)):
        g = np.asarray(g)
        e = np.asarray(e)
        assert g.shape == e.shape, f"{name} out[{i}]: shape {g.shape} != {e.shape}"
        if e.dtype.kind in "fc":
            cmp_dt = np.complex128 if e.dtype.kind == "c" else np.float64
            np.testing.assert_allclose(
                g.astype(cmp_dt),
                e.astype(cmp_dt),
                rtol=rtol,
                atol=atol,
                equal_nan=True,
                err_msg=f"{name} out[{i}]",
            )
        else:
            np.testing.assert_array_equal(g, e, err_msg=f"{name} out[{i}]")
    return got, exp


@pytest.fixture
def ref_parity():
    assert jax.config.jax_enable_x64, "parity tests require x64"
    return assert_ref_parity


@pytest.fixture
def wf_batch(rng):
    """HPGe-like noisy exponential-decay steps, f64, with one all-NaN row and
    one NaN-poisoned sample — the adversarial battery every kernel must face."""
    n, nsamp, tau = 6, 256, 80.0
    t = np.arange(nsamp, dtype=np.float64)
    amp = rng.uniform(100, 4000, size=(n, 1))
    wf = np.where(t >= 50, amp * np.exp(-(t - 50) / tau), 0.0)
    wf += rng.normal(0, 0.5, size=(n, nsamp))
    wf[2] = np.nan
    wf[4, 100] = np.nan
    return wf
