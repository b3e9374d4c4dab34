"""Direct tests of the accumulation-precision building blocks
(:mod:`dspeed_tpu.processors._numerics`) against float64 oracles on
adversarial data (large offsets + small noise: the HPGe regime where plain
f32 prefix sums lose the signal)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dspeed_tpu.processors._numerics import (
    PrefixSum,
    blocked_cumsum,
    hp_cumsum,
    iir_first_order,
)


@pytest.fixture
def hard_wf(rng):
    """15000-ADC baseline + unit-scale noise: running sums reach ~6e7 while
    windowed differences must resolve O(1) structure."""
    n, m = 16, 4000
    w = 15000.0 + rng.normal(0, 3, (n, m))
    w[:, 1000:1200] += 800.0  # a pulse
    return w.astype(np.float32)


@pytest.mark.parametrize("mode", ["f32", "ds", "blocked"])
def test_hp_cumsum_windowed_accuracy(hard_wf, mode):
    ps = hp_cumsum(jnp.asarray(hard_wf), mode=mode)
    rise = 600
    got = np.asarray(ps.sub(ps.shift_right(rise), jnp.float32))
    s64 = np.cumsum(hard_wf.astype(np.float64), axis=-1)
    want = s64 - np.pad(s64, [(0, 0), (rise, 0)])[:, : s64.shape[1]]
    err = np.abs(got - want).max()
    # windowed sums are ~9.6e6, so one f32 ulp of the OUTPUT is ~1.0 — the
    # compensated modes must sit within a few ulps; plain f32 accumulation
    # (running sum ~6e7, ulp ~4-8) degrades by an order of magnitude
    ulp = np.spacing(np.float32(9.6e6))
    tol = {"f32": 64 * ulp, "ds": 4 * ulp, "blocked": 16 * ulp}[mode]
    assert err < tol, (mode, err, ulp)


def test_blocked_cumsum_beats_plain_f32(hard_wf):
    s64 = np.cumsum(hard_wf.astype(np.float64), axis=-1)
    plain = np.abs(np.cumsum(hard_wf, axis=-1, dtype=np.float32) - s64).max()
    blocked = np.abs(
        np.asarray(blocked_cumsum(jnp.asarray(hard_wf)).value(jnp.float64)) - s64
    ).max()
    assert blocked < plain / 4


def test_prefix_sum_lo_take_matches_expand(hard_wf):
    """lo_take (one index per event, as trap_pickoff uses it) must agree
    with the lazily expanded low plane, including through shift_right."""
    n_ev = hard_wf.shape[0]
    for ps in (
        blocked_cumsum(jnp.asarray(hard_wf), block=128),
        blocked_cumsum(jnp.asarray(hard_wf), block=128).shift_right(37),
    ):
        full = np.asarray(ps._lo_expand())
        for i in (0, 1, 127, 128, 129, 1000, 3999):
            idx = np.full(n_ev, i, np.int32)
            got = np.asarray(ps.lo_take(jnp.asarray(idx)))
            np.testing.assert_array_equal(got, full[:, i], err_msg=f"i={i}")


def test_iir_first_order_matches_sequential(rng):
    n, m = 8, 700
    x = rng.normal(0, 100, (n, m)).astype(np.float32)
    p = 0.97
    got = np.asarray(iir_first_order(jnp.asarray(x), p, y_init=5.0, block=64))
    want = np.empty((n, m), np.float64)
    acc = np.full(n, 5.0)
    for i in range(m):
        acc = x[:, i].astype(np.float64) + p * acc
        want[:, i] = acc
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-5


def test_hp_cumsum_unknown_mode():
    with pytest.raises(ValueError):
        hp_cumsum(jnp.zeros((2, 8)), mode="bogus")
