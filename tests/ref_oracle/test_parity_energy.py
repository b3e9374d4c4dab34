"""Reference-code parity: baseline/shaping/energy kernels.

Each test runs the reference's actual kernel body (loaded unmodified via the
numba stub) and the dspeed_tpu JAX kernel on the same adversarial inputs
(NaN rows, NaN-poisoned samples, per-event params) and asserts allclose with
NaN equality. Reference bodies: ``/root/reference/src/dspeed/processors/``.
"""

from __future__ import annotations

import numpy as np
import pytest

from .conftest import assert_ref_parity as parity


class TestBaseline:
    def test_bl_subtract(self, wf_batch):
        parity("bl_subtract", wf_batch, 12.5)

    def test_bl_subtract_per_event(self, wf_batch, rng):
        bl = rng.uniform(-5, 5, size=wf_batch.shape[0])
        parity("bl_subtract", wf_batch, bl)

    def test_mean_below_threshold(self, wf_batch):
        parity("mean_below_threshold", wf_batch, 50.0)

    def test_linear_slope_fit(self, wf_batch):
        parity("linear_slope_fit", wf_batch)

    def test_linear_slope_diff(self, wf_batch):
        parity("linear_slope_diff", wf_batch, 0.3, -2.0)

    def test_log_check(self, wf_batch):
        parity("log_check", np.abs(wf_batch) + 1.0)
        parity("log_check", wf_batch)  # has negatives -> NaN rows

    def test_sort(self, wf_batch):
        parity("sort", wf_batch)

    def test_min_max(self, wf_batch):
        parity("min_max", wf_batch)

    def test_min_max_norm(self, wf_batch):
        # reference body indexes a_min[0]/a_max[0] (min_max.py:133)
        parity("min_max_norm", wf_batch, -3.0, 4000.0, wrap1=(1, 2))
        parity("min_max_norm", wf_batch, -5000.0, 4000.0, wrap1=(1, 2))
        parity("min_max_norm", wf_batch, 0.0, 4000.0, wrap1=(1, 2))

    def test_saturation(self, wf_batch):
        w = np.clip(wf_batch, 0, 2**12 - 1)
        w[0, 10:20] = 2**12 - 1
        w[1, :5] = 0
        parity("saturation", w, 12.0)

    def test_time_over_threshold(self, wf_batch):
        parity("time_over_threshold", wf_batch, 100.0)


class TestPoleZero:
    def test_pole_zero(self, wf_batch):
        parity("pole_zero", wf_batch, 80.0)

    def test_pole_zero_per_event(self, wf_batch, rng):
        tau = rng.uniform(50, 120, size=wf_batch.shape[0])
        parity("pole_zero", wf_batch, tau)

    def test_double_pole_zero(self, wf_batch):
        # f32: two-pole recursion over 256 samples accumulates ~3e-5 relative
        parity(
            "double_pole_zero", wf_batch, 80.0, 20.0, 0.7, rtol=1e-8,
            f32_rtol=1e-4,
        )

    def test_rc_cr2(self, wf_batch):
        # Triple pole at exp(-1/tau): cond ~ (1-a)^-3; the one-pole cascade
        # tracks the sequential f64 recursion to ~2e-6 of the peak in f32
        # (the order-3 companion scan was ~1000x worse — see rc_cr2.py).
        parity(
            "rc_cr2", wf_batch, 30.0, rtol=1e-6, atol=1e-9, f32_rel_floor=1e-5,
        )

    def test_rc_cr2_per_event(self, wf_batch, rng):
        # traced-tau path: scalar affine scan instead of the blocked matmul
        tau = rng.uniform(20, 50, size=wf_batch.shape[0])
        parity(
            "rc_cr2", wf_batch, tau, rtol=1e-6, atol=1e-9, f32_rel_floor=1e-4,
        )


class TestTrapFilters:
    def test_trap_filter(self, wf_batch):
        parity("trap_filter", wf_batch, 16, 8)

    def test_trap_norm(self, wf_batch):
        parity("trap_norm", wf_batch, 16, 8)

    def test_asym_trap_filter(self, wf_batch):
        parity("asym_trap_filter", wf_batch, 12, 6, 24)

    def test_trap_pickoff(self, wf_batch):
        # f32: cumsum-difference trapezoid rounds ~1e-5 relative at pickoff
        parity("trap_pickoff", wf_batch, 10, 4, 120.0, f32_rtol=5e-5)

    def test_trap_edge_widths(self, rng):
        w = rng.normal(0, 1, (3, 64))
        parity("trap_filter", w, 1, 0)
        parity("asym_trap_filter", w, 1, 0, 1)


class TestMovingWindows:
    def test_moving_window_left(self, wf_batch):
        parity("moving_window_left", wf_batch, 16.0)

    def test_moving_window_right(self, wf_batch):
        parity("moving_window_right", wf_batch, 16.0)

    @pytest.mark.parametrize("mw_type", [0, 1, 2])
    @pytest.mark.parametrize("num_mw", [2, 3])
    def test_moving_window_multi(self, wf_batch, num_mw, mw_type):
        # prefix-sum vs running-sum rounding: abs diffs ~1e-12 on f64;
        # in f32 the rounding scales with the running-sum magnitude, not
        # the output (rel_floor anchors the bound to max|expected|)
        parity(
            "moving_window_multi", wf_batch, 12.0, float(num_mw), mw_type,
            atol=1e-9, f32_rel_floor=1e-5,
        )

    def test_avg_current(self, wf_batch):
        n = wf_batch.shape[-1]
        parity("avg_current", wf_batch, 10.0, dims={"m": n - 10}, out_args=1)


class TestSoftPileup:
    def test_soft_pileup_corr(self, wf_batch):
        parity(
            "soft_pileup_corr",
            np.abs(wf_batch) + 10,
            40.0,
            80.0,
            rtol=1e-8,
            int_args=(1,),
        )

    def test_soft_pileup_corr_bl(self, wf_batch):
        parity(
            "soft_pileup_corr_bl",
            np.abs(wf_batch) + 10,
            40.0,
            80.0,
            5.0,
            rtol=1e-8,
            int_args=(1,),
        )


class TestPresumWindower:
    def test_windower(self, wf_batch, rng):
        t0 = rng.uniform(-20, 260, size=wf_batch.shape[0])
        t0[0] = 100.0
        parity("windower", wf_batch, np.floor(t0), dims={"m": 64}, out_args=1)

    @pytest.mark.parametrize("do_norm", [0.0, 1.0])
    def test_presum(self, wf_batch, do_norm):
        n = wf_batch.shape[-1]
        # ps_fact is an inout scalar the reference derives from len ratios
        parity(
            "presum", wf_batch, do_norm, dims={"m": n // 4}, out_args=2,
            intish_outs=(0,),
        )
