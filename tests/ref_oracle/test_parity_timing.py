"""Reference-code parity: time-point, pickoff, and gather kernels.

Reference bodies: ``/root/reference/src/dspeed/processors/
fixed_time_pickoff.py``, ``time_point_thresh.py``, ``get.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from .conftest import assert_ref_parity as parity


@pytest.fixture
def step_batch(rng):
    """Noisy rising edges at varied positions/amplitudes; one all-NaN row."""
    n, nsamp = 6, 256
    t = np.arange(nsamp, dtype=np.float64)
    pos = rng.integers(60, 180, size=(n, 1))
    amp = rng.uniform(200, 3000, size=(n, 1))
    w = amp / (1.0 + np.exp(-(t - pos) / 3.0))
    w += rng.normal(0, 0.3, size=(n, nsamp))
    w[3] = np.nan
    return w


class TestFixedTimePickoff:
    @pytest.mark.parametrize("mode", list("infclhs"))
    def test_modes(self, step_batch, rng, mode):
        t_in = rng.uniform(5, 250, size=step_batch.shape[0])
        if mode == "i":
            t_in = np.floor(t_in)
        parity("fixed_time_pickoff", step_batch, t_in, ord(mode), rtol=1e-9)

    def test_nan_t_in(self, step_batch):
        t = np.full(step_batch.shape[0], np.nan)
        parity("fixed_time_pickoff", step_batch, t, ord("l"))

    def test_out_of_range(self, step_batch):
        # t_in past the end -> NaN on both sides
        t = np.full(step_batch.shape[0], 1e5)
        parity("fixed_time_pickoff", step_batch, t, ord("i"))


class TestTimePointThresh:
    @pytest.mark.parametrize("walk_forward", [0.0, 1.0])
    def test_directions(self, step_batch, rng, walk_forward):
        thresh = rng.uniform(50, 150, size=step_batch.shape[0])
        t_start = np.full(step_batch.shape[0], 200.0 if not walk_forward else 10.0)
        parity("time_point_thresh", step_batch, thresh, t_start, walk_forward)

    def test_no_crossing(self, step_batch):
        # threshold above every sample: never crossed
        parity("time_point_thresh", step_batch, 1e7, 200.0, 0.0)

    @pytest.mark.parametrize("mode", list("iabcfrnl"))
    @pytest.mark.parametrize("walk_forward", [0, 1])
    def test_interpolated(self, step_batch, rng, mode, walk_forward):
        thresh = rng.uniform(50, 150, size=step_batch.shape[0])
        t_start = float(10 if walk_forward else 200)
        parity(
            "interpolated_time_point_thresh",
            step_batch,
            thresh,
            t_start,
            walk_forward,
            ord(mode),
            rtol=1e-9,
        )

    @pytest.mark.parametrize("polarity", [1.0, -1.0])
    @pytest.mark.parametrize("mode", list("iabcfrnl"))
    def test_multi(self, step_batch, rng, mode, polarity):
        thr = np.stack(
            [rng.uniform(20, 160, size=8) for _ in range(step_batch.shape[0])]
        )
        parity(
            "multi_time_point_thresh",
            step_batch,
            thr,
            128.0,
            polarity,
            ord(mode),
            rtol=1e-9,
        )

    @pytest.mark.parametrize("polarity", [1.0, -1.0])
    @pytest.mark.parametrize("t_start", [0.0, 1.0, 17.0, 31.0])
    @pytest.mark.parametrize("mode", list("iarl"))
    def test_multi_chained_nonmonotone(self, rng, mode, polarity, t_start):
        """Non-monotone waveforms exercise the reference's *sequential*
        sorted-threshold walk (each threshold continues from the previous
        crossing position; an unfound threshold kills the rest of its group)
        — independent per-threshold first-crossing search diverges here.
        ``t_start=0`` with ``polarity=-1`` also hits the reference's
        ``i_wf=-1`` negative-index wrap start of the down-side walk
        (time_point_thresh.py:367-374)."""
        w = rng.normal(0, 3, size=(6, 32))
        w[:, -1] = -5.0
        w[:, -2] = 5.0
        thr = rng.normal(0, 3, size=(6, 4))
        thr[:, 0] = thr[:, -1]  # duplicate thresholds share a crossing
        parity(
            "multi_time_point_thresh",
            w,
            thr,
            t_start,
            polarity,
            ord(mode),
            rtol=1e-9,
        )


class TestBiLevelZeroCrossing:
    @pytest.fixture
    def bipolar_batch(self, rng):
        """Differentiated-pulse-like signals: +lobe then -lobe through zero."""
        n, nsamp = 6, 512
        t = np.arange(nsamp, dtype=np.float64)
        w = np.zeros((n, nsamp))
        for i in range(n):
            for c in rng.integers(60, 400, size=rng.integers(1, 4)):
                a = rng.uniform(100, 1000)
                w[i] += a * (t - c) / 8.0 * np.exp(-((t - c) ** 2) / (2 * 8.0**2))
        w += rng.normal(0, 0.5, size=w.shape)
        w[2] = np.nan
        return w

    @pytest.mark.parametrize("gate", [20.0, 60.0])
    def test_crossings(self, bipolar_batch, gate):
        parity(
            "bi_level_zero_crossing_time_points",
            bipolar_batch,
            40.0,
            -40.0,
            gate,
            0.0,
            dims={"m": 8},
            out_args=3,
            out_dtypes=(np.uint32, np.float64, np.float64),
            wrap1=(),
        )

    def test_no_crossings(self, bipolar_batch):
        parity(
            "bi_level_zero_crossing_time_points",
            np.abs(np.nan_to_num(bipolar_batch)) + 50.0,  # never crosses zero
            40.0,
            -40.0,
            30.0,
            0.0,
            dims={"m": 4},
            out_args=3,
            out_dtypes=(np.uint32, np.float64, np.float64),
        )


class TestGet:
    def test_get_in_range(self, rng):
        # Reference raises DSPFatal on out-of-range under jit-incompatible
        # per-event control flow; dspeed_tpu returns NaN (documented
        # divergence, get.py:18). Parity is asserted in-range only.
        a = rng.normal(0, 10, size=(6, 32))
        i = rng.integers(-32, 32, size=6)
        parity("get", a, i, out_dtypes=np.float64)

    def test_get_default(self, rng):
        a = rng.normal(0, 10, size=(6, 32))
        i = rng.integers(-64, 64, size=6)  # some out of range -> default
        parity("get_default", a, i, -7.5, out_dtypes=np.float64)


class TestTimeOverThreshold:
    def test_per_event_threshold(self, rng):
        w = rng.normal(0, 100, size=(6, 256))
        w[1] = np.nan
        thr = rng.uniform(-50, 50, size=6)
        parity("time_over_threshold", w, thr)
