"""chained_time_point_thresh must be bit-identical to the cascade of
separate time_point_thresh calls it replaces."""

import numpy as np
import pytest

from dspeed_tpu.processors import chained_time_point_thresh, time_point_thresh


def _cascade(w, base, t_start, factors, dirs, starts):
    outs = []
    for k in range(len(factors)):
        a = factors[k] * base if factors[k] != 1.0 else base
        s = t_start if starts[k] < 0 else outs[starts[k]]
        # scalar walk_forward batches to a leading dim of 1: squeeze it
        outs.append(np.asarray(time_point_thresh(w, a, s, dirs[k])).reshape(-1))
    return outs


FACTORS = [1.0, 0.99, 0.95, 0.9, 0.8, 0.5, 0.2, 0.1, 0.01]
DIRS = [1, 1, 0, 0, 0, 0, 0, 0, 0]
STARTS = [-1, -1, 1, 2, 3, 4, 5, 6, 7]


def _pulses(rng, n, nsamp):
    t = np.arange(nsamp, dtype=np.float32)
    t0 = rng.uniform(nsamp * 0.3, nsamp * 0.5, (n, 1)).astype(np.float32)
    rt = rng.uniform(3, 40, (n, 1)).astype(np.float32)
    amp = rng.uniform(50, 2000, (n, 1)).astype(np.float32)
    w = amp / (1 + np.exp(-(t - t0) / rt))
    w += rng.normal(0, 1.0, (n, nsamp)).astype(np.float32)
    return w.astype(np.float32)


@pytest.mark.parametrize("nsamp", [256, 1000])
def test_matches_cascade(rng, nsamp):
    n = 64
    w = _pulses(rng, n, nsamp)
    base = w.max(axis=-1).astype(np.float32)
    t_start = np.full(n, nsamp // 4, np.float32)

    kern = chained_time_point_thresh(FACTORS, DIRS, STARTS)
    got = [np.asarray(o) for o in kern(w, base, t_start)]
    want = _cascade(w, base, t_start, FACTORS, DIRS, STARTS)
    for k, (g, e) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g, e, err_msg=f"tp[{k}] factor={FACTORS[k]}")


def test_nan_and_range_propagation(rng):
    n, nsamp = 32, 300
    w = _pulses(rng, n, nsamp)
    w[3, 100] = np.nan                     # poisoned waveform
    base = w.max(axis=-1).astype(np.float32)
    t_start = np.full(n, 50.0, np.float32)
    t_start[5] = -3.0                      # out of range
    t_start[6] = 12.5                      # non-integral
    base[7] = np.nan                       # NaN threshold base

    kern = chained_time_point_thresh(FACTORS, DIRS, STARTS)
    got = [np.asarray(o) for o in kern(w, base, t_start)]
    want = _cascade(w, base, t_start, FACTORS, DIRS, STARTS)
    for k, (g, e) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g, e, err_msg=f"tp[{k}]")
    for k in range(len(FACTORS)):
        assert np.isnan(got[k][[3, 5, 6, 7]]).all()


def test_not_found_chain_breaks(rng):
    # flat waveform: no crossings anywhere -> every link NaN
    w = np.zeros((8, 200), np.float32)
    kern = chained_time_point_thresh(FACTORS, DIRS, STARTS)
    got = [np.asarray(o) for o in kern(w, np.full(8, 100.0, np.float32),
                                       np.full(8, 50.0, np.float32))]
    for g in got:
        assert np.isnan(g).all()


def test_bad_spec():
    from dspeed_tpu.errors import DSPFatal

    with pytest.raises(DSPFatal):
        chained_time_point_thresh([1.0, 0.5], [1, 0], [-1, 1])  # start >= k
    with pytest.raises(DSPFatal):
        chained_time_point_thresh([1.0], [1, 0], [-1])
