"""Checked mode: data-dependent ``DSPFatal`` parity with the reference.

The reference raises in-kernel on bad per-event *data* and production halts
with the waveform range (``/root/reference/src/dspeed/errors.py:10-40``). A
compiled TPU program cannot raise per-event, so by default those events
become NaN; with ``checked=True`` the kernels' declared checkers emit
per-event flag columns that the chunk loop scans host-side, raising
``DSPFatal`` with the reference's message and the exact entry (VERDICT r3
missing item 1 / SURVEY §7 "error-flag outputs where data-dependent").

Raise-parity: for each checked kernel, the same bad event must make the
reference's own kernel body raise (executed via the ``tests/ref_oracle``
numba-stub harness) and our checker flag it with the matching message,
while the unchecked kernel yields NaN.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import jax.numpy as jnp

from dspeed_tpu import lh5
from dspeed_tpu.errors import DSPFatal
from dspeed_tpu.processing_chain import build_processing_chain

import sys as _sys

_sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_oracle.stubs import REF_ROOT, call_ref, ref_errors, ref_kernel

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_ROOT), reason="reference tree not available"
)


def _ref_raises(name, *inputs, match, **kw):
    RefFatal = ref_errors().DSPFatal
    with pytest.raises(RefFatal, match=match):
        call_ref(ref_kernel(name), *inputs, **kw)


class TestRaiseParity:
    """Reference body raises <-> our checker flags, same message."""

    def test_get_index_out_of_range(self):
        from dspeed_tpu.processors import get

        w = np.arange(24.0, dtype="float64").reshape(2, 12)
        i = np.array([3, 40], dtype="int64")
        _ref_raises("get", w, i, match="i is out of range")
        flag = np.asarray(get.checker(jnp.asarray(w), jnp.asarray(i)))
        assert flag.tolist() == [0, 1]
        assert get.check_messages[1] == "i is out of range"
        # unchecked convention: NaN (float) on the flagged event
        (out,) = get(jnp.asarray(w), jnp.asarray(i))
        assert np.isnan(np.asarray(out)[1]) and np.asarray(out)[0] == 3.0

    def test_time_point_thresh_start_checks(self):
        from dspeed_tpu.processors import time_point_thresh

        w = np.linspace(0, 10, 32)[None, :].repeat(3, 0)
        thr = np.full(3, 5.0)
        t_frac = np.array([10.5, 10.0, 10.0])
        t_oor = np.array([10.0, 10.0, 99.0])
        _ref_raises(
            "time_point_thresh", w, thr, t_frac, np.zeros(3),
            match="starting index must be an integer",
        )
        _ref_raises(
            "time_point_thresh", w, thr, t_oor, np.zeros(3),
            match="starting index is out of range",
        )
        flag = np.asarray(
            time_point_thresh.checker(
                jnp.asarray(w), jnp.asarray(thr), jnp.asarray(t_frac), 0
            )
        )
        assert flag.tolist() == [1, 0, 0]
        flag = np.asarray(
            time_point_thresh.checker(
                jnp.asarray(w), jnp.asarray(thr), jnp.asarray(t_oor), 0
            )
        )
        assert flag.tolist() == [0, 0, 2]
        # NaN inputs short-circuit in the reference BEFORE the fatal
        # checks: a NaN threshold must not flag
        thr_nan = np.array([np.nan, 5.0, 5.0])
        flag = np.asarray(
            time_point_thresh.checker(
                jnp.asarray(w), jnp.asarray(thr_nan), jnp.asarray(t_frac), 0
            )
        )
        assert flag.tolist() == [0, 0, 0]
        (out,) = time_point_thresh(
            jnp.asarray(w), jnp.asarray(thr), jnp.asarray(t_frac), 0
        )
        assert np.isnan(np.asarray(out)[0])

    def test_fixed_time_pickoff_mode_i(self):
        from dspeed_tpu.processors import fixed_time_pickoff

        w = np.linspace(0, 10, 32)[None, :].repeat(2, 0)
        t = np.array([4.5, 4.0])
        _ref_raises(
            "fixed_time_pickoff", w, t, np.int8(ord("i")),
            match="requires integer t_in",
        )
        flag = np.asarray(
            fixed_time_pickoff.checker(
                jnp.asarray(w), jnp.asarray(t), np.int8(ord("i"))
            )
        )
        assert flag.tolist() == [1, 0]
        # other modes never flag (the reference interpolates)
        flag = np.asarray(
            fixed_time_pickoff.checker(
                jnp.asarray(w), jnp.asarray(t), np.int8(ord("l"))
            )
        )
        assert flag.tolist() == [0, 0]

    def test_trap_pickoff_integer_index(self):
        from dspeed_tpu.processors import trap_pickoff

        w = np.linspace(0, 10, 64)[None, :].repeat(2, 0)
        t = np.array([30.25, 30.0])
        _ref_raises(
            "trap_pickoff", w, 4.0, 2.0, t,
            match="pick-off index must be an integer",
        )
        flag = np.asarray(
            trap_pickoff.checker(jnp.asarray(w), 4, 2, jnp.asarray(t))
        )
        assert flag.tolist() == [1, 0]

    def test_bi_level_zero_crossing_start_checks(self):
        from dspeed_tpu.processors.time_point_thresh import (
            bi_level_zero_crossing_time_points,
        )

        w = np.sin(np.linspace(0, 20, 128))[None, :].repeat(2, 0) * 10
        t = np.array([5.5, 5.0])
        _ref_raises(
            "bi_level_zero_crossing_time_points",
            w, 3.0, -3.0, 10.0, t,
            match="starting index must be an integer",
            dims={"m": 4}, out_args=3,
        )
        flag = np.asarray(
            bi_level_zero_crossing_time_points.checker(
                jnp.asarray(w), 3.0, -3.0, 10.0, jnp.asarray(t),
                dims={"m": 4},
            )
        )
        assert flag.tolist() == [1, 0]


def _table(wf, idx):
    return lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "pickidx": lh5.Array(np.asarray(idx)),
        }
    )


_CFG = {
    "outputs": ["picked"],
    "processors": {
        "picked": {
            "function": "get",
            "module": "dspeed_tpu.processors",
            "args": ["waveform", "pickidx", "picked"],
        },
    },
}


class TestChainChecked:
    def test_chain_raises_with_exact_entry(self, rng):
        wf = rng.normal(0, 1, (16, 64)).astype("float32")
        idx = np.full(16, 5, "int64")
        idx[11] = 400  # out of range
        tb = _table(wf, idx)
        chain, _, tb_out = build_processing_chain(_CFG, tb)
        chain.set_checked(True)
        with pytest.raises(DSPFatal, match="i is out of range") as exc:
            chain(tb, tb_out)
        assert exc.value.wf_range == (11, 11)
        assert "get(" in exc.value.processor

    def test_unchecked_default_is_nan(self, rng):
        wf = rng.normal(0, 1, (8, 64)).astype("float32")
        idx = np.full(8, 5, "int64")
        idx[3] = -999
        tb = _table(wf, idx)
        chain, _, tb_out = build_processing_chain(_CFG, tb)
        chain(tb, tb_out)
        picked = np.asarray(tb_out["picked"].nda)
        assert np.isnan(picked[3]) and np.isfinite(picked[0])

    def test_build_dsp_annotates_global_entry(self, tmp_path, rng):
        from dspeed_tpu import build_dsp

        wf = rng.normal(0, 1, (40, 64)).astype("float32")
        idx = np.full(40, 5, "int64")
        idx[27] = 1000  # lands in the SECOND 16-event chunk's successor
        raw = str(tmp_path / "chk_raw.lh5")
        out = str(tmp_path / "chk_dsp.lh5")
        lh5.write(_table(wf, idx), "ch000/raw", raw)
        with pytest.raises(DSPFatal, match="i is out of range") as exc:
            build_dsp(
                raw, out, _CFG, lh5_tables="ch000/raw", write_mode="r",
                buffer_len=16, checked=True,
            )
        assert exc.value.wf_range == (27, 27)
        # default mode: same file processes clean through
        build_dsp(
            raw, out, _CFG, lh5_tables="ch000/raw", write_mode="r",
            buffer_len=16,
        )
        import h5py

        with h5py.File(out) as f:
            picked = f["ch000/dsp/picked"][:]
        assert np.isnan(picked[27]) and np.isfinite(picked[0])


class TestRaiseParityRound5:
    """Round-5 checker coverage (VERDICT r4 item 4): every remaining
    per-event-data raise site in the reference."""

    def test_histogram_around_mode_nan_input(self, rng):
        from dspeed_tpu.processors import histogram_around_mode

        w = rng.normal(0, 1, (3, 64))
        w[1, 10] = np.nan
        _ref_raises(
            "histogram_around_mode", w, np.nan, 2.0,
            match="input data contains nan",
            dims={"m": 8, "p": 9}, out_args=2,
        )
        flag = np.asarray(
            histogram_around_mode.checker(jnp.asarray(w), np.nan, 2.0)
        )
        assert flag.tolist() == [0, 1, 0]
        assert (
            histogram_around_mode.check_messages[1]
            == "input data contains nan"
        )

    def test_histogram_peakstats_nan_weights(self, rng):
        from dspeed_tpu.processors import histogram_peakstats

        nb = 16
        e = np.broadcast_to(np.linspace(-8, 8, nb + 1), (2, nb + 1)).copy()
        w = rng.uniform(0, 10, (2, nb))
        w[0, 3] = np.nan
        _ref_raises(
            "histogram_peakstats", w, e, np.nan, 0, 0,
            match="nan in input weights",
        )
        flag = np.asarray(
            histogram_peakstats.checker(
                jnp.asarray(w), jnp.asarray(e), np.nan, 0, 0
            )
        )
        assert flag.tolist() == [1, 0]

    def test_get_wf_centroid_shift_checks(self, rng):
        from dspeed_tpu.processors import get_wf_centroid

        n = 128
        t = np.arange(n, dtype="f8")
        base = np.where(t < 50, -1.0, np.where(t < 78, (t - 64) / 14.0, 1.0))
        w = base[None, :].repeat(5, 0) + rng.normal(0, 0.01, (5, n))
        _ref_raises("get_wf_centroid", w, np.nan, match="shift is nan")
        _ref_raises("get_wf_centroid", w, -1.0, match="shift must be positive")
        _ref_raises(
            "get_wf_centroid", w, 500.0,
            match="shift must be shorter than input waveform size",
        )
        sh = np.array([np.nan, 5.0, -1.0, 500.0, 5.0])
        w[4] = np.nan  # NaN waveform short-circuits BEFORE the shift fatals
        flag = np.asarray(
            get_wf_centroid.checker(jnp.asarray(w), jnp.asarray(sh))
        )
        assert flag.tolist() == [1, 0, 2, 3, 0]
        assert get_wf_centroid.check_messages[3] == (
            "shift must be shorter than input waveform size"
        )

    def test_wf_alignment_centroid_shift_checks(self, rng):
        from dspeed_tpu.processors import wf_alignment

        w = rng.normal(0, 1, (5, 128))
        kw = dict(dims={"m": 40}, out_args=1, int_args=(3,))
        _ref_raises(
            "wf_alignment", w, np.nan, 5.0, 40.0,
            match="centroid is nan", **kw,
        )
        _ref_raises(
            "wf_alignment", w, 60.0, np.nan, 40.0,
            match="shift is nan", **kw,
        )
        _ref_raises(
            "wf_alignment", w, 60.0, -2.0, 40.0,
            match="shift must be positive", **kw,
        )
        _ref_raises(
            "wf_alignment", w, 60.0, 300.0, 40.0,
            match="shift must be shorter than input waveform size", **kw,
        )
        c = np.array([np.nan, 60.0, 60.0, 60.0, 60.0])
        sh = np.array([5.0, np.nan, -2.0, 300.0, 5.0])
        w[4] = np.nan  # NaN waveform short-circuits first
        flag = np.asarray(
            wf_alignment.checker(
                jnp.asarray(w), jnp.asarray(c), jnp.asarray(sh), 40
            )
        )
        assert flag.tolist() == [1, 2, 3, 4, 0]

    def test_multi_time_point_thresh_polarity(self, rng):
        from dspeed_tpu.processors import multi_time_point_thresh

        w = np.linspace(0, 200, 64)[None, :].repeat(4, 0)
        thr = np.broadcast_to(
            np.array([50.0, 100.0, 150.0]), (4, 3)
        ).copy()
        _ref_raises(
            "multi_time_point_thresh", w, thr, 32.0, 0.0, ord("i"),
            match="polarity cannot be 0",
        )
        pol = np.array([0.0, 1.0, 0.0, 0.0])
        thr[2, 1] = np.nan  # NaN threshold short-circuits
        t = np.full(4, 32.0)
        t[3] = 99999.0  # out-of-range start silently NaNs (no raise)
        flag = np.asarray(
            multi_time_point_thresh.checker(
                jnp.asarray(w), jnp.asarray(thr), jnp.asarray(t),
                jnp.asarray(pol), ord("i"),
            )
        )
        assert flag.tolist() == [1, 0, 0, 0]
        assert multi_time_point_thresh.check_messages[1] == (
            "polarity cannot be 0"
        )

    def test_pole_zero_overflow_nan_output(self):
        from dspeed_tpu.processors import pole_zero

        # finite inputs that overflow the recursion into NaN: tau=-1e-3
        # makes exp(-1/tau)=exp(1000)=inf, and a zero sample turns
        # 0*inf into NaN (the reference's only reachable output-NaN path —
        # NaN inputs short-circuit at pole_zero.py:57-58 before the raise)
        w = np.ones((3, 32))
        w[1, 4] = 0.0
        tau = np.array([27000.0, -1e-3, -1e-3])
        _ref_raises(
            "pole_zero", w[1:2], -1e-3,
            match="Pole-zero filter produced nans in output",
        )
        flag = np.asarray(
            pole_zero.checker(jnp.asarray(w), jnp.asarray(tau))
        )
        assert flag[0] == 0 and flag[1] == 1
        # NaN input must NOT flag (reference short-circuits silently)
        w_nan = w.copy()
        w_nan[0, 0] = np.nan
        flag = np.asarray(
            pole_zero.checker(jnp.asarray(w_nan), jnp.asarray(tau))
        )
        assert flag[0] == 0

    def test_rc_cr2_checker_no_false_flags(self, rng):
        from dspeed_tpu.processors import rc_cr2

        w = np.cumsum(rng.normal(0, 1, (3, 64)), axis=1)
        w[2] = np.nan
        flag = np.asarray(
            rc_cr2.checker(jnp.asarray(w), 30.0)
        )
        assert flag.tolist() == [0, 0, 0]
        assert rc_cr2.check_messages[1] == (
            "RC-CR^2 filter produced nans in output."
        )
