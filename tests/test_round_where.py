"""round/floor/ceil/trunc and where() semantics, modeled on the reference's
tests (``tests/test_processing_chain.py:389-587``)."""

import numpy as np
import pytest

from dspeed_tpu import build_dsp, lh5
from dspeed_tpu.errors import ProcessingChainError


@pytest.fixture
def tbl(rng):
    wf = (rng.normal(0, 10, (4, 64))).astype("float32")
    return lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16, dt_units="ns"
            ),
            "eventnumber": lh5.Array(np.arange(4, dtype="int32")),
        }
    )


def test_round_plain(tbl):
    config = {
        "outputs": ["w_round", "w_floor", "w_ceil", "w_trunc"],
        "processors": {
            "w_round": "round(waveform, 4)",
            "w_floor": "floor(waveform, 4)",
            "w_ceil": "ceil(waveform, 4)",
            "w_trunc": "trunc(waveform, 4)",
        },
    }
    out = build_dsp(tbl, dsp_config=config, n_entries=1)
    wf = tbl["waveform"].values.nda[0]
    assert np.all(np.rint(wf / 4) * 4 == out["w_round"].values.nda[0])
    assert np.all(np.floor(wf / 4) * 4 == out["w_floor"].values.nda[0])
    assert np.all(np.ceil(wf / 4) * 4 == out["w_ceil"].values.nda[0])
    assert np.all(np.trunc(wf / 4) * 4 == out["w_trunc"].values.nda[0])


def test_round_united(tbl):
    config = {
        "outputs": [
            "tp_max", "t_round", "t_floor", "t_ceil", "t_trunc",
            "c_round", "c_floor", "c_ceil", "c_trunc",
        ],
        "processors": {
            "tp_min, tp_max, wf_min, wf_max": {
                "function": "min_max",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "tp_min", "tp_max", "wf_min", "wf_max"],
                "unit": ["us", "us", "ADC", "ADC"],
            },
            "t_round": "round(tp_max, 1*us)",
            "t_floor": "floor(tp_max, 1*us)",
            "t_ceil": "ceil(tp_max, 1*us)",
            "t_trunc": "trunc(tp_max, 1*us)",
            # 1 us on a 16 ns grid = 62.5 samples: round-to-even -> 62 -> 992
            "c_round": "round(1*us, waveform.period)",
            "c_floor": "floor(1*us, waveform.period)",
            "c_ceil": "ceil(1*us, waveform.period)",
            "c_trunc": "trunc(1*us, waveform.period)",
        },
    }
    out = build_dsp(tbl, dsp_config=config, n_entries=1)
    tp = out["tp_max"].nda[0]
    assert np.rint(tp) == out["t_round"].nda[0]
    assert np.floor(tp) == out["t_floor"].nda[0]
    assert np.ceil(tp) == out["t_ceil"].nda[0]
    assert np.trunc(tp) == out["t_trunc"].nda[0]
    # rounded Quantities come back in ns (the grid's unit system)
    assert out["c_round"].nda[0] == 992
    assert out["c_floor"].nda[0] == 992
    assert out["c_ceil"].nda[0] == 1008
    assert out["c_trunc"].nda[0] == 992


def test_where_semantics(tbl):
    config = {
        "outputs": ["tp_min", "test1", "test2", "test3", "test4", "test5", "test6"],
        "processors": {
            "tp_min, tp_max, wf_min, wf_max": {
                "function": "min_max",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "tp_min", "tp_max", "wf_min", "wf_max"],
                "unit": ["ns", "ns", "ADC", "ADC"],
            },
            "test1": "where(waveform<0, 0, waveform)",
            "test2": "where(waveform<0, waveform, 0)",
            "test3": "where(eventnumber==0, tp_min, 1*ns)",
            "test4": "where(eventnumber==0, tp_min, 1*us)",
            "test5": "where(eventnumber==0, 1*ns, tp_min)",
            "test6": "where(eventnumber==0, 1*us, tp_min)",
        },
    }
    out = build_dsp(tbl, dsp_config=config, n_entries=2)
    wf = tbl["waveform"].values.nda[0]
    np.testing.assert_array_equal(
        out["test1"].values.nda[0], np.where(wf < 0, 0, wf)
    )
    np.testing.assert_array_equal(
        out["test2"].values.nda[0], np.where(wf < 0, wf, 0)
    )
    tp_min = out["tp_min"].nda
    for name, other in (
        ("test3", 1), ("test4", 1000), ("test5", 1), ("test6", 1000)
    ):
        assert out[name].attrs["units"] == "ns"
    assert out["test3"].nda[0] == tp_min[0] and out["test3"].nda[1] == 1
    assert out["test4"].nda[0] == tp_min[0] and out["test4"].nda[1] == 1000
    assert out["test5"].nda[0] == 1 and out["test5"].nda[1] == tp_min[1]
    assert out["test6"].nda[0] == 1000 and out["test6"].nda[1] == tp_min[1]


def test_where_incompatible_units_raises(tbl):
    config = {
        "outputs": ["test7"],
        "processors": {
            "tp_min, tp_max, wf_min, wf_max": {
                "function": "min_max",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "tp_min", "tp_max", "wf_min", "wf_max"],
                "unit": ["ns", "ns", "ADC", "ADC"],
            },
            # coordinate (tp_min) vs non-coordinate (wf_min): must refuse
            "test7": "where(eventnumber==0, tp_min, wf_min)",
        },
    }
    with pytest.raises(ProcessingChainError):
        build_dsp(tbl, dsp_config=config, n_entries=2)


def test_ternary_matches_where(tbl):
    config = {
        "outputs": ["a", "b"],
        "processors": {
            "mv": "dspeed_tpu.processors.mean_below_threshold(waveform, np.inf, mv(unit=ADC))",
            "a": "where(mv > 0, mv, -mv)",
            "b": "mv if mv > 0 else -mv",
        },
    }
    out = build_dsp(tbl, dsp_config=config)
    np.testing.assert_array_equal(out["a"].nda, out["b"].nda)
