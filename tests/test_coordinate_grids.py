"""Coordinate-grid consistency across windowed/down-sampled views and the
per-event offset variable in expressions (reference
``tests/test_processing_chain.py:321-386``), plus variable-length chain
outputs (``:263-286``) and I/O type round trips (``:623-691``)."""

import numpy as np
import pytest

from dspeed_tpu import build_dsp, lh5


@pytest.fixture
def pulse_tbl(rng):
    n, nsamp = 4, 4096
    t = np.arange(nsamp)
    wf = np.zeros((n, nsamp), "float32")
    t0 = 1550
    for ev in range(n):
        rt = 60 + 10 * ev
        rise = np.clip((t - t0) / rt, 0, 1)
        wf[ev] = 1000 * rise * np.where(t > t0 + rt, np.exp(-(t - t0 - rt) / 3000.0), 1.0)
    wf += rng.normal(0, 0.5, (n, nsamp)).astype("float32")
    return lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            )
        }
    )


def test_coordinate_grid_views(pulse_tbl):
    config = {
        "outputs": ["a_window", "a_downsample", "tp", "tp_window", "tp_downsample"],
        "processors": {
            "a_window": {
                "function": "fixed_time_pickoff",
                "module": "dspeed_tpu.processors",
                "args": [
                    "waveform[1000:2000]",
                    "25.6*us + waveform.offset",
                    "'i'",
                    "a_window",
                ],
                "unit": ["ADC"],
            },
            "a_downsample": {
                "function": "fixed_time_pickoff",
                "module": "dspeed_tpu.processors",
                "args": [
                    "waveform[0:4000:4]",
                    "25.6*us + waveform.offset",
                    "'i'",
                    "a_downsample",
                ],
                "unit": ["ADC"],
            },
            "tp": {
                "function": "time_point_thresh",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "a_window", "26.24*us+waveform.offset", 0, "tp"],
                "unit": "ns",
            },
            "tp_window": {
                "function": "time_point_thresh",
                "module": "dspeed_tpu.processors",
                "args": [
                    "waveform[1000:2000]",
                    "a_window",
                    "26.24*us+waveform.offset",
                    0,
                    "tp_window",
                ],
                "unit": "ns",
            },
            "tp_downsample": {
                "function": "time_point_thresh",
                "module": "dspeed_tpu.processors",
                "args": [
                    "waveform[0:4000:4]",
                    "a_window",
                    "26.24*us+waveform.offset",
                    0,
                    "tp_downsample",
                ],
                "unit": "ns",
            },
        },
    }
    out = build_dsp(pulse_tbl, dsp_config=config)
    # the same physical pickoff time through two different grids
    np.testing.assert_array_equal(
        out["a_window"].nda, out["a_downsample"].nda
    )
    # threshold times agree exactly between full and windowed views,
    # and within one coarse sample for the decimated view
    np.testing.assert_array_equal(out["tp_window"].nda, out["tp"].nda)
    d = out["tp_downsample"].nda - out["tp"].nda
    assert np.all(np.abs(d) < 128)
    assert out["tp"].attrs["units"] == "ns"


def test_variable_length_chain_output(rng):
    wf = rng.normal(0, 0.2, (6, 256)).astype("float32")
    for ev in range(6):
        for p in (40, 120, 200)[: ev % 3 + 1]:
            t = np.arange(256) - p
            wf[ev] += np.where(t >= 0, 30.0 * np.exp(-np.abs(t) / 5.0), 0.0)
    tbl = lh5.Table(
        {"waveform": lh5.WaveformTable(values=wf, dt=16, dt_units="ns")}
    )
    config = {
        "outputs": ["vt_max_out", "n_max_out"],
        "processors": {
            "vt_max_out, vt_min_out, n_max_out, n_min_out": {
                "function": "get_multi_local_extrema",
                "module": "dspeed_tpu.processors",
                "args": [
                    "waveform", 5, 5, 0, 10, 0,
                    "vt_max_out(10, vector_len=n_max_out)",
                    "vt_min_out(10)", "n_max_out", "n_min_out",
                ],
                "unit": "ADC",
            }
        },
    }
    out = build_dsp(tbl, dsp_config=config)
    vt = out["vt_max_out"]
    assert isinstance(vt, lh5.VectorOfVectors)
    lens = [len(vt[i]) for i in range(6)]
    assert lens == [int(x) for x in out["n_max_out"].nda]
    assert max(lens) >= 1


def test_io_type_round_trips(rng):
    """All LGDO input column types flow through the chain unchanged."""
    n = 6
    tbl = lh5.Table(
        {
            "scalar_col": lh5.Array(np.arange(n, dtype="float64")),
            "aoesa_col": lh5.ArrayOfEqualSizedArrays(
                rng.normal(0, 1, (n, 12))
            ),
            "vov_col": lh5.VectorOfVectors(
                data=[np.arange(i + 1, dtype="float64") for i in range(n)]
            ),
            "wf_col": lh5.WaveformTable(
                values=rng.normal(0, 1, (n, 16)), dt=16, dt_units="ns"
            ),
        }
    )
    config = {
        "outputs": ["s2", "a2", "v2", "w2"],
        "processors": {
            "s2": "scalar_col*1",
            "a2": "aoesa_col*1",
            "v2": "vov_col(shape=8, vector_len=len(vov_col))*1",
            "w2": "wf_col*1",
        },
    }
    out = build_dsp(tbl, dsp_config=config)
    np.testing.assert_array_equal(out["s2"].nda, tbl["scalar_col"].nda)
    np.testing.assert_array_equal(out["a2"].nda, tbl["aoesa_col"].nda)
    for i in range(n):
        np.testing.assert_array_equal(out["v2"][i], tbl["vov_col"][i])
    np.testing.assert_array_equal(
        out["w2"].values.nda, tbl["wf_col"].values.nda
    )
    assert out["w2"].dt.nda[0] == 16.0
