"""Raw-numpy-ufunc and constant-expression parsing tests, modeled on the
reference's (``tests/test_processing_chain.py:101-223`` and
``tests/configs/numpy-parsing.json``)."""

import numpy as np
import pytest

from dspeed_tpu import build_dsp, lh5


@pytest.fixture
def tbl(rng):
    return lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=rng.normal(0, 1, (4, 32)).astype("float32"),
                dt=16, dt_units="ns",
            ),
            "timestamp": lh5.Array(np.arange(4.0) + 100.0),
        }
    )


def test_numpy_math_constants(tbl):
    config = {
        "outputs": ["timestamp", "calc1", "calc2", "calc3", "calc4", "calc5", "calc6"],
        "processors": {
            "calc1": "np.pi*timestamp",
            "calc2": "np.pi",
            "calc3": "np.pi*np.e",
            "calc4": "np.nan",
            "calc5": "np.inf",
            "calc6": "np.nan*timestamp",
        },
    }
    out = build_dsp(tbl, dsp_config=config)
    ts = out["timestamp"].nda
    np.testing.assert_allclose(out["calc1"].nda, np.pi * ts, rtol=1e-12)
    assert np.all(out["calc2"].nda == np.float64(np.pi))
    np.testing.assert_allclose(out["calc3"].nda, np.pi * np.e, rtol=1e-12)
    assert np.all(np.isnan(out["calc4"].nda))
    assert np.all(np.isinf(out["calc5"].nda))
    assert np.all(np.isnan(out["calc6"].nda))


def test_numpy_ufunc_with_const_expr_args(tbl):
    config = {
        "outputs": ["calc1"],
        "processors": {
            "calc1": {
                "function": "subtract",
                "module": "numpy",
                "args": ["timestamp-timestamp", "np.pi*timestamp", "calc1"],
            },
        },
    }
    out = build_dsp(tbl, dsp_config=config)
    ts = tbl["timestamp"].nda
    np.testing.assert_allclose(out["calc1"].nda, -np.pi * ts, rtol=1e-12)


def test_ufunc_custom_signature_none_arg(tbl):
    config = {
        "outputs": ["wf_cum"],
        "processors": {
            "wf_cum": {
                "function": "cumsum",
                "module": "numpy",
                "args": ["waveform", 1, None, "wf_cum"],
                "kwargs": {"signature": "(n),(),()->(n)", "types": ["fii->f"]},
                "unit": "ADC",
            }
        },
    }
    out = build_dsp(tbl, dsp_config=config)
    np.testing.assert_allclose(
        out["wf_cum"].values.nda,
        np.cumsum(tbl["waveform"].values.nda, axis=1),
        rtol=1e-5, atol=1e-5,
    )


def test_list_parsing(tbl):
    config = {
        "outputs": ["a1", "a2", "wf_out"],
        "processors": {
            "a1": "[1,2,3,4,5]",
            "a2": "[[1, 2], [3, 4]]",
            "wf_out": "a1+[6,7,8,9,10]",
        },
    }
    out = build_dsp(tbl, dsp_config=config, n_entries=1)
    assert np.all(out["a1"].nda == np.array([1, 2, 3, 4, 5]))
    assert np.all(out["a2"].nda == np.array([[1, 2], [3, 4]]))
    assert np.all(out["wf_out"].nda == np.array([7, 9, 11, 13, 15]))


def test_comparators():
    config = {
        "outputs": ["eq", "neq", "gt", "gte", "lt", "lte"],
        "processors": {
            "eq": "w_in == 5",
            "neq": "w_in != 5",
            "gt": "w_in > 5",
            "gte": "w_in >= 5",
            "lt": "w_in < 5",
            "lte": "w_in <= 5",
        },
    }
    w_in = np.arange(10)
    tbl_in = lh5.Table(
        {"w_in": lh5.ArrayOfEqualSizedArrays(w_in.reshape(1, 10))}
    )
    out = build_dsp(tbl_in, dsp_config=config, n_entries=1)
    assert set(out.keys()) == {"eq", "neq", "gt", "gte", "lt", "lte"}
    for k in out.keys():
        assert out[k].nda.dtype == np.dtype("bool")
    assert np.all(out["eq"].nda[0] == (w_in == 5))
    assert np.all(out["neq"].nda[0] == (w_in != 5))
    assert np.all(out["gt"].nda[0] == (w_in > 5))
    assert np.all(out["gte"].nda[0] == (w_in >= 5))
    assert np.all(out["lt"].nda[0] == (w_in < 5))
    assert np.all(out["lte"].nda[0] == (w_in <= 5))


def test_scipy_interop(tbl):
    # arbitrary module functions via signature/types kwargs (ref :226-245)
    config = {
        "outputs": ["wf_med"],
        "processors": {
            "wf_med": {
                "function": "median",
                "module": "numpy",
                "args": ["waveform", 1, "wf_med"],
                "kwargs": {"signature": "(n),()->()", "types": ["fi->f"]},
            }
        },
    }
    out = build_dsp(tbl, dsp_config=config)
    np.testing.assert_allclose(
        out["wf_med"].nda,
        np.median(tbl["waveform"].values.nda, axis=1),
        rtol=1e-6,
    )
