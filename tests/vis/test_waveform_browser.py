"""WaveformBrowser tests, mirroring the reference's vis test strategy
(``tests/vis/test_waveform_browser.py:10-104``): construction and drawing on
file/iterator/table inputs, entry lists, legends, norm/align."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from dspeed_tpu import lh5
from dspeed_tpu.vis import WaveformBrowser

CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "..", "configs", "hpge-energy-timing.yaml"
)
DB = {"pz": {"tau": 27460.5}}


@pytest.fixture(scope="module")
def raw_file(tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_build_dsp import make_hpge_waveforms

    path = str(tmp_path_factory.mktemp("vis") / "vis_raw.lh5")
    wf, amp, t0, bl = make_hpge_waveforms(n=32)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    lh5.write(tb, "geds/raw", path)
    return path


def test_basic_waveform_draw(raw_file):
    wb = WaveformBrowser(raw_file, "geds/raw", lines="waveform")
    wb.draw_entry(3)
    assert wb.n_stored == 1
    line = wb.lines["waveform"][0]
    assert len(line.get_xdata()) == 4096
    assert wb.ax.get_xlabel() == "ns"


def test_dsp_outputs_and_legend(raw_file):
    wb = WaveformBrowser(
        raw_file,
        "geds/raw",
        dsp_config=CONFIG,
        database=DB,
        lines=["wf_blsub", "tp_50", "trapEmax"],
        legend=["trapEmax"],
        x_unit="us",
    )
    wb.draw_entry([1, 2], append=False)
    assert wb.n_stored == 2
    # waveform drawn in us
    x = wb.lines["wf_blsub"][0].get_xdata()
    assert x[-1] == pytest.approx(4095 * 16.0 / 1000.0)
    # tp_50 is a vertical line at the ns->us converted crossing
    vx = wb.lines["tp_50"][0].get_xdata()
    assert vx[0] == vx[1]
    # trapEmax (ADC) is a horizontal line
    hy = wb.lines["trapEmax"][0].get_ydata()
    assert hy[0] == hy[1]
    # legend rendered with the trapEmax value
    wb.draw_current()
    texts = [t.get_text() for t in wb.ax.get_legend().get_texts()]
    assert any("trapEmax" in t for t in texts)


def test_table_input_and_iteration(raw_file):
    tb = lh5.read("geds/raw", raw_file)
    wb = WaveformBrowser(tb, lines="waveform", n_drawn=4)
    entries = wb.draw_next()
    assert list(entries) == [0, 1, 2, 3]
    assert wb.n_stored == 4


def test_norm_and_align(raw_file):
    wb = WaveformBrowser(
        raw_file,
        "geds/raw",
        dsp_config=CONFIG,
        database=DB,
        lines="wf_blsub",
        norm="trapEmax",
        align="tp_50",
    )
    wb.draw_entry(0)
    y = wb.lines["wf_blsub"][0].get_ydata()
    # normalized waveform peaks near 1
    assert 0.8 < np.nanmax(y) < 1.3
    # aligned: tp_50 sits at x=0, so x range must straddle 0
    x = wb.lines["wf_blsub"][0].get_xdata()
    assert x[0] < 0 < x[-1]


def test_chunk_crossing(raw_file):
    wb = WaveformBrowser(raw_file, "geds/raw", lines="waveform", buffer_len=8)
    wb.find_entry(3)
    wb.find_entry(20)  # different chunk
    assert wb.n_stored == 2
    with pytest.raises(IndexError):
        wb.find_entry(99)


def test_entry_list_and_aux_values(raw_file):
    aux = {"run_label": np.array([f"r{i}" for i in range(32)], dtype=object)}
    wb = WaveformBrowser(
        raw_file,
        "geds/raw",
        entry_list=[3, 7, 11, 19],
        lines="waveform",
        aux_values=aux,
        legend=["run_label"],
    )
    assert len(wb) == 4
    wb.draw_entry(1)  # selection-space entry 1 = global entry 7
    assert wb.n_stored == 1
    assert wb.legend_vals["run_label"][0] == "r7"
