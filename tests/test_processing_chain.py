"""Engine integration tests, modeled on the reference's test strategy
(``tests/test_processing_chain.py``): slicing with units, unit conversion
equivalence, coordinate grids, round/astype/where semantics, I/O round trips.
"""

import numpy as np
import pytest

from dspeed_tpu import lh5
from dspeed_tpu.errors import ProcessingChainError
from dspeed_tpu.processing_chain import ProcessingChain, build_processing_chain


def make_wf_table(n=8, nsamp=100, dt=16, t0=0.0, dtype="float32", seed=0):
    rng = np.random.default_rng(seed)
    wf = rng.normal(0, 1, size=(n, nsamp)).astype(dtype)
    return (
        lh5.Table(
            {
                "wf": lh5.WaveformTable(
                    values=wf, t0=t0, t0_units="ns", dt=dt, dt_units="ns"
                )
            }
        ),
        wf,
    )


def run_chain(config, tb_in, db_dict=None):
    chain, _, tb_out = build_processing_chain(config, tb_in, db_dict=db_dict)
    return chain(tb_in, tb_out)


class TestSlicing:
    def test_basic_slice(self):
        tb, wf = make_wf_table()
        config = {
            "outputs": ["wf_win"],
            "processors": {
                "wf_win": "wf[10:50]",
            },
        }
        out = run_chain(config, tb)
        np.testing.assert_array_equal(out["wf_win"].values.nda, wf[:, 10:50])

    def test_unit_slice(self):
        # slice bounds in physical units are converted via the grid period
        tb, wf = make_wf_table(dt=16)
        config = {
            "outputs": ["wf_win"],
            "processors": {
                "wf_win": "wf[160*ns:800*ns]",
            },
        }
        out = run_chain(config, tb)
        np.testing.assert_array_equal(out["wf_win"].values.nda, wf[:, 10:50])

    def test_strided_slice_grid(self):
        # stride multiplies the output grid period; t0 shifts by start*period
        tb, wf = make_wf_table(dt=16, t0=32.0)
        config = {
            "outputs": ["wf_win"],
            "processors": {
                "wf_win": "wf[4:84:2]",
            },
        }
        chain, _, tb_out = build_processing_chain(config, tb)
        out = chain(tb, tb_out)
        np.testing.assert_array_equal(out["wf_win"].values.nda, wf[:, 4:84:2])
        assert out["wf_win"].dt.nda[0] == 32  # 16 ns * stride 2
        assert out["wf_win"].t0.nda[0] == 32.0 + 4 * 16.0

    def test_negative_index_names(self):
        chain = ProcessingChain(buffer_len=8)
        names = chain.get_variable("wf[10:50]", get_names_only=True)
        assert names == ["wf"]


class TestExpressions:
    def test_arith_const_folding(self):
        chain = ProcessingChain(buffer_len=8)
        assert chain.get_variable("3 + 4") == 7
        assert chain.get_variable("2 * 3.5") == 7.0
        assert chain.get_variable("10 // 3") == 3
        assert chain.get_variable("-(2 - 5)") == 3

    def test_unit_arithmetic(self):
        chain = ProcessingChain(buffer_len=8)
        q = chain.get_variable("10*us")
        assert float(q.to("ns").m) == pytest.approx(10000)
        # dimensionless ratios collapse to floats
        assert chain.get_variable("us / ns") == pytest.approx(1000)

    def test_np_attr(self):
        chain = ProcessingChain(buffer_len=8)
        assert chain.get_variable("np.pi") == pytest.approx(np.pi)

    def test_kwarg_assign(self):
        chain = ProcessingChain(buffer_len=8)
        d = chain.get_variable("mode_out = 3")
        assert d == {"mode_out": 3}
        with pytest.raises(ProcessingChainError):
            chain.get_variable("mode_out = 3", expr_only=True)

    def test_var_arithmetic_processor(self):
        tb, wf = make_wf_table()
        config = {
            "outputs": ["wf_scaled"],
            "processors": {
                "wf_scaled": "wf * 2 + 1",
            },
        }
        out = run_chain(config, tb)
        np.testing.assert_allclose(
            out["wf_scaled"].values.nda, wf * 2 + 1, rtol=1e-6
        )

    def test_comparison_and_ternary(self):
        tb, wf = make_wf_table()
        config = {
            "outputs": ["flag"],
            "processors": {
                "mean": {
                    "function": "mean_below_threshold",
                    "module": "dspeed_tpu.processors",
                    "args": ["wf", "np.inf", "mean"],
                },
                "flag": "mean if mean > 0 else -mean",
            },
        }
        out = run_chain(config, tb)
        expect = np.abs(wf.mean(axis=1))
        np.testing.assert_allclose(out["flag"].nda, expect, rtol=1e-5)


class TestUnitConversion:
    def test_output_units_equivalence(self):
        # computing tp in ns vs us must agree (reference :289-318)
        outs = {}
        for unit in ("ns", "us"):
            tb, wf = make_wf_table(n=4, nsamp=256, dt=16, t0=100.0, seed=3)
            config = {
                "outputs": ["tp_max"],
                "processors": {
                    "tp_min, tp_max, wf_min, wf_max": {
                        "function": "min_max",
                        "module": "dspeed_tpu.processors",
                        "args": ["wf", "tp_min", "tp_max", "wf_min", "wf_max"],
                        "unit": ["ns", unit, "ADC", "ADC"],
                    },
                },
            }
            out = run_chain(config, tb)
            outs[unit] = out["tp_max"].nda
        np.testing.assert_allclose(outs["ns"], outs["us"] * 1000, rtol=1e-6)

    def test_t0_offset_in_output(self):
        # per-event t0 must shift coordinate outputs (reference waveform IO)
        t0s = np.array([0.0, 160.0, 320.0, 480.0])
        rng = np.random.default_rng(5)
        wf = rng.normal(0, 1, (4, 64)).astype("float32")
        wf[:, 20] = 100.0  # spike: argmax at sample 20
        tb = lh5.Table(
            {
                "wf": lh5.WaveformTable(
                    values=wf, t0=t0s, t0_units="ns", dt=16, dt_units="ns"
                )
            }
        )
        config = {
            "outputs": ["tp_max"],
            "processors": {
                "tp_min, tp_max, wf_min, wf_max": {
                    "function": "min_max",
                    "module": "dspeed_tpu.processors",
                    "args": ["wf", "tp_min", "tp_max", "wf_min", "wf_max"],
                    "unit": ["ns", "ns", "ADC", "ADC"],
                },
            },
        }
        out = run_chain(config, tb)
        np.testing.assert_allclose(out["tp_max"].nda, 20 * 16.0 + t0s, rtol=1e-6)


class TestBuiltins:
    def test_astype(self):
        tb, wf = make_wf_table()
        config = {
            "outputs": ["wf_int"],
            "processors": {
                "wf_int": "astype(wf*100, 'int32')",
            },
        }
        out = run_chain(config, tb)
        assert out["wf_int"].values.nda.dtype == np.dtype("int32")
        np.testing.assert_array_equal(
            out["wf_int"].values.nda, (wf * 100).astype("int32")
        )

    def test_isnan_isfinite(self):
        wf = np.ones((4, 16), "float32")
        wf[1, 3] = np.nan
        tb = lh5.Table({"wf": lh5.WaveformTable(values=wf, dt=16, dt_units="ns")})
        config = {
            "outputs": ["first_nan"],
            "processors": {
                "first_nan": "isnan(wf[3])",
            },
        }
        out = run_chain(config, tb)
        np.testing.assert_array_equal(
            out["first_nan"].nda, [False, True, False, False]
        )

    def test_round_scalar(self):
        chain = ProcessingChain(buffer_len=8)
        assert chain.get_variable("round(7.7)") == 8
        assert chain.get_variable("floor(7.7)") == 7
        q = chain.get_variable("round(1234*ns, us)")
        assert q.u == "us" and q.m == pytest.approx(1)

    def test_len(self):
        tb, wf = make_wf_table(nsamp=100)
        chain, _, _ = build_processing_chain(
            {
                "outputs": ["n"],
                "processors": {"n": "len(wf)*1"},
            },
            tb,
        )
        # len is resolved at build time into a constant
        assert chain._vars_dict["n"].const_value == 100


class TestIORoundTrip:
    def test_copy_passthrough(self):
        tb, wf = make_wf_table()
        tb.add_field("energy", lh5.Array(np.arange(8.0), attrs={"units": "keV"}))
        config = {"outputs": ["energy"], "processors": {}}
        out = run_chain(config, tb)
        np.testing.assert_array_equal(out["energy"].nda, np.arange(8.0))
        assert out["energy"].attrs["units"] == "keV"

    def test_db_defaults_and_overrides(self):
        tb, wf = make_wf_table()
        config = {
            "outputs": ["wf_shift"],
            "processors": {
                "wf_shift": {
                    "function": "wf + db.shift",
                    "defaults": {"db.shift": 2.0},
                },
            },
        }
        out = run_chain(config, tb)
        np.testing.assert_allclose(out["wf_shift"].values.nda, wf + 2, rtol=1e-6)
        out = run_chain(config, tb, db_dict={"shift": 5.0})
        np.testing.assert_allclose(out["wf_shift"].values.nda, wf + 5, rtol=1e-6)

    def test_lh5_attrs_description(self):
        tb, wf = make_wf_table()
        config = {
            "outputs": ["mval"],
            "processors": {
                "mval": {
                    "function": "mean_below_threshold",
                    "module": "dspeed_tpu.processors",
                    "args": ["wf", "np.inf", "mval"],
                    "description": "mean of everything",
                    "lh5_attrs": {"custom": "yes"},
                },
            },
        }
        chain, _, tb_out = build_processing_chain(config, tb)
        assert tb_out["mval"].attrs["description"] == "mean of everything"
        assert tb_out["mval"].attrs["custom"] == "yes"

    def test_cycle_detection(self):
        tb, wf = make_wf_table()
        config = {
            "outputs": ["a"],
            "processors": {
                "a": "b + 1",
                "b": "a + 1",
            },
        }
        with pytest.raises(ProcessingChainError):
            build_processing_chain(config, tb)


class TestMultiChunk:
    def test_chunked_execution_matches(self):
        # one big chunk vs two half chunks gives identical results
        tb, wf = make_wf_table(n=16, nsamp=64, seed=9)
        config = {
            "outputs": ["wf_scaled"],
            "processors": {
                "wf_scaled": "wf * 3",
            },
        }
        full = run_chain(config, tb)["wf_scaled"].values.nda

        chain, _, tb_out = build_processing_chain(config, tb[0:8])
        out1 = chain(tb[0:8], None)
        out2 = chain(tb[8:16], None)
        np.testing.assert_array_equal(
            np.concatenate([out1["wf_scaled"].values.nda, out2["wf_scaled"].values.nda]),
            full,
        )
