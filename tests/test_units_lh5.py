"""Direct tests for the unit registry and LH5 store foundations
(reference counterparts: pint usage in ``processing_chain.py`` and the
external legend-pydataobj/lh5 packages)."""

import numpy as np
import pytest

from dspeed_tpu import lh5
from dspeed_tpu.units import DimensionalityError, Quantity, Unit, ureg


class TestUnits:
    def test_exact_conversions(self):
        assert float(ureg("1000 ns").to("us").m) == 1.0
        assert float(ureg("2 us") / ureg("16 ns")) == 125.0
        assert Quantity(1, "MHz").to("Hz").m == pytest.approx(1e6)

    def test_compat_checks(self):
        assert ureg.is_compatible_with("ns", "us")
        assert ureg.is_compatible_with("GHz", "Hz")
        assert not ureg.is_compatible_with("ns", "m")
        assert "ADC" not in ureg  # opaque label
        assert "ns" in ureg

    def test_quantity_arithmetic(self):
        q = ureg("16 ns")
        assert (q * 2).m == 32
        assert (2 * q).m == 32
        assert float((ureg("1 us") + ureg("500 ns")).to("ns").m) == 1500
        with pytest.raises(DimensionalityError):
            ureg("1 ns") + ureg("1 m")
        assert ureg("2 us") == ureg("2000 ns")
        assert ureg("2 us") > ureg("1999 ns")

    def test_pi_exponent(self):
        period = ureg("16 ns")
        # time -> k = -1... param * period**k dimensionless
        k = ureg.pi_exponent(period, ureg("10 us"))
        assert float(ureg("10 us") * period**k) == pytest.approx(625)
        # frequency (1/time): 6.25 GHz against 16 ns -> 100 samples^-1...
        k2 = ureg.pi_exponent(period, ureg("6.25 GHz"))
        assert float(ureg("6.25 GHz") * period**k2) == pytest.approx(100)
        assert ureg.pi_exponent(period, ureg("1 m")) is None

    def test_compound_units(self):
        q = ureg("3 m/s**2")
        assert q.u.dims[1] == 1  # length
        assert q.u.dims[0] == -2  # per time^2
        with pytest.raises((KeyError, ValueError)):
            ureg("florps")


class TestLH5Store:
    def test_table_round_trip(self, tmp_path, rng):
        path = str(tmp_path / "t.lh5")
        tb = lh5.Table(
            {
                "a": lh5.Array(rng.normal(0, 1, 10), attrs={"units": "keV"}),
                "b": lh5.ArrayOfEqualSizedArrays(rng.normal(0, 1, (10, 4))),
                "v": lh5.VectorOfVectors(
                    data=[np.arange(i, dtype="float64") for i in range(10)]
                ),
            }
        )
        lh5.write(tb, "grp/tbl", path)
        back = lh5.read("grp/tbl", path)
        assert back["a"] == tb["a"]
        assert back["a"].attrs["units"] == "keV"
        assert back["b"] == tb["b"]
        assert back["v"] == tb["v"]
        assert lh5.read_n_rows("grp/tbl", path) == 10

    def test_partial_reads(self, tmp_path, rng):
        path = str(tmp_path / "p.lh5")
        tb = lh5.Table({"x": lh5.Array(np.arange(100.0))})
        lh5.write(tb, "d/raw", path)
        part = lh5.read("d/raw", path, start_row=10, n_rows=5)
        np.testing.assert_array_equal(part["x"].nda, np.arange(10.0, 15.0))
        sel = lh5.read("d/raw", path, idx=np.array([1, 7, 42]))
        np.testing.assert_array_equal(sel["x"].nda, [1.0, 7.0, 42.0])
        masked = lh5.read("d/raw", path, field_mask=["x"])
        assert list(masked.keys()) == ["x"]

    def test_write_modes(self, tmp_path):
        path = str(tmp_path / "w.lh5")
        a = lh5.Array(np.arange(5.0))
        lh5.write(a, "d/x", path)
        # append grows
        lh5.write(lh5.Array(np.arange(5.0, 8.0)), "d/x", path, wo_mode="a")
        assert lh5.read_n_rows("d/x", path) == 8
        # overwrite in place at write_start
        lh5.write(
            lh5.Array(np.full(3, -1.0)), "d/x", path, wo_mode="o", write_start=2
        )
        got = lh5.read("d/x", path)
        np.testing.assert_array_equal(
            got.nda, [0, 1, -1, -1, -1, 5, 6, 7]
        )
        # write_safe refuses to clobber
        from dspeed_tpu.errors import LH5Error

        with pytest.raises(LH5Error):
            lh5.write(a, "d/x", path, wo_mode="w")

    def test_ls_patterns(self, tmp_path):
        path = str(tmp_path / "ls.lh5")
        for ch in ("ch0", "ch1", "other"):
            lh5.write(lh5.Array(np.arange(3.0)), f"{ch}/raw/x", path)
        assert sorted(lh5.ls(path)) == ["ch0", "ch1", "other"]
        assert sorted(lh5.ls(path, "ch*")) == ["ch0", "ch1"]
        assert lh5.ls(path, "ch0/") == ["ch0/raw"]
        assert lh5.ls(path, "ch*/raw") == ["ch0/raw", "ch1/raw"]
        assert lh5.ls(path, "nope") == []

    def test_scalar_and_wftable(self, tmp_path, rng):
        path = str(tmp_path / "s.lh5")
        wf = lh5.WaveformTable(
            values=rng.normal(0, 1, (4, 8)),
            t0=np.arange(4.0),
            t0_units="ns",
            dt=16.0,
            dt_units="ns",
        )
        lh5.write(wf, "d/wf", path)
        back = lh5.read("d/wf", path)
        assert isinstance(back, lh5.WaveformTable)
        np.testing.assert_array_equal(back.values.nda, wf.values.nda)
        assert back.dt_units == "ns"
        np.testing.assert_array_equal(back.t0.nda, np.arange(4.0))
