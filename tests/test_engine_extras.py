"""Engine features beyond the basics: VoV variable indices, friend inputs,
entry selection, loadlh5, and kernel generators / dplms / convolution modes
(reference ``tests/test_processing_chain.py:75-98``, ``build_dsp.py:271-330``,
``processors/kernels.py``, ``energy_kernels.py:170``)."""

import numpy as np
import pytest

from dspeed_tpu import build_dsp, lh5
from dspeed_tpu import processors as dp


class TestVovVariableIndices:
    def test_vov_index_by_length(self):
        # reference test_processing_chain.py:75-98
        tbl_in = lh5.Table(
            {
                "vov_in": lh5.VectorOfVectors(
                    flattened_data=np.arange(150.0),
                    cumulative_length=np.array([10, 30, 60, 100, 150]),
                    attrs={"units": "ns"},
                )
            }
        )
        config = {
            "outputs": ["vals", "v_end"],
            "processors": {
                "vals": "vov_in(shape=50)[len(vov_in)//2]",
                "v_end": "vov_in(shape=50)[-1]",
            },
        }
        out = build_dsp(tbl_in, dsp_config=config)
        np.testing.assert_array_equal(
            out["vals"].nda, [5.0, 20.0, 45.0, 80.0, 125.0]
        )
        assert out["vals"].attrs["units"] == "ns"
        np.testing.assert_array_equal(
            out["v_end"].nda, [9.0, 29.0, 59.0, 99.0, 149.0]
        )
        assert out["v_end"].attrs["units"] == "ns"


class TestFriendInputs:
    def test_aux_table_joined(self, tmp_path, rng):
        raw = str(tmp_path / "main_raw.lh5")
        aux = str(tmp_path / "aux.lh5")
        wf = rng.normal(0, 1, (8, 64)).astype("float32")
        lh5.write(
            lh5.Table(
                {"waveform": lh5.WaveformTable(values=wf, dt=16, dt_units="ns")}
            ),
            "det/raw",
            raw,
        )
        lh5.write(
            lh5.Table({"scale": lh5.Array(np.arange(8.0) + 1)}),
            "det/aux",
            aux,
        )
        config = {
            "inputs": [{"file": aux, "group": "det/aux", "prefix": "fr_"}],
            "outputs": ["scaled"],
            "processors": {"scaled": "waveform * fr_scale"},
        }
        out = build_dsp(raw, None, config)["det"]["dsp"]
        np.testing.assert_allclose(
            out["scaled"].values.nda,
            wf * (np.arange(8.0) + 1)[:, None],
            rtol=1e-6,
        )


class TestEntrySelection:
    @pytest.fixture
    def raw(self, tmp_path, rng):
        path = str(tmp_path / "sel_raw.lh5")
        wf = rng.normal(0, 1, (20, 32)).astype("float32")
        wf[:, 5] = np.arange(20)  # identifying marker per event
        lh5.write(
            lh5.Table(
                {"waveform": lh5.WaveformTable(values=wf, dt=16, dt_units="ns")}
            ),
            "det/raw",
            path,
        )
        return path

    CFG = {"outputs": ["mark"], "processors": {"mark": "waveform[5]"}}

    def test_entry_list(self, raw):
        out = build_dsp(raw, None, self.CFG, entry_list=[3, 7, 11])
        np.testing.assert_array_equal(
            out["det"]["dsp"]["mark"].nda, [3.0, 7.0, 11.0]
        )

    def test_entry_mask(self, raw):
        mask = np.zeros(20, bool)
        mask[[2, 5]] = True
        out = build_dsp(raw, None, self.CFG, entry_mask=mask)
        np.testing.assert_array_equal(out["det"]["dsp"]["mark"].nda, [2.0, 5.0])

    def test_i_start(self, raw):
        out = build_dsp(raw, None, self.CFG, i_start=15)
        np.testing.assert_array_equal(
            out["det"]["dsp"]["mark"].nda, np.arange(15, 20, dtype="f4")
        )


class TestLoadLh5:
    def test_loadlh5_const(self, tmp_path, rng):
        cal = str(tmp_path / "cal.lh5")
        corr = rng.normal(0, 0.1, 32)
        lh5.write(lh5.Array(corr), "cal/corr", cal)
        wf = rng.normal(0, 1, (4, 32)).astype("float64")
        tbl = lh5.Table(
            {"waveform": lh5.WaveformTable(values=wf, dt=16, dt_units="ns")}
        )
        config = {
            "outputs": ["wf_corr"],
            "processors": {
                "wf_corr": f"waveform - loadlh5('{cal}', 'cal/corr')",
            },
        }
        out = build_dsp(tbl, dsp_config=config)
        np.testing.assert_allclose(
            out["wf_corr"].values.nda, wf - corr, rtol=1e-6
        )


class TestKernelGenerators:
    def test_t0_filter(self):
        rise, fall = 8, 16
        (k,) = dp.t0_filter(float(rise), float(fall), dims={"n": rise + fall})
        k = np.asarray(k)
        i = np.arange(rise)
        np.testing.assert_allclose(k[:rise], 2 * (rise - i) / (rise * (rise + 1)))
        np.testing.assert_allclose(k[rise:], -1.0 / fall)

    def test_moving_slope(self):
        n = 12
        (k,) = dp.moving_slope(dims={"n": n})
        # convolving a ramp with the slope kernel recovers the slope
        x = 0.5 * np.arange(100)
        est = np.convolve(x, np.asarray(k), mode="valid")
        np.testing.assert_allclose(est, 0.5, rtol=1e-9)

    def test_step(self):
        (k,) = dp.step(1.0, dims={"n": 16})
        k = np.asarray(k)
        np.testing.assert_array_equal(k[:4], -1)
        np.testing.assert_array_equal(k[4:12], 1)
        np.testing.assert_array_equal(k[12:], -1)


class TestDplms:
    def test_matches_formula(self, rng):
        length, ssize = 16, 64
        noise = rng.normal(0, 1, (length, 40))
        noise_mat = noise @ noise.T / 40
        t = np.arange(ssize)
        reference = 1 / (1 + np.exp(-(t - 32) / 2.0))
        (k,) = dp.dplms(noise_mat, reference, 50.0, 0.1, 1.0, 1.0,
                        dims={"n": length, "m": ssize})
        k = np.asarray(k)
        # replicate the reference formula
        flo, fhi = ssize // 2 - length // 2, ssize // 2 + length // 2
        ref_mat = np.zeros((length, length))
        ref_sig = np.zeros(length)
        for s in (-1, 0, 1):
            seg = reference[flo + s : fhi + s]
            ref_mat += np.outer(seg, seg)
            ref_sig += seg
        ref_mat /= 3
        mat = 50.0 * noise_mat + 0.1 * ref_mat + np.ones((length, length))
        exp = np.flip(np.linalg.solve(mat, ref_sig))
        exp /= np.amax(np.convolve(reference, exp, mode="valid"))
        np.testing.assert_allclose(k, exp, rtol=1e-5)
        # peak-normalized: max response to the reference pulse is 1
        y = np.convolve(reference, k, mode="valid")
        assert np.amax(y) == pytest.approx(1.0, rel=1e-6)

    def test_dplms_filter_alias(self, rng):
        """``dplms_filter`` is registered as an alias of ``dplms`` (the
        reference exports the name in processors/__init__.py without its own
        definition); both registry names must resolve to the same kernel and
        produce identical output."""
        length, ssize = 8, 32
        noise = rng.normal(0, 1, (length, 20))
        noise_mat = noise @ noise.T / 20
        t = np.arange(ssize)
        reference = 1 / (1 + np.exp(-(t - 16) / 2.0))
        dims = {"n": length, "m": ssize}
        assert dp.dplms_filter is dp.dplms
        (k1,) = dp.dplms(noise_mat, reference, 50.0, 0.1, 1.0, 1.0, dims=dims)
        (k2,) = dp.dplms_filter(
            noise_mat, reference, 50.0, 0.1, 1.0, 1.0, dims=dims
        )
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


class TestConvolveModes:
    @pytest.mark.parametrize("mode,npmode", [("f", "full"), ("v", "valid"), ("s", "same")])
    def test_direct(self, rng, mode, npmode):
        w = rng.normal(0, 1, (3, 100)).astype("float64")
        taps = rng.normal(0, 1, 15)
        exp = np.stack([np.convolve(x, taps, npmode) for x in w])
        (got,) = dp.convolve_wf(w, taps, ord(mode), dims={"p": exp.shape[1]})
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-9, atol=1e-9)

    @pytest.mark.parametrize("mode,npmode", [("f", "full"), ("v", "valid"), ("s", "same")])
    def test_fft(self, rng, mode, npmode):
        w = rng.normal(0, 1, (3, 100)).astype("float64")
        taps = rng.normal(0, 1, 15)
        exp = np.stack([np.convolve(x, taps, npmode) for x in w])
        (got,) = dp.fft_convolve_wf(w, taps, ord(mode), dims={"p": exp.shape[1]})
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-8, atol=1e-8)


class TestGet:
    def test_get_and_default(self, rng):
        w = rng.normal(0, 1, (4, 16)).astype("float64")
        (got,) = dp.get(w, 3)
        np.testing.assert_allclose(np.asarray(got), w[:, 3])
        (gneg,) = dp.get(w, -2)
        np.testing.assert_allclose(np.asarray(gneg), w[:, -2])
        (gd,) = dp.get_default(w, 99, -1.0)
        np.testing.assert_array_equal(np.asarray(gd), -1.0)


class TestMultiTimePointThresh:
    def test_ramp_thresholds(self):
        w = np.linspace(0.0, 100.0, 101)[None]
        thr = np.array([[10.5, 30.5, 70.5]])
        (got,) = dp.multi_time_point_thresh(w, thr, 50.0, 1, ord("b"))
        # up-side thresholds (>= w[50]=50): 70.5 -> crossing at i=70
        # down-side (< 50): searched backward from 49
        np.testing.assert_allclose(np.asarray(got)[0], [10.0, 30.0, 70.0])

    def test_linear_mode(self):
        w = np.linspace(0.0, 100.0, 101)[None]
        thr = np.array([[25.25, 75.75]])
        (got,) = dp.multi_time_point_thresh(w, thr, 50.0, 1, ord("l"))
        np.testing.assert_allclose(np.asarray(got)[0], [25.25, 75.75], rtol=1e-9)


class TestMultiFileIterator:
    def test_spans_files(self, tmp_path, rng):
        from dspeed_tpu.lh5 import LH5Iterator

        paths = []
        for fi in range(3):
            p = str(tmp_path / f"part{fi}_raw.lh5")
            wf = np.full((10, 16), float(fi), "float32")
            wf[:, 0] = np.arange(10) + fi * 10  # global marker
            lh5.write(
                lh5.Table(
                    {"waveform": lh5.WaveformTable(values=wf, dt=16, dt_units="ns")}
                ),
                "det/raw",
                p,
            )
            paths.append(p)

        it = LH5Iterator(paths, "det/raw", buffer_len=7)
        assert len(it) == 30
        got = []
        for tb in it:
            got.append(tb["waveform"].values.nda[:, 0])
        np.testing.assert_array_equal(np.concatenate(got), np.arange(30))
        # chunk crossing a file boundary
        tb = it.read(8, 6)
        np.testing.assert_array_equal(
            tb["waveform"].values.nda[:, 0], np.arange(8, 14)
        )
        # entry_list across files
        it2 = LH5Iterator(paths, "det/raw", entry_list=[5, 12, 25])
        tb2 = it2.read(0)
        np.testing.assert_array_equal(
            tb2["waveform"].values.nda[:, 0], [5.0, 12.0, 25.0]
        )
        it.close()
        it2.close()


class TestReferenceConfigCompat:
    def test_dspeed_module_names_alias(self, rng):
        # unmodified reference configs name modules "dspeed.processors[...]"
        wf = rng.normal(0, 1, (4, 64)).astype("float32")
        tbl = lh5.Table(
            {"waveform": lh5.WaveformTable(values=wf, dt=16, dt_units="ns")}
        )
        config = {
            "outputs": ["wmax"],
            "processors": {
                "tmin, wmax_t, wmin, wmax": {
                    "function": "min_max",
                    "module": "dspeed.processors",
                    "args": ["waveform", "tmin", "wmax_t", "wmin", "wmax"],
                    "unit": ["ns", "ns", "ADC", "ADC"],
                },
            },
        }
        out = build_dsp(tbl, dsp_config=config)
        np.testing.assert_allclose(out["wmax"].nda, wf.max(1), rtol=1e-6)

    def test_dspeed_submodule_alias(self, rng):
        wf = rng.normal(0, 1, (4, 64)).astype("float32")
        tbl = lh5.Table(
            {"waveform": lh5.WaveformTable(values=wf, dt=16, dt_units="ns")}
        )
        config = {
            "outputs": ["wf_g"],
            "processors": {
                "gk": {
                    "function": "gaussian_filter1d",
                    "module": "dspeed.processors.gaussian_filter1d",
                    "args": [2.0, 4.0, "gk(17, 'd')"],
                },
                "wf_g": {
                    "function": "reflected_convolve_wf",
                    "module": "dspeed.processors.convolutions",
                    "args": ["waveform", "gk", "wf_g(len(waveform))"],
                    "unit": "ADC",
                },
            },
        }
        out = build_dsp(tbl, dsp_config=config)
        wf_g = out["wf_g"]
        nda = wf_g.values.nda if hasattr(wf_g, "values") else wf_g.nda
        assert nda.shape == (4, 64)


class TestWaveformVovValues:
    def test_wf_table_with_vov_values(self, rng):
        vov = lh5.VectorOfVectors(
            data=[rng.normal(0, 1, 10 + 3 * i) for i in range(4)],
            dtype="float64",
        )
        wf = lh5.WaveformTable(
            values=vov, t0=np.arange(4.0), t0_units="ns", dt=16.0, dt_units="ns"
        )
        tbl = lh5.Table({"wf_vov": wf})
        config = {
            "outputs": ["wv2"],
            "processors": {
                "wv2": "wf_vov(shape=32, vector_len=len(wf_vov))*1",
            },
        }
        out = build_dsp(tbl, dsp_config=config)
        wv2 = out["wv2"]
        # variable-length waveform rows round-trip through the padded path
        vals = wv2.values if hasattr(wv2, "values") else wv2
        for i in range(4):
            np.testing.assert_allclose(vals[i], vov[i], rtol=1e-12)


def test_staged_inputs_match_unstaged(tmp_path):
    """stage_inputs + __call__(staged=...) must equal the plain path."""
    import numpy as np

    from dspeed_tpu import lh5
    from dspeed_tpu.processing_chain import build_processing_chain
    from tests.test_build_dsp import DB_FLAT, make_hpge_waveforms

    wf, amp, t0, bl = make_hpge_waveforms(n=48)
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "baseline": lh5.Array(bl.astype("float32")),
        }
    )
    config = {
        "outputs": ["trapEmax", "bl_mean"],
        "processors": {
            "wf_blsub": {
                "function": "bl_subtract",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "baseline", "wf_blsub"],
            },
            "wf_pz": {
                "function": "pole_zero",
                "module": "dspeed_tpu.processors",
                "args": ["wf_blsub", "db.pz.tau", "wf_pz"],
            },
            "wf_trap": {
                "function": "trap_norm",
                "module": "dspeed_tpu.processors",
                "args": ["wf_pz", "625", "188", "wf_trap"],
            },
            "trapEmax": {
                "function": "amax",
                "module": "numpy",
                "args": ["wf_trap", 1, "trapEmax"],
                "kwargs": {"signature": "(n),()->()", "types": ["fi->f"]},
            },
            "bl_mean": {
                "function": "mean",
                "module": "numpy",
                "args": ["waveform[0:512]", 1, "bl_mean"],
                "kwargs": {"signature": "(n),()->()", "types": ["fi->f"]},
            },
        },
    }
    chain, _, tb_out1 = build_processing_chain(config, tb, db_dict=DB_FLAT)
    chain(tb, tb_out1)

    chain2, _, tb_out2 = build_processing_chain(config, tb, db_dict=DB_FLAT)
    staged = chain2.stage_inputs(tb)
    assert staged is not None
    chain2(tb, tb_out2, staged=staged)

    for col in ("trapEmax", "bl_mean"):
        np.testing.assert_array_equal(tb_out1[col].nda, tb_out2[col].nda)
