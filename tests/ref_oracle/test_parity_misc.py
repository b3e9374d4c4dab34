"""Reference-code parity: upsamplers, pad/where, rounding and unit
conversion, waveform corrections, pulse injectors, polynomial fits.

Reference bodies: ``/root/reference/src/dspeed/processors/{upsampler,pad,
where,round_to_nearest,unit_conversion,inl_correction,wf_correction,
wf_alignment,get_wf_centroid,pulse_injector,pmt_pulse_injector,poly_fit}.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from .conftest import assert_ref_parity as parity
from .stubs import ref_module


class TestUpsamplers:
    @pytest.mark.parametrize("up", [4.0, 3.0, 2.5])
    def test_upsampler(self, wf_batch, up):
        n = wf_batch.shape[-1]
        parity("upsampler", wf_batch, up, dims={"m": int(n * up)}, out_args=1)

    @pytest.mark.parametrize("mode", ["i", "n", "f", "c", "l", "h", "s"])
    def test_interpolating_upsampler_x4(self, wf_batch, mode):
        n = wf_batch.shape[-1]
        # mode 's': the reference body starts its back-substitution write loop
        # at i_last = len(w_out) (upsampler.py:201-207) — one write past the
        # end that numba's unchecked indexing swallows; loose_outs mirrors that
        parity(
            "interpolating_upsampler", wf_batch, ord(mode),
            dims={"m": 4 * n}, out_args=1, atol=1e-10,
            loose_outs=(0,) if mode == "s" else (),
        )

    @pytest.mark.parametrize("mode", ["n", "f", "c", "l", "h", "s"])
    def test_interpolating_upsampler_frac(self, wf_batch, mode):
        n = wf_batch.shape[-1]
        parity(
            "interpolating_upsampler", wf_batch, ord(mode),
            dims={"m": int(2.5 * n)}, out_args=1, atol=1e-10,
            loose_outs=(0,) if mode == "s" else (),
        )


class TestPadWhere:
    def test_pad(self, wf_batch):
        n = wf_batch.shape[-1]
        parity(
            "pad", wf_batch, 200, 20.0, -7.0, 3.0,
            dims={"m": n}, out_args=1, int_args=(1,),
        )

    def test_pad_nan_tail_ignored(self, rng):
        w = rng.normal(0, 1, (3, 64))
        w[:, 50:] = np.nan  # beyond len_in: must not poison
        parity("pad", w, 50, 4.0, 0.0, 1.0, dims={"m": 80}, out_args=1,
               int_args=(1,))

    def test_where_float(self, rng):
        cond = rng.integers(0, 2, size=12).astype(bool)
        a = rng.normal(size=12)
        b = rng.normal(size=12)
        a[3] = np.nan
        parity("where", cond, a, b)

    def test_where_int(self, rng):
        cond = rng.integers(0, 2, size=12).astype(bool)
        a = rng.integers(-50, 50, size=12, dtype=np.int32)
        b = rng.integers(-50, 50, size=12, dtype=np.int32)
        parity("where", cond, a, b, out_dtypes=np.int32)


class TestRoundConvert:
    NAMES = ["round_to_nearest", "floor_to_nearest", "ceil_to_nearest",
             "trunc_to_nearest"]

    @pytest.mark.parametrize("name", NAMES)
    def test_to_nearest_float(self, rng, name):
        val = rng.uniform(-10, 10, size=64)
        val[5] = np.nan
        parity(name, val, 0.5)

    @pytest.mark.parametrize("name", NAMES)
    def test_to_nearest_int(self, rng, name):
        val = rng.integers(-100, 100, size=64, dtype=np.int64)
        parity(name, val, np.int64(4))

    def test_convert(self, rng):
        mod = ref_module("unit_conversion")
        buf = rng.uniform(-100, 100, size=32)
        parity("convert", buf, 2.0, -3.0, 0.5, ref_fn=mod.convert,
               my_kernel=_dp("convert"))

    @pytest.mark.parametrize("name", ["convert_round", "convert_floor",
                                      "convert_ceil", "convert_trunc"])
    def test_convert_rounding_family(self, rng, name):
        mod = ref_module("unit_conversion")
        buf = rng.integers(-100, 100, size=32, dtype=np.int32)
        parity(name, buf, 2.0, -3.0, 0.5, ref_fn=getattr(mod, name),
               my_kernel=_dp(name), out_dtypes=np.int32)

    def test_convert_int_exact(self, rng):
        # convert_int DSPFatals on non-integral results: feed exact ones
        mod = ref_module("unit_conversion")
        buf = (2 * rng.integers(-50, 50, size=32)).astype(np.int32)
        parity("convert_int", buf, 2.0, -3.0, 0.5, ref_fn=mod.convert_int,
               my_kernel=_dp("convert_int"), out_dtypes=np.int32)


def _dp(name):
    from dspeed_tpu import processors as dp

    return getattr(dp, name)


class TestCorrections:
    def test_inl_correction(self, rng):
        w = rng.integers(0, 1024, size=(4, 128), dtype=np.int32)
        inl = rng.uniform(-0.5, 0.5, size=1024)
        parity("inl_correction", w, inl)

    def test_inl_correction_nan_table(self, rng):
        w = rng.integers(0, 1024, size=(2, 64), dtype=np.int32)
        inl = rng.uniform(-0.5, 0.5, size=1024)
        inl[10] = np.nan
        parity("inl_correction", w, inl)

    def test_wf_correction(self, wf_batch, rng):
        corr = rng.normal(0, 1, size=64)
        parity("wf_correction", wf_batch, corr, np.int32(32), np.int32(96))

    def test_wf_alignment_branches(self, rng):
        w = rng.normal(0, 1, (3, 128))
        # centroid mid-window, small-centroid, and fallback branches; size as
        # int (the fallback branch slices w_in[:size] — float under pure
        # Python raises where numba weak-casts)
        parity("wf_alignment", w, 60.0, 5.0, 40.0, dims={"m": 40},
               out_args=1, int_args=(3,))
        parity("wf_alignment", w, 18.0, 5.0, 40.0, dims={"m": 40},
               out_args=1, int_args=(3,))
        parity("wf_alignment", w, 120.0, 5.0, 40.0, dims={"m": 40},
               out_args=1, int_args=(3,))

    def test_get_wf_centroid(self, rng):
        n = 256
        t = np.arange(n, dtype=np.float64)
        w = np.where(t < 100, -1.0, np.where(t < 156, (t - 128) / 28.0, 1.0))
        w = w[None, :] + rng.normal(0, 0.01, size=(4, n))
        w[1] = np.nan
        parity("get_wf_centroid", w, 5.0)


class TestInjectors:
    def test_inject_sig_pulse(self, wf_batch):
        parity(
            "inject_sig_pulse", wf_batch, 60.0, 20.0, 500.0, 3000.0,
            rtol=1e-9, atol=1e-9,
        )

    def test_inject_exp_pulse(self, wf_batch):
        parity(
            "inject_exp_pulse", wf_batch, 60.0, 20.0, 500.0, 3000.0,
            rtol=1e-9, atol=1e-9,
        )

    def test_inject_gumbel(self, wf_batch):
        # int-valued params: the reference body uses them as range() bounds
        parity(
            "inject_gumbel", wf_batch, 3.0, 40.0, 6.0,
            int_args=(1, 2, 3), rtol=1e-9, atol=1e-12,
        )

    def test_inject_general_logistic(self, wf_batch):
        parity(
            "inject_general_logistic", wf_batch, 500.0, 60.0, 20.0, 2.0,
            3.0, 3000.0, rtol=1e-9, atol=1e-9,
        )


class TestPoly:
    def test_poly_fit_factory(self, wf_batch):
        deg = 3
        n = wf_batch.shape[-1]
        refp = ref_module("poly_fit").poly_fit(n, deg)
        mine = _dp("poly_fit")(n, deg)
        # f32: the normal-equations solve for deg 3 over 256 samples is
        # mildly ill-conditioned (~1e-5 relative coefficient error)
        parity(
            "poly_fit", wf_batch, ref_fn=refp, my_kernel=mine,
            dims={"m": deg + 1}, out_args=1, rtol=1e-7, atol=1e-9,
            f32_rtol=1e-4, f32_rel_floor=1e-5,
        )

    def test_poly_diff(self, wf_batch):
        n = wf_batch.shape[-1]
        (pars,) = _dp("poly_fit")(n, 3)(wf_batch)
        pars = np.asarray(pars)
        parity("poly_diff", wf_batch, pars, rtol=1e-8, atol=1e-10)

    def test_poly_exp_rms(self, rng):
        w = np.exp(rng.uniform(0, 2, size=(4, 128)))
        (pars,) = _dp("poly_fit")(128, 2)(np.log(w))
        pars = np.asarray(pars)
        parity("poly_exp_rms", w, pars, rtol=1e-8, atol=1e-10)
