"""Tile-safety contract: every kernel flagged ``tile_safe = True`` runs
bit-identically inside a generic row-tile program (Pallas interpret mode on
CPU) vs its plain batched call.

This is the guard for the r5 audit that flagged the elementwise / reduce /
small-matmul kernels (injectors, ML layers, pileup correction, centroid,
poly residuals, ...): on real TPU the two-tile probe compile still vets
Mosaic lowering per group, but the *semantics inside a tile* (closure
handling, per-row slicing, trace-memo NaN sharing) are validated here for
every flagged kernel.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

import dspeed_tpu.processors as dp
from dspeed_tpu.processors import _pallas

B, N = 8, 256
_rng = np.random.default_rng(11)
_w = _rng.normal(0.0, 10.0, (B, N)).astype("float32")
_w[1, 40] = np.nan  # one poisoned row must poison identically both routes
_wpos = (np.abs(_w) + 1.0).astype("float32")
_wpn = _w.copy()
_wpn[:, :50] -= 40.0  # negative head, positive tail (centroid pattern)
_coef = np.array([1.0, 0.05, 1e-4], "float32")
_mlk = _rng.normal(0, 0.3, (N, 8)).astype("float32")
_mlv = _rng.normal(0, 0.3, (N,)).astype("float32")
_corr = _rng.normal(0, 1.0, (64,)).astype("float32")

# kernel name -> (waveform plane, extra args closed over as constants)
CASES = {
    "log_check": (_wpos, ()),
    "soft_pileup_corr": (_w, (100, 50.0)),
    "soft_pileup_corr_bl": (_w, (100, 50.0, 0.5)),
    "inject_sig_pulse": (_w, (20.0, 5.0, 100.0, 30.0)),
    "inject_exp_pulse": (_w, (20.0, 5.0, 100.0, 30.0)),
    "inject_gumbel": (_w, (100.0, 20.0, 5.0)),
    "inject_general_logistic": (_w, (100.0, 20.0, 5.0, 1.0, 2.0, 30.0)),
    "poly_diff": (_w, (_coef,)),
    "poly_exp_rms": (_wpos, (_coef,)),
    "dense_layer_no_bias": (_w, (_mlk, ord("r"))),
    "dense_layer_with_bias": (
        _w, (_mlk, np.zeros(8, "float32") + 0.1, ord("t"))),
    "classification_layer_no_bias": (_w, (_mlv, ord("s"))),
    "classification_layer_with_bias": (_w, (_mlv, 0.2, ord("l"))),
    "normalisation_layer": (
        _w, (np.full(N, 0.5, "float32"), np.full(N, 2.0, "float32"))),
    "get_wf_centroid": (_wpn, (3.0,)),
    "wf_correction": (_w, (_corr, 10, 50)),
    # a few of the long-standing flags as canaries
    "bl_subtract": (_w, (1.5,)),
    "time_over_threshold": (_w, (2.0,)),
    "min_max": (_w, ()),
    "trap_norm": (_w, (20, 10)),
}


def _all_bool_flagged():
    names = []
    for n in dir(dp):
        k = getattr(dp, n, None)
        if callable(k) and getattr(k, "tile_safe", None) is True:
            names.append(n)
    return sorted(names)


def test_every_bool_flag_has_a_case():
    """A kernel newly flagged tile_safe must get a contract case here (or a
    documented exclusion)."""
    # gufunc-dim plumbing for these needs a full chain (vector_len, dims):
    # they are exercised by the chain-level generic fusion tests instead
    excluded = {
        "avg_current", "asym_trap_filter", "double_pole_zero",
        "floor_to_nearest", "ceil_to_nearest", "round_to_nearest",
        "trunc_to_nearest", "get", "get_default", "interpolated_time_point_thresh",
        "linear_slope_fit", "linear_slope_diff", "mean_below_threshold",
        "min_max_norm", "moving_window_left", "moving_window_right",
        "moving_window_multi", "multi_a_filter", "pole_zero", "presum",
        "saturation", "time_point_thresh", "trap_filter", "trap_pickoff",
        "where", "windower",
    }
    missing = set(_all_bool_flagged()) - set(CASES) - excluded
    assert not missing, f"flagged kernels without a contract case: {missing}"


@pytest.mark.parametrize("name", sorted(CASES))
def test_tile_matches_plain(name):
    kern = getattr(dp, name)
    w, extra = CASES[name]

    def body(vals):
        outs = kern(vals["w"], *extra)
        return {f"o{i}": o for i, o in enumerate(outs)}

    plain = {k: np.asarray(v) for k, v in body({"w": w}).items()}
    tiled = _pallas.generic_rows(
        body, {"w": w}, {"w": 1}, interpret=True
    )
    assert tiled is not None, "generic_rows declined the geometry"
    assert set(tiled) == set(plain)
    for k in plain:
        a, b = plain[k], np.asarray(tiled[k])
        assert a.shape == b.shape, (k, a.shape, b.shape)
        # the tile contract is f32-ULP agreement, not bit-identity: the two
        # routes compile separately, and XLA's FMA contraction / fused exp
        # expansions differ at ULP scale for transcendental bodies (the XLA
        # fallback path — what CPU actually runs — IS bit-identical, covered
        # by test_fusion.py::test_generic_mode_bit_identical_to_unfused)
        np.testing.assert_allclose(
            np.nan_to_num(a, nan=-12345.0),
            np.nan_to_num(b, nan=-12345.0),
            rtol=2e-6, atol=2e-5, err_msg=f"{name}:{k}",
        )
        # NaN positions must match exactly (poisoning semantics)
        np.testing.assert_array_equal(
            np.isnan(a), np.isnan(b), err_msg=f"{name}:{k} nan-mask"
        )
