"""Interpret-mode correctness tests for the Pallas TPU kernels
(real-hardware performance is exercised by bench.py on the TPU runner)."""

import numpy as np
import pytest

def test_fused_energy_interpret_matches_oracle():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu.processors._pallas import fused_energy

    wf, amp, t0, bl = make_hpge_waveforms(n=16)
    tau, rise, flat = 27460.5, 625, 188
    pz, trap, emax = fused_energy(wf, bl, tau, rise, flat, interpret=True)

    w = wf.astype("f8") - bl[:, None]
    omc = -np.expm1(-1.0 / tau)
    S = np.cumsum(w, 1)
    pz_exp = w + omc * (S - w)
    Spz = np.cumsum(pz_exp, 1)

    def sh(k):
        out = np.zeros_like(Spz)
        out[:, k:] = Spz[:, : Spz.shape[1] - k]
        return out

    trap_exp = (Spz - sh(rise) - sh(rise + flat) + sh(2 * rise + flat)) / rise
    np.testing.assert_allclose(
        np.asarray(emax), trap_exp.max(1), rtol=2e-6
    )
    np.testing.assert_allclose(np.asarray(pz), pz_exp, atol=2e-3)
    np.testing.assert_allclose(np.asarray(trap), trap_exp, atol=5e-2)


def test_fused_energy_filter_fallback_matches_unfused(rng):
    from dspeed_tpu import processors as dp

    wf = np.cumsum(rng.normal(0, 5, (4, 1024)), 1).astype("float32") + 1000
    bl = np.full(4, 1000.0, "float32")
    pz, trap, emax = dp.fused_energy_filter(wf, bl, 5000.0, 100, 30)
    (blsub,) = dp.bl_subtract(wf, bl)
    (pz_ref,) = dp.pole_zero(np.asarray(blsub), 5000.0)
    (trap_ref,) = dp.trap_norm(np.asarray(pz_ref), 100, 30)
    np.testing.assert_allclose(
        np.asarray(pz), np.asarray(pz_ref), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(emax), np.asarray(trap_ref).max(-1), rtol=1e-5
    )


def test_fused_energy_multitrap_interpret_matches_oracle():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu.processors._pallas import fused_energy

    wf, amp, t0, bl = make_hpge_waveforms(n=16)
    tau = 27460.5
    specs = (("norm", 625, 188), ("asym", 8, 4, 125), ("norm", 250, 6))
    pz, traps, emaxes = fused_energy(
        wf, bl, tau, trap_specs=specs, emax_for=(0, 2), interpret=True
    )
    assert len(traps) == 3 and len(emaxes) == 2
    emax = emaxes[0]

    w = wf.astype("f8") - bl[:, None]
    omc = -np.expm1(-1.0 / tau)
    S = np.cumsum(w, 1)
    pz_exp = w + omc * (S - w)
    Spz = np.cumsum(pz_exp, 1)

    def sh(k):
        out = np.zeros_like(Spz)
        out[:, k:] = Spz[:, : Spz.shape[1] - k]
        return out

    exp0 = (Spz - sh(625) - sh(625 + 188) + sh(2 * 625 + 188)) / 625
    exp1 = (Spz - sh(8)) / 8 - (sh(8 + 4) - sh(8 + 4 + 125)) / 125
    exp2 = (Spz - sh(250) - sh(250 + 6) + sh(2 * 250 + 6)) / 250
    np.testing.assert_allclose(np.asarray(emax), exp0.max(1), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(traps[0]), exp0, rtol=0, atol=5e-2)
    # long-window sections via Spz differences carry eps*|Spz|/L absolute
    # error (~0.06-0.15 ADC here); at the trap's crossing slope
    # (~amp/rise ~ 375 ADC/sample) that shifts thresholds by < 1e-3 samples
    np.testing.assert_allclose(np.asarray(traps[1]), exp1, rtol=0, atol=2.5e-1)
    np.testing.assert_allclose(np.asarray(traps[2]), exp2, rtol=0, atol=2.5e-1)
    np.testing.assert_allclose(
        np.asarray(emaxes[1]), exp2.max(1), rtol=1e-5
    )


def test_fused_energy_interpret_nan_poisoning():
    """The kernel NaN-poisons in VMEM (NaN waveform sample or NaN baseline
    -> whole-row NaN outputs); rows without NaN stay finite."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu.processors._pallas import fused_energy

    wf, amp, t0, bl = make_hpge_waveforms(n=8)
    wf = wf.copy()
    wf[1, 700] = np.nan  # NaN sample
    bl = bl.copy()
    bl[3] = np.nan  # NaN baseline
    specs = (("norm", 625, 188), ("asym", 8, 4, 125))
    pz, traps, emaxes = fused_energy(
        wf, bl, 27460.5, trap_specs=specs, emax_for=(0,), interpret=True
    )
    for arr in [pz, *traps, *emaxes]:
        a = np.asarray(arr)
        assert np.all(np.isnan(a[1])) and np.all(np.isnan(a[3]))
        ok = [0, 2, 4, 5, 6, 7]
        assert np.all(np.isfinite(a[ok]))


def test_fused_energy_front_fallback_matches_unfused(rng):
    from dspeed_tpu import processors as dp

    wf = np.cumsum(rng.normal(0, 5, (4, 1024)), 1).astype("float32") + 1000
    bl = np.full(4, 1000.0, "float32")
    kern = dp.fused_energy_front(
        5000.0, [("norm", 100, 30), ("asym", 8, 4, 60)]
    )
    pz, t0_, t1, emax = kern(wf, bl)
    (blsub,) = dp.bl_subtract(wf, bl)
    (pz_ref,) = dp.pole_zero(np.asarray(blsub), 5000.0)
    (t0_ref,) = dp.trap_norm(np.asarray(pz_ref), 100, 30)
    (t1_ref,) = dp.asym_trap_filter(np.asarray(pz_ref), 8, 4, 60)
    np.testing.assert_array_equal(np.asarray(pz), np.asarray(pz_ref))
    np.testing.assert_array_equal(np.asarray(t0_), np.asarray(t0_ref))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t1_ref))
    np.testing.assert_array_equal(
        np.asarray(emax), np.asarray(t0_ref).max(-1)
    )


def test_fused_current_interpret_matches_oracle(rng):
    """Interpret-mode fused current front (upsample x16 -> L/R/L 48-sample
    moving averages -> min_max) vs a float64 re-derivation of the composed
    reference semantics (upsampler.py:19, moving_windows.py:125,
    min_max.py:19). n_up=4784 is NOT a multiple of the 128 block."""
    from dspeed_tpu.processors._pallas import fused_current

    c = np.abs(rng.normal(0, 10, (16, 300))).astype("float32")
    n_up, ratio, L = 4784, 16, 48

    def mwl64(x, L):
        n = x.shape[-1]
        S = np.cumsum(x, -1)
        i = np.arange(n)
        ramp = x[..., :1] + (S - (i + 1) * x[..., :1]) / L
        SL = np.zeros_like(S)
        SL[..., L:] = S[..., :-L]
        return np.where(i < L, ramp, (S - SL) / L)

    x = np.repeat(c.astype("f8"), ratio, -1)[:, ratio // 2 : ratio // 2 + n_up]
    for right in (False, True, False):
        x = mwl64(x[..., ::-1], L)[..., ::-1] if right else mwl64(x, L)

    # routed path (polyphase for this geometry — _poly_plan is not None)
    from dspeed_tpu.processors import _pallas as P

    assert P._poly_plan(300, ratio, ratio // 2, n_up, L, 3, 0) is not None
    t_min, t_max, a_min, a_max = [
        np.asarray(o)
        for o in fused_current(c, ratio, ratio // 2, n_up, L, 3, 0,
                               interpret=True)
    ]
    np.testing.assert_allclose(a_max, x.max(-1), rtol=1e-5)
    np.testing.assert_allclose(a_min, x.min(-1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(t_max, x.argmax(-1))
    np.testing.assert_array_equal(t_min, x.argmin(-1))

    # up-domain kernel (the fallback route for geometries _poly_plan
    # rejects) against the same oracle
    import jax.numpy as jnp

    c2 = jnp.asarray(c)
    rep = jnp.repeat(c2, ratio, axis=-1)
    t_min, t_max, a_min, a_max = [
        np.asarray(o[:, 0])
        for o in P._fused_current_call(
            rep, ratio // 2, n_up, L, 3, 0, interpret=True
        )
    ]
    np.testing.assert_allclose(a_max, x.max(-1), rtol=1e-5)
    np.testing.assert_allclose(a_min, x.min(-1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(t_max, x.argmax(-1))
    np.testing.assert_array_equal(t_min, x.argmin(-1))


def test_fused_current_need_elision_interpret(rng):
    """Dead-output elision: every `need` combination leaves the needed
    outputs bitwise identical to the all-True kernel (the skipped outputs
    come back as zeros) on BOTH the polyphase and up-domain routes, and
    fused_t0's elision matches its all-True outputs too."""
    import jax.numpy as jnp

    from dspeed_tpu.processors import _pallas as P

    c = np.abs(rng.normal(0, 10, (16, 300))).astype("float32")
    n_up, ratio, L = 4784, 16, 48
    full = [
        np.asarray(o)
        for o in P.fused_current(c, ratio, ratio // 2, n_up, L, 3, 0,
                                 interpret=True)
    ]
    rep = jnp.repeat(jnp.asarray(c), ratio, axis=-1)
    full_up = [
        np.asarray(o[:, 0])
        for o in P._fused_current_call(rep, ratio // 2, n_up, L, 3, 0,
                                       interpret=True)
    ]
    for need in [(False, True, False, True), (True, False, False, False),
                 (False, False, True, True)]:
        outs = [
            np.asarray(o)
            for o in P.fused_current(c, ratio, ratio // 2, n_up, L, 3, 0,
                                     need=need, interpret=True)
        ]
        outs_up = [
            np.asarray(o[:, 0])
            for o in P._fused_current_call(rep, ratio // 2, n_up, L, 3, 0,
                                           need=need, interpret=True)
        ]
        for k in range(4):
            # needed outputs are bitwise identical; un-needed outputs are
            # unspecified (zeros, or real values when computed anyway as
            # an internal dependency) — nothing reads them by construction
            if need[k]:
                np.testing.assert_array_equal(outs[k], full[k])
                np.testing.assert_array_equal(outs_up[k], full_up[k])

    w = rng.normal(0, 5, (16, 256)).astype("float32")
    kern_arr = np.hanning(33)
    std = np.full(16, 3.0, "float32")
    t_full = [np.asarray(o)
              for o in P.fused_t0(w, kern_arr, std, interpret=True)]
    t_el = [
        np.asarray(o)
        for o in P.fused_t0(w, kern_arr, std,
                            need=(False, True, False, True),
                            interpret=True)
    ]
    np.testing.assert_array_equal(t_el[1], t_full[1])  # t_max
    np.testing.assert_array_equal(t_el[3], t_full[3])  # a_max
    np.testing.assert_array_equal(t_el[4], t_full[4])  # tp_0
    # neither t_min nor a_min needed: both reductions skipped -> zeros
    assert (t_el[0] == 0).all() and (t_el[2] == 0).all()


@pytest.mark.parametrize("mtype,num", [(0, 3), (1, 2), (2, 2), (0, 0)])
def test_fused_current_front_fallback_matches_unfused(rng, mtype, num):
    """The XLA fallback composes the original kernel bodies — bit-identical
    to the unfused upsampler -> moving_window_multi -> min_max steps (the
    fusion pass relies on this)."""
    from dspeed_tpu import processors as dp

    c = rng.normal(0, 5, (6, 100)).astype("float32")
    n_up = 790
    kern = dp.fused_current_front(n_up, 8, 32, num, mtype)
    outs = [np.asarray(o) for o in kern(c)]
    (up,) = dp.upsampler(c, 8.0, dims={"m": n_up})
    (av,) = dp.moving_window_multi(
        np.asarray(up), 32.0, float(num), np.int32(mtype)
    )
    refs = [np.asarray(o) for o in dp.min_max(np.asarray(av))]
    for a, b in zip(outs, refs):
        np.testing.assert_array_equal(a, b)


def test_fused_current_front_nan_poisoning(rng):
    from dspeed_tpu import processors as dp

    c = rng.normal(0, 5, (4, 100)).astype("float32")
    c[2, 50] = np.nan
    kern = dp.fused_current_front(790, 8, 32, 3, 0)
    for o in kern(c):
        o = np.asarray(o)
        assert np.all(np.isnan(o[2])) and np.all(np.isfinite(o[[0, 1, 3]]))


@pytest.mark.parametrize(
    "n_curr,ratio,n_up,L,num,mtype",
    [
        (301, 16, 4788, 48, 3, 0),   # flagship A/E geometry
        (301, 16, 4784, 48, 3, 0),   # n_up not a multiple of the block
        (200, 8, 1590, 24, 2, 0),    # L-R cascade, ratio 8
        (300, 16, 4700, 32, 3, 1),   # all-left cascade
        (300, 16, 4700, 32, 3, 2),   # all-right cascade
        (128, 4, 500, 12, 1, 0),     # single stage, small ratio
    ],
)
def test_poly_vs_updomain_interpret(rng, n_curr, ratio, n_up, L, num, mtype):
    """The polyphase route must agree with the up-domain kernel it replaces
    on every geometry its margin analysis accepts: values to float32
    rounding, extremum indices exactly (random data, no ties)."""
    import jax.numpy as jnp

    from dspeed_tpu.processors import _pallas as P

    half = ratio // 2
    plan = P._poly_plan(n_curr, ratio, half, n_up, L, num, mtype)
    assert plan is not None, "margin analysis rejected a supported geometry"

    b = 64
    c = rng.normal(0, 30, (b, n_curr)).astype("float32")
    c[:, n_curr // 3] += 500.0

    pad_b = (-b) % P._POLY_TILE_B
    cp = jnp.pad(jnp.asarray(c), ((0, pad_b), (0, 0))) if pad_b else jnp.asarray(c)
    got = [
        np.asarray(o[:b, 0])
        for o in P._fused_current_poly_call(
            cp, n_curr, ratio, half, n_up, L, num, mtype, interpret=True
        )
    ]
    rep = jnp.repeat(jnp.asarray(c), ratio, axis=-1)
    if half + n_up > rep.shape[-1]:
        rep = jnp.pad(rep, ((0, 0), (0, half + n_up - rep.shape[-1])))
    want = [
        np.asarray(o[:b, 0])
        for o in P._fused_current_call(
            rep, half, n_up, L, num, mtype, interpret=True
        )
    ]
    scale = max(np.abs(want[2]).max(), np.abs(want[3]).max(), 1.0)
    np.testing.assert_allclose(got[2], want[2], atol=2e-5 * scale, rtol=0)
    np.testing.assert_allclose(got[3], want[3], atol=2e-5 * scale, rtol=0)
    # indices must match except where the two implementations' rounding
    # flips a near-tie (the extremum VALUES agree within tolerance above,
    # which is exactly the near-tie evidence); allow only a few such rows
    assert (got[0] != want[0]).sum() <= b // 16, "t_min beyond near-ties"
    assert (got[1] != want[1]).sum() <= b // 16, "t_max beyond near-ties"


def test_poly_plan_rejects_bad_geometries():
    from dspeed_tpu.processors import _pallas as P

    # n_up smaller than the edge windows
    assert P._poly_plan(100, 4, 2, 200, 24, 3, 0) is None
    # replication map not all-valid
    assert P._poly_plan(30, 16, 8, 600, 48, 3, 0) is None
    # L too large relative to the edge window
    assert P._poly_plan(301, 16, 8, 4788, 128, 3, 0) is None


class TestBandedConv:
    """Interpret-mode tests for the in-VMEM banded convolution
    (``_pallas.banded_conv_multi``): single-kernel 'same' windows (the
    t0-filter geometry), multi-block tiling, the CUSP/ZAC-style valid-mode
    bank, and in-kernel NaN poisoning — all vs ``numpy.convolve`` in f64."""

    @staticmethod
    def _ref(w, kerns, lo, p):
        return [
            np.stack(
                [np.convolve(row.astype("f8"), k)[lo : lo + p] for row in w]
            )
            for k in kerns
        ]

    def test_same_mode_single_block(self, rng):
        from dspeed_tpu.processors._pallas import banded_conv_multi

        w = rng.normal(0, 1, (12, 512)).astype("float32")
        k = rng.normal(0, 1, 133)
        lo, p = (133 - 1) // 2, 512
        got = banded_conv_multi(w, [k], lo, p, interpret=True)
        (ref,) = self._ref(w, [k], lo, p)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(
            np.asarray(got[0]), ref, rtol=5e-5, atol=1e-5 * scale
        )

    def test_same_mode_multiblock(self, rng):
        from dspeed_tpu.processors._pallas import banded_conv_multi

        # p > 640 forces 128-wide blocks (the production t0-filter shape)
        w = rng.normal(0, 1, (8, 1024)).astype("float32")
        k = rng.normal(0, 1, 133)
        lo, p = (133 - 1) // 2, 1024
        got = banded_conv_multi(w, [k], lo, p, interpret=True)
        (ref,) = self._ref(w, [k], lo, p)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(
            np.asarray(got[0]), ref, rtol=5e-5, atol=1e-5 * scale
        )

    def test_valid_mode_bank(self, rng):
        from dspeed_tpu.processors._pallas import banded_conv_multi

        # CUSP/ZAC-style: two long kernels, short valid window, one matmul
        w = rng.normal(0, 1, (16, 499)).astype("float32")
        kerns = [rng.normal(0, 1, 400), rng.normal(0, 1, 400)]
        lo, p = 399, 100
        got = banded_conv_multi(w, kerns, lo, p, interpret=True)
        refs = self._ref(w, kerns, lo, p)
        for g, ref in zip(got, refs):
            scale = np.abs(ref).max()
            np.testing.assert_allclose(
                np.asarray(g), ref, rtol=5e-5, atol=1e-5 * scale
            )

    def test_n_in_absorbs_leading_slice(self, rng):
        """``n_in=k`` on a wider array must equal slicing ``w[..., :k]``
        first, bit-for-bit — the fusion pass relies on this to delete the
        engine's ``var[0:k]`` HBM materialization before the custom call.
        Data beyond the slice (including NaN) must not leak in."""
        from dspeed_tpu.processors._pallas import banded_conv_multi

        w = rng.normal(0, 1, (16, 499)).astype("float32")
        w[:, 420:] = np.nan  # beyond the view: must never be read
        kerns = [rng.normal(0, 1, 400), rng.normal(0, 1, 400)]
        lo, p = 399, 20
        ref = banded_conv_multi(w[:, :418], kerns, lo, p, interpret=True)
        got = banded_conv_multi(w, kerns, lo, p, n_in=418, interpret=True)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
        assert banded_conv_multi(w, kerns, lo, p, n_in=600,
                                 interpret=True) is None

    def test_nan_rows_poison_in_kernel(self, rng):
        from dspeed_tpu.processors._pallas import banded_conv_multi

        w = rng.normal(0, 1, (6, 256)).astype("float32")
        w[2, 17] = np.nan
        w[4, :] = np.nan
        k = rng.normal(0, 1, 65)
        got = banded_conv_multi(w, [k], 32, 256, interpret=True)
        out = np.asarray(got[0])
        assert np.isnan(out[2]).all() and np.isnan(out[4]).all()
        ok_rows = [0, 1, 3, 5]
        assert np.isfinite(out[ok_rows]).all()

    def test_stacked_leading_dims_and_ragged_batch(self, rng):
        from dspeed_tpu.processors._pallas import banded_conv_multi

        # (chan, B, n) stacked layout with a batch that needs row padding
        w = rng.normal(0, 1, (3, 5, 256)).astype("float32")
        k = rng.normal(0, 1, 65)
        got = banded_conv_multi(w, [k], 64, 192, interpret=True)
        assert got[0].shape == (3, 5, 192)
        flat = self._ref(w.reshape(-1, 256), [k], 64, 192)[0].reshape(
            3, 5, 192
        )
        scale = np.abs(flat).max()
        np.testing.assert_allclose(
            np.asarray(got[0]), flat, rtol=5e-5, atol=1e-5 * scale
        )


class TestFusedT0:
    """Interpret-mode tests for the fused t0 front (conv 'same' ->
    min_max -> backward time_point_thresh in one VMEM pass)."""

    @staticmethod
    def _unfused(w, kern, std):
        from dspeed_tpu.processors.convolutions import convolve_wf
        from dspeed_tpu.processors.min_max import min_max
        from dspeed_tpu.processors.time_point_thresh import time_point_thresh

        (c,) = convolve_wf(w, kern, np.int8(ord("s")), dims={"p": w.shape[-1]})
        t_min, t_max, a_min, a_max = min_max(np.asarray(c))
        (tp0,) = time_point_thresh(np.asarray(c), std, np.asarray(t_max), 0)
        return [np.asarray(x) for x in (t_min, t_max, a_min, a_max, tp0)]

    def test_matches_unfused_composition(self, rng):
        from dspeed_tpu.processors._pallas import fused_t0

        n = 512
        w = np.cumsum(rng.normal(0.2, 1.0, (12, n)), axis=1).astype("float32")
        kern = rng.normal(0, 1, 33)
        kern /= np.abs(kern).sum()
        std = rng.uniform(0.5, 2.0, 12).astype("float32")
        got = [np.asarray(o) for o in fused_t0(w, kern, std, interpret=True)]
        want = self._unfused(w, kern, std)
        for g, e, name in zip(got, want, "t_min t_max a_min a_max tp0".split()):
            if name.startswith("t"):
                # indices: exact match except float-rounding near-ties
                neq = (np.nan_to_num(g, nan=-1) != np.nan_to_num(e, nan=-1))
                assert neq.sum() <= 1, (name, g, e)
            else:
                scale = max(1.0, np.abs(e).max())
                np.testing.assert_allclose(
                    g, e, rtol=1e-5, atol=1e-5 * scale, err_msg=name
                )

    def test_nan_rows_poison(self, rng):
        from dspeed_tpu.processors._pallas import fused_t0

        w = np.cumsum(rng.normal(0.2, 1.0, (6, 256)), axis=1).astype("float32")
        w[1, 100] = np.nan
        w[4, :] = np.nan
        kern = rng.normal(0, 1, 17)
        std = np.full(6, 1.0, "float32")
        got = [np.asarray(o) for o in fused_t0(w, kern, std, interpret=True)]
        for g in got:
            assert np.isnan(g[[1, 4]]).all()
        # NaN threshold poisons only tp0
        std2 = std.copy()
        std2[2] = np.nan
        got2 = [np.asarray(o) for o in fused_t0(w, kern, std2, interpret=True)]
        assert np.isnan(got2[4][2])
        assert np.isfinite(got2[0][2]) and np.isfinite(got2[3][2])

    def test_not_fused_when_filtered_wf_is_output(self):
        """wf_t0_filter requested as a chain output is read by an output
        manager, so the branch must NOT collapse (the fused kernel only
        emits the scalars)."""
        import os as _os
        import sys as _sys

        import yaml

        _sys.path.insert(
            0, _os.path.join(_os.path.dirname(__file__), "..")
        )
        from test_build_dsp import CONFIG, DB_FLAT, make_hpge_waveforms

        from dspeed_tpu import lh5
        from dspeed_tpu.processing_chain import build_processing_chain

        cfg = yaml.safe_load(open(CONFIG))
        cfg["outputs"] = ["tp_0_est", "wf_t0_filter"]
        wf, amp, t0, bl = make_hpge_waveforms(n=8)
        tb = lh5.Table(
            {
                "waveform": lh5.WaveformTable(
                    values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
                ),
                "baseline": lh5.Array(bl.astype("float32")),
            }
        )
        prev = _os.environ.get("DSPEED_TPU_FUSE")
        _os.environ["DSPEED_TPU_FUSE"] = "1"
        try:
            chain, _, _ = build_processing_chain(cfg, tb, db_dict=DB_FLAT)
        finally:
            if prev is None:
                _os.environ.pop("DSPEED_TPU_FUSE", None)
            else:
                _os.environ["DSPEED_TPU_FUSE"] = prev
        names = [str(s) for s in chain._steps]
        assert not any("fused_t0_front" in s for s in names), names


def test_fused_energy_emit_minmax_blsub_interpret(rng):
    """emit_minmax / emit_blsub extras: the raw-waveform min_max quadruple
    must match the standalone kernel (incl. its waveform-only NaN mask —
    a NaN baseline must not poison it) and blsub must equal w - baseline."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu.processors._pallas import fused_energy
    from dspeed_tpu.processors.min_max import min_max

    wf, amp, t0, bl = make_hpge_waveforms(n=16, nsamp=1024)
    wf = wf.copy()
    bl = bl.astype("float32").copy()
    wf[3, :] = np.nan
    bl[5] = np.nan  # poisons pz/traps/blsub but NOT the raw min_max
    pz, traps, emaxes, tmin, tmax, amin, amax, blsub = fused_energy(
        wf, bl, 27460.5, trap_specs=(("norm", 64, 16),), emax_for=(0,),
        emit_blsub=True, emit_minmax=True, interpret=True,
    )
    rt_min, rt_max, ra_min, ra_max = (
        np.asarray(x) for x in min_max(wf)
    )
    np.testing.assert_array_equal(np.asarray(tmin), rt_min)
    np.testing.assert_array_equal(np.asarray(tmax), rt_max)
    np.testing.assert_array_equal(np.asarray(amin), ra_min)
    np.testing.assert_array_equal(np.asarray(amax), ra_max)
    assert np.isfinite(np.asarray(amax)[5])  # NaN baseline: minmax intact
    bsub = np.asarray(blsub)
    exp = wf - bl[:, None]
    np.testing.assert_allclose(bsub[[0, 1, 2]], exp[[0, 1, 2]], rtol=1e-6)
    assert np.isnan(bsub[3]).all() and np.isnan(bsub[5]).all()


def test_fused_t0_curr_absorption_interpret(rng):
    """curr_spec path: the absorbed windower -> avg_current output must
    match the standalone kernels driven by the fused tp_0, including the
    out-of-range window NaN semantics near the waveform end."""
    from dspeed_tpu.processors._pallas import fused_t0
    from dspeed_tpu.processors.moving_windows import avg_current
    from dspeed_tpu.processors.windower import windower

    n, win_m, ln = 512, 101, 1
    w = np.cumsum(rng.normal(0.3, 1.0, (10, n)), axis=1).astype("float32")
    # one event whose window will hang off the end of the waveform
    w[7, :480] = 0.0
    w[7, 480:] = np.linspace(0, 50, 32)
    kern = rng.normal(0, 1, 33)
    kern /= np.abs(kern).sum()
    std = rng.uniform(0.2, 1.0, 10).astype("float32")
    outs = fused_t0(
        w, kern, std, curr_spec=(win_m, ln, win_m - ln), interpret=True
    )
    tp0 = np.asarray(outs[4])
    (wle,) = windower(w, tp0, dims={"m": win_m})
    (want,) = avg_current(np.asarray(wle), float(ln), dims={"m": win_m - ln})
    got = np.asarray(outs[5])
    want = np.asarray(want)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.nan_to_num(got, nan=-12345.0),
        np.nan_to_num(want, nan=-12345.0),
        rtol=1e-6, atol=1e-6,
    )
    # the edge event's window must be NaN-poisoned through avg_current
    if np.isnan(np.asarray(wle)[7]).any():
        assert np.isnan(got[7]).all()


def test_fused_energy_slope_specs_interpret(rng):
    """slope_specs: the absorbed linear_slope_fit quadruples over blsub/pz
    slices must match the standalone kernel on the same slices."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu.processors._pallas import fused_energy
    from dspeed_tpu.processors.bl_subtract import bl_subtract
    from dspeed_tpu.processors.linear_slope_fit import linear_slope_fit
    from dspeed_tpu.processors.pole_zero import pole_zero

    wf, amp, t0, bl = make_hpge_waveforms(n=12, nsamp=1024)
    bl = bl.astype("float32")
    outs = fused_energy(
        wf, bl, 27460.5, trap_specs=(("norm", 64, 16),), emax_for=(0,),
        slope_specs=((0, 0, 300), (1, 600, 1024)), interpret=True,
    )
    pz_arr = np.asarray(outs[0])
    (wsub,) = bl_subtract(wf, bl)
    (pz_ref,) = pole_zero(np.asarray(wsub), 27460.5)
    for si, (arr, sl) in enumerate(
        ((np.asarray(wsub), slice(0, 300)), (np.asarray(pz_ref), slice(600, 1024)))
    ):
        want = [np.asarray(x) for x in linear_slope_fit(arr[:, sl])]
        got = [np.asarray(outs[3 + 4 * si + oi]) for oi in range(4)]
        for g, e, nm in zip(got, want, ("mean", "std", "slope", "icept")):
            scale = max(1.0, np.abs(e).max())
            np.testing.assert_allclose(
                g, e, rtol=5e-4, atol=1e-4 * scale,
                err_msg=f"spec {si} {nm}",
            )


def test_cascade_tp_interpret_bit_identical(rng):
    """Pallas VMEM cascade vs the XLA chained_time_point_thresh body: every
    link's index must match bit-for-bit, including NaN-poisoned rows
    (NaN waveform, NaN threshold base, NaN / non-integral / out-of-range
    start) and ties (the flat-top rows)."""
    import jax.numpy as jnp

    from dspeed_tpu.processors._pallas import cascade_tp
    from dspeed_tpu.processors.tp_chain import chained_time_point_thresh

    factors = [1.0, 0.99, 0.95, 0.90, 0.80, 0.50, 0.20, 0.10, 0.01, 0.005]
    dirs = [1, 1, -1, -1, -1, -1, -1, -1, -1, -1]
    starts = [-1, -1, 1, 2, 3, 4, 5, 6, 7, 8]
    kern = chained_time_point_thresh(factors, dirs, starts)

    B, N = 64, 512
    w = np.abs(np.cumsum(rng.normal(0.05, 1.0, (B, N)), axis=1)).astype(
        "float32"
    ) + 1.0
    w[2, 50:60] = w[2, 49]  # exact ties across the extremum
    w[3, 100] = np.nan
    base = (np.nanmax(w, axis=1) * 0.97).astype("float32")
    base[5] = np.nan
    t0 = np.full(B, 40.0, "float32")
    t0[7] = 39.5
    t0[9] = -3.0
    t0[11] = np.nan

    ref = kern.fn(jnp.asarray(w), jnp.asarray(base), jnp.asarray(t0))
    got = cascade_tp(w, base, t0, factors, dirs, starts, interpret=True)
    assert got is not None
    for k, (r, g) in enumerate(zip(ref, got)):
        r, g = np.asarray(r), np.asarray(g)
        same = (r == g) | (np.isnan(r) & np.isnan(g))
        assert same.all(), (k, np.where(~same)[0][:5])


def test_cascade_tp_geometry_gates():
    from dspeed_tpu.processors._pallas import cascade_tp

    w = np.ones((8, 500), "float32")  # n % 128 != 0
    assert cascade_tp(w, np.ones(8, "f4"), np.zeros(8, "f4"),
                      [1.0], [1], [-1]) is None
    w = np.ones((8, 512), "float32")
    assert cascade_tp(w, np.ones(8, "f4"), np.zeros(8, "f4"),
                      [0.1] * 16, [1] * 16, [-1] * 16) is None  # m > 15


def test_fused_t0_atrap_absorption_interpret(rng):
    """atrap_spec path: the absorbed trapezoid + backward threshold search
    (the flagship's tp_0_atrap) must match the standalone asym_trap_filter
    -> time_point_thresh driven by the fused tp_start, within the blocked
    prefix-sum formulation's rounding (indices exact except near-ties)."""
    from dspeed_tpu.processors._pallas import fused_t0
    from dspeed_tpu.processors.min_max import min_max
    from dspeed_tpu.processors.convolutions import convolve_wf
    from dspeed_tpu.processors.time_point_thresh import time_point_thresh
    from dspeed_tpu.processors.trap_filters import asym_trap_filter

    n = 512
    w = np.cumsum(rng.normal(0.2, 1.0, (12, n)), axis=1).astype("float32")
    w[9, :] = np.nan
    kern = rng.normal(0, 1, 33)
    kern /= np.abs(kern).sum()
    std = rng.uniform(0.5, 2.0, 12).astype("float32")
    spec = ("asym", 8, 4, 32)
    outs = fused_t0(w, kern, std, atrap_spec=spec, interpret=True)
    assert len(outs) == 6
    got = np.asarray(outs[5])
    # reference composition off the same start (the conv's t_max)
    (c,) = convolve_wf(w, kern, np.int8(ord("s")), dims={"p": n})
    _, t_max, _, _ = min_max(np.asarray(c))
    (atr,) = asym_trap_filter(w, spec[1], spec[2], spec[3])
    (want,) = time_point_thresh(
        np.asarray(atr), std, np.asarray(t_max), 0
    )
    want = np.asarray(want)
    assert np.isnan(got[9]) and np.isnan(want[9])
    neq = np.nan_to_num(got, nan=-1) != np.nan_to_num(want, nan=-1)
    assert neq.sum() <= 1, (got, want)  # near-tie rounding at most


def test_t0_front_claims_orphan_trap_search():
    """In a chain with no amax'd trapezoid (no energy front), the t0 front
    absorbs a pileup trap + backward search whose threshold and start it
    already holds, and the fused outputs are bit-identical to the unfused
    chain (CPU takes the XLA fallback composition). In the flagship chain
    the energy front claims the trap first (measured faster on v5e, r4) —
    that wiring is covered by the flagship fusion tests."""
    import os as _os

    import jax

    from dspeed_tpu.processing_chain import build_processing_chain
    from dspeed_tpu import lh5

    rng = np.random.default_rng(7)
    wf = np.cumsum(
        rng.normal(0.2, 1.0, (16, 512)), axis=1
    ).astype("float32")
    thr = np.full(16, 1.5, "float32")
    tb = lh5.Table(
        {
            "waveform": lh5.WaveformTable(
                values=wf, t0=0.0, t0_units="ns", dt=16.0, dt_units="ns"
            ),
            "thr": lh5.Array(thr),
        }
    )
    cfg = {
        "outputs": ["tp_0_est", "tp_0_atrap"],
        "processors": {
            "t0_kernel": {
                "function": "t0_filter",
                "module": "dspeed_tpu.processors",
                "args": [
                    "8*ns/waveform.period", "128*ns/waveform.period",
                    "t0_kernel(round((8*ns+128*ns)/waveform.period), 'f')",
                ],
            },
            "wf_t0f": {
                "function": "convolve_wf",
                "module": "dspeed_tpu.processors",
                "args": [
                    "waveform", "t0_kernel", "'s'",
                    "wf_t0f(len(waveform), 'f', grid=waveform.grid)",
                ],
            },
            "conv_tmin, tp_start, conv_min, conv_max": {
                "function": "min_max",
                "module": "dspeed_tpu.processors",
                "args": [
                    "wf_t0f", "conv_tmin", "tp_start", "conv_min",
                    "conv_max",
                ],
            },
            "tp_0_est": {
                "function": "time_point_thresh",
                "module": "dspeed_tpu.processors",
                "args": ["wf_t0f", "thr", "tp_start", 0, "tp_0_est"],
            },
            "wf_atr": {
                "function": "asym_trap_filter",
                "module": "dspeed_tpu.processors",
                "args": ["waveform", "8", "4", "32", "wf_atr"],
            },
            "tp_0_atrap": {
                "function": "time_point_thresh",
                "module": "dspeed_tpu.processors",
                "args": ["wf_atr", "thr", "tp_start", 0, "tp_0_atrap"],
            },
        },
    }
    prev = _os.environ.get("DSPEED_TPU_FUSE")
    _os.environ["DSPEED_TPU_FUSE"] = "strict"
    try:
        chain, _, _ = build_processing_chain(cfg, tb)
        tfront = next(
            (
                s
                for s in chain._steps
                if getattr(getattr(s, "kernel", None), "__name__", "")
                == "fused_t0_front"
            ),
            None,
        )
        assert tfront is not None
        assert any("tp_0_atrap" in o.key for o in tfront.out_specs)
        inputs, _ = chain._gather_inputs(0, chain._buffer_len)
        out = jax.jit(chain._build_fn())(inputs)

        _os.environ["DSPEED_TPU_FUSE"] = "0"
        uchain, _, _ = build_processing_chain(cfg, tb)
        uinputs, _ = uchain._gather_inputs(0, uchain._buffer_len)
        uout = jax.jit(uchain._build_fn())(uinputs)
    finally:
        if prev is None:
            _os.environ.pop("DSPEED_TPU_FUSE", None)
        else:
            _os.environ["DSPEED_TPU_FUSE"] = prev
    for name in ("tp_0_est", "tp_0_atrap"):
        k1 = next(k for k in out if k.startswith(name))
        k2 = next(k for k in uout if k.startswith(name))
        np.testing.assert_array_equal(
            np.asarray(out[k1]), np.asarray(uout[k2])
        )


def test_fused_energy_mask_specs_interpret(rng):
    """mask_specs: the emitted uint8 crossing bitplane must encode exactly
    _crossing_masks' predicates of the absorbed trapezoid vs the slope
    output, with bad rows zeroed, and tp_from_cross_mask must reproduce
    time_point_thresh on it bit-for-bit."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from test_build_dsp import make_hpge_waveforms

    from dspeed_tpu.processors._pallas import fused_energy
    from dspeed_tpu.processors.time_point_thresh import (
        _crossing_masks,
        tp_from_cross_mask,
        time_point_thresh,
    )
    from dspeed_tpu.processors.trap_filters import asym_trap_filter
    from dspeed_tpu.processors.linear_slope_fit import linear_slope_fit

    wf, amp, t0, bl = make_hpge_waveforms(n=12, nsamp=1024)
    wf = wf.copy()
    wf[4, 100] = np.nan
    spec = ("asym", 8, 4, 60)
    outs = fused_energy(
        wf, bl, 27460.5, trap_specs=(("norm", 64, 16),), emax_for=(0,),
        slope_specs=((0, 0, 256),),
        mask_specs=((spec, 0, 1, False, True),),  # thr = bl_std, bwd only
        interpret=True,
    )
    mask = np.asarray(outs[-1])
    assert mask.dtype == np.uint8 and mask.shape == wf.shape
    assert (mask[4] == 0).all()  # bad row zeroed

    # oracle masks from the composed kernels (fused pz is tolerance-level
    # vs the composed pole_zero, so crossings can shift on near-ties; the
    # mask layout itself must match exactly on the fused trap)
    pz = np.asarray(outs[0])
    bl_std = np.asarray(outs[3 + 1])  # [pz, trap, emax, mean, stdev, ...]
    (atr,) = asym_trap_filter(pz, 8, 4, 60)
    import jax.numpy as jnp

    _, bwd = _crossing_masks(jnp.asarray(atr), jnp.asarray(bl_std))
    want = (np.asarray(bwd).astype(np.uint8) << 1)
    want[4] = 0
    np.testing.assert_array_equal(mask[~np.isnan(pz).any(1)],
                                  want[~np.isnan(pz).any(1)])

    # the finishing kernel == time_point_thresh on the same trap/threshold
    t_start = np.full(12, 900.0, "float32")
    (got,) = tp_from_cross_mask(0)(jnp.asarray(mask), jnp.asarray(t_start))
    (ref,) = time_point_thresh(
        jnp.asarray(atr), jnp.asarray(bl_std), jnp.asarray(t_start), 0
    )
    np.testing.assert_array_equal(
        np.nan_to_num(np.asarray(got), nan=-1),
        np.nan_to_num(np.asarray(ref), nan=-1),
    )
