"""Run the reference's processor kernels unmodified as parity oracles.

The reference (`/root/reference/src/dspeed/processors/*.py`) decorates plain
Python kernel bodies with ``numba.guvectorize``/``numba.vectorize``. numba is
not installed here; this module installs a pure-Python ``numba`` stub whose
``guvectorize`` wraps the raw function in the *reference's own*
``GUFuncWrapper`` (``/root/reference/src/dspeed/utils.py:12-163``) — the same
trick the reference's ``compare_numba_vs_python`` harness uses
(``/root/reference/tests/conftest.py:62-180``) — and then loads the reference
processor modules under a synthetic ``refdsp`` package so their relative
imports (``from ..utils import ...``) resolve without pulling the heavy engine
dependencies (lgdo, pint, pywt, iminuit).

The loaded kernels execute the reference's actual Python bodies, element by
element, making them ground-truth oracles for dspeed_tpu's batched JAX
kernels. Nothing here is copied from the reference; the reference files are
*executed*, not duplicated.
"""

from __future__ import annotations

import importlib
import importlib.util
import re
import sys
import types

import numpy as np

REF_ROOT = "/root/reference/src/dspeed"

# numba type-name -> numpy char code (both long and short spellings)
_NUMBA_CHAR = {
    "float32": "f", "float64": "d", "f4": "f", "f8": "d",
    "int8": "b", "int16": "h", "int32": "i", "int64": "l",
    "i1": "b", "i2": "h", "i4": "i", "i8": "l",
    "uint8": "B", "uint16": "H", "uint32": "I", "uint64": "L",
    "u1": "B", "u2": "H", "u4": "I", "u8": "L",
    "boolean": "?", "bool_": "?", "b1": "?", "char": "c",
    "complex64": "F", "complex128": "D", "c8": "F", "c16": "D",
}


def _sig_chars(type_sig: str) -> str:
    """'void(float32[:], float32, float32[:])' -> 'fff'; 'f4(f4,f4)' -> 'ff->f'."""
    s = re.sub(r"\[[^\]]*\]", "", type_sig.replace(" ", ""))
    m = re.match(r"(\w+)\((.*)\)$", s)
    ret, argstr = m.group(1), m.group(2)
    args = [a for a in argstr.split(",") if a]
    chars = "".join(_NUMBA_CHAR[a] for a in args)
    if ret != "void":
        chars = chars + "->" + _NUMBA_CHAR[ret]
    return chars


def _parse_signature(sig: str):
    """numba.np.ufunc.sigparse.parse_signature replacement."""
    sig = sig.replace(" ", "")

    def side(s):
        return [tuple(d for d in g.split(",") if d) for g in re.findall(r"\((.*?)\)", s)]

    if "->" in sig:
        a, b = sig.split("->")
        return side(a), side(b)
    return side(sig), []


class _PyVectorize:
    """Pure-Python stand-in for a numba ``@vectorize`` ufunc.

    Loops the scalar kernel body over the broadcast shape. Output dtype
    follows the reference type signatures, all of which are ``t(t, ...)``
    (first argument's dtype).
    """

    def __init__(self, fun, type_sigs):
        self.ufunc = fun
        self.__wrapped__ = fun
        self.__name__ = fun.__name__
        self.__doc__ = fun.__doc__
        s = type_sigs[0].replace(" ", "")
        m = re.match(r"(\w+)\((.*)\)$", s)
        self.nin = len([a for a in m.group(2).split(",") if a])
        self.nout = 1
        self.nargs = self.nin + self.nout
        self.signature = None
        self.types = [_sig_chars(t) for t in type_sigs]

    def _ret_dtype(self, ins):
        """Return dtype from the matching type signature (e.g. 'DI->d')."""
        in_chars = "".join(np.dtype(a.dtype).char for a in ins)
        fallback = None
        for t in self.types:
            if "->" not in t:
                continue
            lhs, ret = t.split("->")
            if fallback is None:
                fallback = ret
            if lhs == in_chars:
                return np.dtype(ret)
        return np.dtype(fallback) if fallback else ins[0].dtype

    def __call__(self, *args, out=None):
        if out is None and len(args) > self.nin:
            out = args[self.nin]
        ins = [np.asarray(a) for a in args[: self.nin]]
        bshape = np.broadcast_shapes(*[a.shape for a in ins])
        if out is None:
            out = np.empty(bshape, dtype=self._ret_dtype(ins))
        bc = [np.broadcast_to(a, bshape) for a in ins]
        for idx in np.ndindex(*bshape):
            out[idx] = self.ufunc(*(b[idx] for b in bc))
        return out


class _AutoOutGUFunc:
    """Delegating wrapper that adds numba's output auto-allocation.

    A real numba gufunc called with only its inputs allocates and *returns*
    the outputs — the reference relies on this internally (optimize.py:32
    ``Model.__call__`` calls ``pole_zero(y, *args)`` with no output array).
    The reference's GUFuncWrapper asserts the full argument count, so this
    wrapper allocates missing outputs from the signature and returns them.
    """

    def __init__(self, w):
        self._w = w

    def __getattr__(self, name):
        return getattr(self._w, name)

    def __call__(self, *args):
        w = self._w
        if len(args) == w.nin and w.nout > 0:
            ins = [np.asarray(a) for a in args]
            sizes = {}
            bshapes = []
            for a, d in zip(ins, w.in_dims):
                nd = len(d)
                bshapes.append(a.shape[: a.ndim - nd])
                for k, s in zip(d, a.shape[a.ndim - nd:]):
                    sizes.setdefault(k, s)
            bshape = np.broadcast_shapes(*bshapes)
            dt = next(
                (a.dtype for a in ins if a.dtype.kind == "f"), np.float64
            )
            outs = [
                np.full(
                    bshape + tuple(sizes[k] for k in d),
                    np.nan,
                    dtype=dt,
                )
                for d in w.out_dims
            ]
            w(*args, *outs)
            return outs[0] if len(outs) == 1 else tuple(outs)
        return w(*args)


def _guvectorize(type_sigs, signature=None, **_kwargs):
    # numba also allows @guvectorize(signature_only) forms; the reference
    # always passes (types, signature).
    def deco(fun):
        gufunc_wrapper = sys.modules["refdsp.utils"].GUFuncWrapper
        w = gufunc_wrapper(
            fun,
            signature,
            [_sig_chars(t) for t in type_sigs],
            copy_out=False,
        )
        w.__wrapped__ = fun
        return _AutoOutGUFunc(w)

    return deco


def _vectorize(type_sigs, **_kwargs):
    return lambda fun: _PyVectorize(fun, type_sigs)


def _install_stub_modules():
    if "refdsp" in sys.modules:
        return

    # --- numba ---
    numba = types.ModuleType("numba")
    numba.guvectorize = _guvectorize
    numba.vectorize = _vectorize
    numba.njit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    numba.jit = numba.njit
    numba.prange = range
    numba_np = types.ModuleType("numba.np")
    numba_ufunc = types.ModuleType("numba.np.ufunc")
    sigparse = types.ModuleType("numba.np.ufunc.sigparse")
    sigparse.parse_signature = _parse_signature
    numba_ufunc.sigparse = sigparse
    numba_np.ufunc = numba_ufunc
    numba.np = numba_np
    sys.modules["numba"] = numba
    sys.modules["numba.np"] = numba_np
    sys.modules["numba.np.ufunc"] = numba_ufunc
    sys.modules["numba.np.ufunc.sigparse"] = sigparse

    # --- pint (iir_filter.py:8 isinstance checks only) ---
    if "pint" not in sys.modules:
        pint = types.ModuleType("pint")

        class Quantity:  # minimal: parity tests pass plain floats
            pass

        pint.Quantity = Quantity
        sys.modules["pint"] = pint

    # --- pywt (dwt.py) — independent even-length haar/db1 downcoef ---
    if "pywt" not in sys.modules:
        pywt = types.ModuleType("pywt")

        def downcoef(part, data, wavelet, level=1):
            if wavelet not in ("haar", "db1"):
                raise NotImplementedError(wavelet)
            x = np.asarray(data, dtype=np.float64)
            s = 1.0 / np.sqrt(2.0)
            for lv in range(level):
                if len(x) % 2:
                    raise NotImplementedError(
                        "stub downcoef supports even lengths only"
                    )
                ev, od = x[0::2], x[1::2]
                if lv == level - 1 and part == "d":
                    x = (ev - od) * s
                else:
                    x = (ev + od) * s
            return x

        pywt.downcoef = downcoef
        sys.modules["pywt"] = pywt

    # --- iminuit (optimize.py) — scipy-based migrad stand-in ---
    if "iminuit" not in sys.modules:
        iminuit = types.ModuleType("iminuit")

        class Minuit:
            """Tiny migrad stand-in: Nelder-Mead on the same objective.

            Supports the surface used by the reference's ``optimize.py``:
            ``Minuit.LEAST_SQUARES``, ``.errordef``, ``.limits``,
            ``.simplex().migrad()``, ``.values[i]``.
            """

            LEAST_SQUARES = 1.0

            def __init__(self, model, *args):
                self._model = model
                # iminuit array-parameter mode: Minuit(model, [p0, p1, ...])
                # passes the whole array to model(args)
                if len(args) == 1 and isinstance(args[0], (list, tuple, np.ndarray)):
                    self._array_mode = True
                    self.values = list(map(float, args[0]))
                else:
                    self._array_mode = False
                    self.values = list(map(float, args))
                self.errordef = 1.0
                self.limits = None
                self.print_level = 0
                self.strategy = 1

            def simplex(self):
                return self

            def migrad(self):
                from scipy.optimize import minimize

                if self._array_mode:
                    fun = lambda p: float(self._model(np.asarray(p)))  # noqa: E731
                else:
                    fun = lambda p: float(self._model(*p))  # noqa: E731
                res = minimize(
                    fun,
                    self.values,
                    method="Nelder-Mead",
                    bounds=self.limits,
                    options={"xatol": 1e-10, "fatol": 1e-14, "maxiter": 4000},
                )
                self.values = list(res.x)
                return self

        iminuit.Minuit = Minuit
        sys.modules["iminuit"] = iminuit

    # --- lh5 (wiener_filter.py) — redirectable read hook ---
    if "lh5" not in sys.modules:
        lh5 = types.ModuleType("lh5")

        def read(name, fname):
            from dspeed_tpu.lh5 import read as _read

            return _read(name, fname)

        class LH5Store:
            """Surface used by the reference's wiener_filter factory
            (wiener_filter.py:43-70): gimme_file + read returning (obj, n)
            where obj has ``.nda``."""

            def gimme_file(self, fname, mode="r"):
                import h5py

                return h5py.File(fname, mode)

            def read(self, name, fname):
                obj = read(name, fname)
                nda = getattr(obj, "nda", None)
                if nda is None:
                    obj = types.SimpleNamespace(nda=np.asarray(obj))
                return obj, len(obj.nda)

        lh5.read = read
        lh5.LH5Store = LH5Store
        sys.modules["lh5"] = lh5

    # --- synthetic refdsp package ---
    pkg = types.ModuleType("refdsp")
    pkg.__path__ = [REF_ROOT]
    sys.modules["refdsp"] = pkg

    for name in ("errors", "utils"):
        spec = importlib.util.spec_from_file_location(
            f"refdsp.{name}", f"{REF_ROOT}/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refdsp.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)

    # a handful of reference modules use absolute `from dspeed.utils import`
    # (fft.py:8, gaussian_filter1d.py:43, inl/wf_correction/wf_alignment,
    # get_wf_centroid) — alias them; the real dspeed package is not installed
    sys.modules.setdefault("dspeed", pkg)
    sys.modules.setdefault("dspeed.utils", sys.modules["refdsp.utils"])
    sys.modules.setdefault("dspeed.errors", sys.modules["refdsp.errors"])

    # minimal processing_chain stand-in (iir_filter.py:11 imports ProcChainVar
    # for an isinstance check; parity tests pass plain floats)
    pc = types.ModuleType("refdsp.processing_chain")

    class ProcChainVar:
        pass

    pc.ProcChainVar = ProcChainVar
    sys.modules["refdsp.processing_chain"] = pc
    pkg.processing_chain = pc

    spec = importlib.util.spec_from_file_location(
        "refdsp.processors",
        f"{REF_ROOT}/processors/__init__.py",
        submodule_search_locations=[f"{REF_ROOT}/processors"],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refdsp.processors"] = mod
    spec.loader.exec_module(mod)
    pkg.processors = mod


def load_ref_processors():
    """Install stubs (once) and return the reference processors module."""
    _install_stub_modules()
    return sys.modules["refdsp.processors"]


def ref_kernel(name: str):
    """Fetch a reference kernel (lazy registry) by public name."""
    return getattr(load_ref_processors(), name)


def ref_module(mod_name: str):
    """Import a reference processors submodule (for non-registry kernels,
    e.g. ``unit_conversion.convert`` or ``fft.abs2norm``)."""
    load_ref_processors()
    return importlib.import_module(f".{mod_name}", "refdsp.processors")


def ref_errors():
    load_ref_processors()
    return sys.modules["refdsp.errors"]


def _fix_key(k):
    """Normalize integral-float indices/slice bounds to ints (numba's weak
    typing allows ``w_out[a : b]`` with float ``a``/``b``; pure Python does
    not — e.g. interpolating_upsampler mode 'i', upsampler.py:120)."""

    def f(v):
        if isinstance(v, (float, np.floating)) and float(v).is_integer():
            return int(v)
        return v

    if isinstance(k, slice):
        return slice(f(k.start), f(k.stop), f(k.step))
    return f(k)


class _WeakView(np.ndarray):
    """Array view reproducing numba's weak indexing for reference bodies.

    ``_ignore_oob`` additionally swallows out-of-bounds single-element
    writes: numba compiles with boundscheck off, so a body that writes one
    element past the end (interpolating_upsampler mode 's',
    upsampler.py:201-207 starts at ``i_last = len(w_out)``) silently scribbles
    outside the buffer instead of raising; the in-bounds results are what the
    reference actually produces.
    """

    _ignore_oob = False

    def __array_finalize__(self, obj):
        if obj is not None:
            self._ignore_oob = getattr(obj, "_ignore_oob", False)

    def __getitem__(self, k):
        return super().__getitem__(_fix_key(k))

    def __setitem__(self, k, v):
        k = _fix_key(k)
        if self._ignore_oob and isinstance(k, (int, np.integer)):
            n = self.shape[0]
            if k >= n or k < -n:
                return
        super().__setitem__(k, v)


class _IntishView(_WeakView):
    """Float array view whose integral elements read back as Python ints.

    Some reference bodies store a count into a float output slot and then use
    it as a ``range`` bound (presum.py:57) — legal under numba's weak typing,
    a TypeError in pure Python. Reading integral values back as ints lets the
    unmodified body run; NaN sentinels still read as floats.
    """

    def __getitem__(self, k):
        v = super().__getitem__(k)
        if np.ndim(v) == 0 and isinstance(v, np.floating) and np.isfinite(v):
            f = float(v)
            if f.is_integer():
                return int(f)
        return v


def call_ref(
    func,
    *inputs,
    dims: dict | None = None,
    out_dtypes=None,
    out_args: int = 0,
    out_idx: tuple | None = None,
    wrap1: tuple = (),
    int_args: tuple = (),
    intish_outs: tuple = (),
    loose_outs: tuple = (),
    batched_call: bool = False,
):
    """Call a reference gufunc oracle, allocating outputs from its signature.

    Loops the batch axis here (one unbatched GUFuncWrapper call per event),
    which is exactly how the reference's own tests drive these kernels —
    several reference bodies only work that way (scalar args indexed ``[0]``,
    no-arrow signatures with caller-allocated outputs).

    - ``dims``: sizes for core dims not derivable from inputs (windower's m).
    - ``out_args``: treat the LAST k signature entries as outputs to allocate
      and return (no-arrow signatures like presum's ``(n),(),(),(m)``).
    - ``out_idx``: explicit signature positions of caller-allocated outputs
      (histogram_stats puts them mid-signature); overrides ``out_args``.
      ``wrap1``/``int_args`` indices then refer to positions among the true
      inputs after removing those slots.
    - ``wrap1``: input indices passed per-row as 1-element arrays (bodies that
      index scalars, e.g. ``a_min[0]`` in min_max_norm).
    - ``int_args``: input indices coerced to Python int per row (bodies that
      ``range(n_in)``).
    - ``out_dtypes``: per-allocated-output dtype override; default is the
      broadcast float dtype of the array inputs.
    """
    if isinstance(func, str):
        func = ref_kernel(func)
    ins = [np.asarray(a) for a in inputs]

    if func.signature is None:  # @vectorize kernel
        return (func(*ins),)

    in_dims_all = list(func.in_dims)
    nslots = len(in_dims_all)
    if out_idx is None:
        out_idx = tuple(range(nslots - out_args, nslots))
    else:
        out_idx = tuple(out_idx)
    in_pos = [i for i in range(nslots) if i not in out_idx]
    nin = len(in_pos)
    if len(ins) != nin:
        raise ValueError(f"{func.__name__}: expected {nin} inputs, got {len(ins)}")
    in_dims = [in_dims_all[i] for i in in_pos]
    alloc_dims = [in_dims_all[i] for i in out_idx] + list(func.out_dims)

    sizes = dict(dims or {})
    batch_shapes = []
    for a, d in zip(ins, in_dims):
        nd = len(d)
        batch_shapes.append(a.shape[: a.ndim - nd])
        for k, s in zip(d, a.shape[a.ndim - nd:]):
            sizes.setdefault(k, s)
    bshape = np.broadcast_shapes(*batch_shapes)

    float_ins = [a for a in ins if a.dtype.kind == "f"]
    default_dt = np.result_type(*float_ins) if float_ins else np.float64
    out_dts = []
    outs = []
    for i, d in enumerate(alloc_dims):
        dt = default_dt
        if out_dtypes is not None:
            dt = out_dtypes[i] if not isinstance(out_dtypes, (str, np.dtype, type)) else out_dtypes
        out_dts.append(np.dtype(dt))
        core = tuple(sizes[k] for k in d)
        outs.append(np.full(bshape + core, np.nan if np.dtype(dt).kind == "f" else 0, dtype=dt))

    bins = [
        np.broadcast_to(a, bshape + tuple(sizes[k] for k in d))
        for a, d in zip(ins, in_dims)
    ]
    if batched_call:
        # vectorized=True wrappers whose body needs the whole batch at once
        # (tf_model's keras call requires a batch dimension)
        func(*(np.array(b) for b in bins), *outs)
        return tuple(outs)
    for idx in np.ndindex(*bshape):
        call_args = []
        for j, (a, d) in enumerate(zip(bins, in_dims)):
            v = a[idx]
            if d:
                # broadcast views are read-only; some reference bodies mutate
                # their inputs in place (fft_convolve_wf zeroes NaN rows)
                v = np.array(v)
            if not d:
                if j in int_args:
                    v = int(v)
                elif j in wrap1:
                    v = np.array([v])
            call_args.append(v)
        tmp_outs = []
        for i, (d, dt) in enumerate(zip(alloc_dims, out_dts)):
            core = tuple(sizes[k] for k in d)
            t = np.full(core if core else (1,), np.nan if dt.kind == "f" else 0, dtype=dt)
            t = t.view(_IntishView if i in intish_outs else _WeakView)
            if i in loose_outs:
                t._ignore_oob = True
            tmp_outs.append(t)
        slot_args = [None] * nslots
        for p, v in zip(in_pos, call_args):
            slot_args[p] = v
        for p, t in zip(out_idx, tmp_outs):
            slot_args[p] = t
        func(*slot_args, *tmp_outs[len(out_idx):])
        for o, t, d in zip(outs, tmp_outs, alloc_dims):
            o[idx] = t if d else t[0]
    return tuple(outs)
