"""User-facing utilities, mirroring the reference's ``dspeed/utils.py``.

- :class:`GUFuncWrapper` / :func:`dspeed_guvectorize` let users wrap an
  arbitrary (batched JAX) callable as a chain processor with gufunc-style
  metadata (reference ``utils.py:12-171``). In this build they are thin
  aliases over :class:`~dspeed_tpu.processors.Kernel`.
- :class:`TpuDefaults` reads global flags from the environment, the analog
  of the reference's ``NumbaDefaults`` (``utils.py:187-248``):
  ``DSPEED_TPU_ACCUM`` selects the accumulation policy (``auto``/``f64``/
  ``ds``/``f32``, see :mod:`dspeed_tpu.config`), ``DSPEED_TPU_X64`` enables
  ``jax_enable_x64``, and ``DSPEED_TPU_DEBUG_NANS`` turns on
  ``jax_debug_nans`` (the closest analog of numba's ``boundscheck``).
- :class:`ProcChainVarBase` is the ABC processors can use to type-check
  chain variables without importing the engine (reference ``utils.py:251``).
"""

from __future__ import annotations

import os
from typing import Callable, Collection

from .processors import Kernel

__all__ = [
    "GUFuncWrapper",
    "dspeed_guvectorize",
    "TpuDefaults",
    "tpu_defaults",
    "ProcChainVarBase",
]


class GUFuncWrapper(Kernel):
    """Make any batched-JAX callable look like a chain processor.

    Accepts the reference's keyword surface (``vectorized``/``copy_out`` are
    meaningless here — every kernel is traced and functional — and are
    accepted for compatibility).
    """

    def __init__(
        self,
        func: Callable,
        signature: str,
        types: str | Collection[str],
        name: str | None = None,
        vectorized: bool = True,  # noqa: ARG002 - API parity
        copy_out: bool = True,  # noqa: ARG002 - API parity
        doc_string: str | None = None,
        **kwargs,
    ) -> None:
        super().__init__(
            func, signature, types, name=name, doc=doc_string, **kwargs
        )


def dspeed_guvectorize(signature: str, types, **kwargs):
    """Decorator form of :class:`GUFuncWrapper`
    (reference ``utils.py:166-171``)."""

    def wrap(func):
        return GUFuncWrapper(func, signature, types, **kwargs)

    return wrap


class TpuDefaults:
    """Global flags from the environment (the ``NumbaDefaults`` analog)."""

    def __init__(self) -> None:
        self.accumulation = os.getenv("DSPEED_TPU_ACCUM", "auto")
        self.enable_x64 = os.getenv("DSPEED_TPU_X64", "0") not in ("0", "", "false")
        self.debug_nans = os.getenv("DSPEED_TPU_DEBUG_NANS", "0") not in (
            "0", "", "false",
        )

    def apply(self) -> None:
        import jax

        from . import config

        config.accumulation = self.accumulation
        if self.enable_x64:
            jax.config.update("jax_enable_x64", True)
        if self.debug_nans:
            jax.config.update("jax_debug_nans", True)


tpu_defaults = TpuDefaults()


class ProcChainVarBase:
    """ABC so processors can type-check chain variables without importing
    the engine; :class:`~dspeed_tpu.processing_chain.ProcChainVar` is the
    (duck-typed) implementation."""

    __slots__ = ()
