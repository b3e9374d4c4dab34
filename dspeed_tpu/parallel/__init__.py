"""Mesh / sharding utilities for multi-chip execution."""

from .bulk import build_dsp_stacked
from .conv import sp_convolve_same, sp_convolve_same_traced
from .mesh import make_mesh, shard_chain

__all__ = [
    "build_dsp_stacked",
    "make_mesh",
    "shard_chain",
    "sp_convolve_same",
    "sp_convolve_same_traced",
]
