"""Mesh / sharding utilities for multi-chip execution."""

from .mesh import make_mesh, shard_chain
from .conv import sp_convolve_same

__all__ = ["make_mesh", "shard_chain", "sp_convolve_same"]
