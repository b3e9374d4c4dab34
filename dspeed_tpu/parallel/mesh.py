"""Mesh construction helpers.

The chain's scaling axes are *events* (data parallel) and *detector
channels* — the reference's actual scaling dimensions (SURVEY.md §5: one
numba process per channel table, fanned out by batch systems). A third
``sp`` axis shards the sample dimension for long-convolution halo exchange
(see :mod:`.conv`).
"""

from __future__ import annotations

import numpy as np


def make_mesh(shape: dict[str, int] | None = None, devices=None):
    """Build a :class:`jax.sharding.Mesh` with named axes.

    ``shape`` maps axis names to sizes, e.g. ``{"channel": 2, "data": 4}``;
    by default all devices go on a 1-D ``("data",)`` mesh.
    """
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = {"data": len(devices)}
    sizes = list(shape.values())
    n = int(np.prod(sizes))
    return Mesh(np.array(devices[:n]).reshape(sizes), tuple(shape.keys()))


def shard_chain(chain, mesh, batch_axes=("data",)):
    """Shard a :class:`~dspeed_tpu.processing_chain.ProcessingChain` over
    ``mesh`` (events over ``"data"``, stacked channels over ``"channel"``)."""
    chain.set_sharding(mesh, batch_axes=batch_axes)
    return chain


def initialize_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (``jax.distributed.initialize``) for pod
    slices: call once per host before building meshes; afterwards
    ``jax.devices()`` spans the slice and :func:`make_mesh` lays global axes
    over it. Each host streams its own LH5 files (the ``build_dsp`` per-table
    loop), so the only cross-host traffic is whatever a processor introduces
    — none in the standard chains.
    """
    import jax

    jax.distributed.initialize(**kwargs)
