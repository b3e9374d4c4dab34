"""Sample-axis (sequence-parallel) convolution with halo exchange.

The reference handles long CUSP/ZAC kernels with single-host FFT convolution
(``convolutions.py:81``); SURVEY.md §5 marks this as the one place the TPU
build needs collectives: when a waveform's *sample* axis is sharded over the
mesh, block boundaries must exchange halos. This module implements
overlap-save 'same'-mode convolution under ``shard_map``: each shard pulls
``m-1`` halo samples from each neighbor with ``jax.lax.ppermute`` (one ICI
hop), convolves its extended block locally, and keeps the valid center —
the collective pattern scales to waveforms larger than one chip's memory.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["sp_convolve_same"]


def _shard_map_fn():
    fn = getattr(jax, "shard_map", None)
    if fn is not None:
        return fn
    from jax.experimental.shard_map import shard_map  # noqa: PLC0415

    return shard_map


def _local_conv_full(x, taps):
    m = taps.shape[-1]
    lhs = x.reshape(-1, 1, x.shape[-1])
    rhs = taps[::-1].reshape(1, 1, m).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        lhs, rhs, (1,), [(m - 1, m - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(*x.shape[:-1], x.shape[-1] + m - 1)


def sp_convolve_same_traced(
    w, taps, mesh: Mesh, axis: str = "sp", batch_axes: tuple = ()
):
    """Traced core of :func:`sp_convolve_same`: usable inside an outer
    ``jit`` (no ``device_put``; GSPMD reshards the operand into the
    ``shard_map`` as needed). ``batch_axes`` optionally lays the leading
    batch dims over mesh axes (e.g. ``("data",)`` in a chain whose events
    are data-parallel while samples are sequence-parallel)."""
    n = w.shape[-1]
    m = int(taps.shape[-1])
    nshards = mesh.shape[axis]
    if n % nshards:
        raise ValueError(f"sample axis {n} must divide into {nshards} shards")
    local = n // nshards
    halo = m - 1
    if halo > local:
        raise ValueError("kernel halo larger than one shard")

    def body(w_blk, taps_full):
        ax = jax.lax.axis_index(axis)
        nsh = jax.lax.axis_size(axis)
        # exchange (m-1)-sample halos with both neighbors over ICI
        fwd = [(i, (i + 1) % nsh) for i in range(nsh)]
        bwd = [(i, (i - 1) % nsh) for i in range(nsh)]
        from_left = jax.lax.ppermute(w_blk[..., -halo:], axis, fwd)
        from_right = jax.lax.ppermute(w_blk[..., :halo], axis, bwd)
        # global edges see zeros, not wrap-around
        from_left = jnp.where(ax == 0, 0.0, from_left)
        from_right = jnp.where(ax == nsh - 1, 0.0, from_right)
        ext = jnp.concatenate([from_left, w_blk, from_right], axis=-1)
        full = _local_conv_full(ext, taps_full)
        # full[k] == global_full[s*local - halo + k] wherever the window is
        # inside ext; 'same' global index for local t is s*local + t + lo'
        # with lo' = (m-1)//2, i.e. k = t + lo' + halo
        start = (m - 1) // 2 + halo
        return jax.lax.dynamic_slice_in_dim(full, start, local, axis=-1)

    lead = list(batch_axes[: w.ndim - 1])
    lead += [None] * (w.ndim - 1 - len(lead))
    spec = P(*lead, axis)
    sm = _shard_map_fn()(
        body, mesh=mesh, in_specs=(spec, P(None)), out_specs=spec
    )
    return sm(w, jnp.asarray(taps, w.dtype))


def sp_convolve_same(w, taps, mesh: Mesh, axis: str = "sp"):
    """'same'-mode convolution of ``w (..., n)`` with ``taps (m,)``, the
    sample axis sharded over mesh axis ``axis``.

    Equivalent to ``numpy.convolve(w_row, taps, "same")`` per event; batch
    axes stay replicated here (combine with the chain's ``data`` axis via
    :func:`sp_convolve_same_traced`'s ``batch_axes``).
    """
    w_sharded = jax.device_put(
        w,
        NamedSharding(mesh, P(*([None] * (np.ndim(w) - 1) + [axis]))),
    )
    return sp_convolve_same_traced(w_sharded, taps, mesh, axis)
