"""Stacked multi-channel bulk production over a device mesh.

The reference processes one channel table at a time in a single process and
leaves cross-channel parallelism to external batch systems (SURVEY.md §5).
On TPU the natural layout is to *stack* channels into the batch: chunks from
``C`` channel tables form ``(C, B, ...)`` arrays laid out over a
``("channel", "data")`` mesh, and the whole stack runs as ONE SPMD dispatch
per chunk — BASELINE.md's multi-channel bulk-production configuration.

Channels must share the DSP config, waveform geometry, and database values
(static parameters specialize the compiled program); heterogeneous channels
fall back to the sequential per-table driver.
"""

from __future__ import annotations

import logging
from typing import Collection, Mapping

import numpy as np

from .. import lh5
from ..lh5 import LH5Iterator, LH5Store
from ..processing_chain import build_processing_chain

log = logging.getLogger("dspeed_tpu.parallel")

__all__ = ["build_dsp_stacked"]


def _stacked_cache_key(dsp_config, database, outputs, tb_in0):
    """Key into :data:`dspeed_tpu.build_dsp._CHAIN_CACHE` so repeated
    stacked-production calls (same config/db/schema) reuse the traced chain
    — and, through the chain's packed-program cache, the compiled XLA
    program — instead of paying a multi-second retrace per call."""
    import json
    import os

    from ..build_dsp import _schema_fingerprint

    if os.getenv("DSPEED_TPU_CHAIN_CACHE", "1") in ("0", "false"):
        return None
    try:
        if isinstance(dsp_config, (str, os.PathLike)):
            path = os.path.realpath(dsp_config)
            cfg = (path, os.path.getmtime(path))
        else:
            cfg = json.dumps(dsp_config, sort_keys=True, default=str)
        return (
            "stacked",
            cfg,
            json.dumps(database, sort_keys=True, default=str),
            tuple(outputs) if outputs is not None else None,
            _schema_fingerprint(tb_in0),
            len(tb_in0),
        )
    except (TypeError, OSError):
        return None


def build_dsp_stacked(
    raw_in: str,
    dsp_out: str | None,
    dsp_config,
    lh5_tables: Collection[str],
    mesh=None,
    database: Mapping | None = None,
    outputs: Collection[str] | None = None,
    write_mode: str | None = None,
    buffer_len: int = 3200,
    distribute: bool = True,
):
    """Process ``lh5_tables`` (same config/geometry) as stacked channels.

    With ``mesh`` (axes ``("channel", "data")``), the stack is sharded over
    devices; without, it still batches ``C x B`` events per dispatch on one
    chip. Writes ``<table>/dsp`` groups like :func:`~dspeed_tpu.build_dsp`.
    Under multi-host JAX each host takes a round-robin share of the channel
    stack and writes its own ``.p<idx>``-suffixed file (see
    :func:`dspeed_tpu.build_dsp.host_partition`).
    """
    import jax

    from ..build_dsp import _CHAIN_CACHE, _CHAIN_CACHE_MAX, per_host_out_path

    lh5_tables = list(lh5_tables)
    if distribute and jax.process_count() > 1:
        pc, pi = jax.process_count(), jax.process_index()
        lh5_tables = lh5_tables[pi::pc]
        log.info("host %d/%d: stacking %d channels", pi, pc, len(lh5_tables))
        if not lh5_tables:
            # more hosts than channels: this host has nothing to do
            log.info("host %d/%d: no channels assigned", pi, pc)
            return lh5.Struct() if dsp_out is None else None
        if isinstance(dsp_out, str):
            dsp_out = per_host_out_path(dsp_out, pi)
    n_chan = len(lh5_tables)
    iterators = [
        LH5Iterator(raw_in, tb, buffer_len=buffer_len) for tb in lh5_tables
    ]
    n_rows = min(len(it) for it in iterators)
    if any(len(it) != n_rows for it in iterators):
        log.warning("channel tables differ in length; clipping to %d", n_rows)

    tb_in0 = iterators[0].read(0)
    cache_key = _stacked_cache_key(dsp_config, database, outputs, tb_in0)
    cached = _CHAIN_CACHE.get(cache_key) if cache_key is not None else None
    if cached is not None:
        chain, field_mask, tb_out = cached
        _CHAIN_CACHE[cache_key] = _CHAIN_CACHE.pop(cache_key)  # LRU recency
        log.debug("reusing compiled chain for stacked production")
    else:
        chain, field_mask, tb_out = build_processing_chain(
            dsp_config, tb_in0, db_dict=database, outputs=outputs
        )
        if cache_key is not None:
            _CHAIN_CACHE[cache_key] = (chain, field_mask, tb_out)
            while len(_CHAIN_CACHE) > _CHAIN_CACHE_MAX:
                _CHAIN_CACHE.pop(next(iter(_CHAIN_CACHE)))
    for it in iterators:
        it.reset_field_mask(field_mask)
    if mesh is not None:
        chain.set_sharding(mesh, batch_axes=("channel", "data"))

    store = LH5Store(keep_open=True) if dsp_out else None
    results_struct = lh5.Struct() if dsp_out is None else None
    # per-channel output tables share the compiled chain's schema; the
    # chain's output managers rebind to each channel's buffers per write
    import copy

    tb_outs = [copy.deepcopy(tb_out) for _ in range(n_chan)]

    def _write_chunk(pending, i, n):
        """Fetch chunk ``(i, n)`` from the device and write every channel —
        runs on the single writer thread so the (blocking) D2H transfer and
        the LH5 writes overlap the next chunk's read + dispatch. Only this
        thread touches the output managers / tb_outs / store.

        ``pending`` is a packed-program handle: one 2-D array per output
        dtype (a D2H copy costs a full round trip on remote backends, so
        the 30+ output columns come back in ~3 transfers, not 30+)."""
        packed, plan, scalars = pending
        out: dict[str, np.ndarray] = {}
        for dt, grp in plan.items():
            host = np.asarray(packed[dt])
            for k, c0, c1, inner in grp:
                col = host[:, c0:c1]
                out[k] = col.reshape(host.shape[0], *inner) if inner else col[:, 0]
        for k in scalars:
            out[k] = np.asarray(packed["__scalars__"][k])
        batched = {k for grp in plan.values() for (k, _, _, _) in grp}
        for ci, tb in enumerate(lh5_tables):
            res_ci = {k: v[ci] if k in batched else v for k, v in out.items()}
            for varname, man in chain._output_managers.items():
                man.set_buffer(tb_outs[ci][varname])
                man.write(res_ci, 0, n)
            dsp_name = tb.replace("raw", "dsp")
            if store is not None:
                view = tb_outs[ci][0:n] if n != len(tb_outs[ci]) else tb_outs[ci]
                store.write(
                    obj=view,
                    name=dsp_name,
                    lh5_file=dsp_out,
                    wo_mode="o" if write_mode == "u" else "a",
                    write_start=i,
                )
            else:
                groups = [g for g in dsp_name.split("/") if g]
                node = results_struct
                for g in groups[:-1]:
                    node = node.setdefault(g, lh5.Struct())
                if groups[-1] not in node:
                    import copy as _copy

                    empty = _copy.deepcopy(tb_outs[ci])
                    empty.resize(0)
                    node[groups[-1]] = empty
                node[groups[-1]].append(
                    tb_outs[ci][0:n] if n != len(tb_outs[ci]) else tb_outs[ci]
                )

    from concurrent.futures import ThreadPoolExecutor

    i = 0
    writer = ThreadPoolExecutor(1)
    prev_job = None
    try:
        while i < n_rows:
            n = min(buffer_len, n_rows - i)
            # gather each channel's chunk through the chain's input managers
            stacked: dict[str, np.ndarray] = {}
            for ci, it in enumerate(iterators):
                tb_in = it.read(i, n)
                for varname in list(chain._input_managers):
                    chain.link_input_buffer(varname, tb_in[varname])
                inputs, n_av = chain._gather_inputs(0, n)
                n = min(n, n_av)
                for k, v in inputs.items():
                    stacked.setdefault(k, []).append(v)
            # pad the data axis (axis 0 per channel, axis 1 stacked) to the
            # nominal chunk length so every chunk reuses one compiled shape
            pad_to = chain._pad_to(n)
            if n < pad_to:
                stacked = {
                    k: [
                        np.pad(a[:n], [(0, pad_to - n)] + [(0, 0)] * (a.ndim - 1))
                        for a in v
                    ]
                    for k, v in stacked.items()
                }
            arrs = {k: np.stack(v) for k, v in stacked.items()}
            dev = chain._shard_inputs(arrs)
            if mesh is None:
                # start the async H2D copy explicitly (no mesh = passthrough)
                dev = {k: jax.device_put(v) for k, v in dev.items()}
            fn, plan, scalars = chain._get_packed(arrs)
            # async dispatch: the device computes chunk i while the writer
            # thread is still fetching/writing chunk i-1
            packed = fn(dev)
            if prev_job is not None:
                prev_job.result()  # bound in-flight chunks to two
            prev_job = writer.submit(_write_chunk, (packed, plan, scalars), i, n)
            i += n
        if prev_job is not None:
            prev_job.result()
    finally:
        writer.shutdown(wait=True)

    for it in iterators:
        it.close()
    if store is not None:
        store.close()
        return None
    return results_struct
