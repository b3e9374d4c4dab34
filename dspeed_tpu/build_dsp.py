"""Bulk-production driver: raw-tier LH5 in, dsp-tier LH5 out.

Mirrors the reference driver's surface and behavior (``dspeed/build_dsp.py:
27-452``): filename / Table / LH5Iterator inputs, wildcard table discovery
with nested ``raw`` groups, per-channel ``chan_config`` matching (first
``fnmatch`` wins), per-channel database slices, "friend" aux-input tables
with ``db.*`` overrides, chunked streaming through the compiled chain, block
writes with ``write_start``, write modes ``None``/``'r'``/``'a'``/``'u'``,
and an in-memory ``Struct`` return when ``dsp_out`` is ``None``.

TPU difference: each chunk is one jitted device dispatch (events-batched),
so ``buffer_len`` is the device batch size — thousands of waveforms per
dispatch rather than the reference's 16-event numba blocks.
"""

from __future__ import annotations

import logging
import os
import re
import time
from copy import deepcopy
from fnmatch import fnmatch
from typing import Collection, Mapping, MutableMapping  # noqa: UP035

from . import lh5
from .errors import DSPFatal, ProcessingChainError
from .lh5 import LGDO, LH5Iterator, LH5Store, Struct, Table
from .processing_chain import build_processing_chain

log = logging.getLogger("dspeed_tpu")

__all__ = ["build_dsp", "host_partition", "per_host_out_path"]


def per_host_out_path(dsp_out: str, pi: int) -> str:
    """Per-host output file name: substitute a ``{process}`` placeholder, or
    insert a ``.p<idx>`` suffix before the extension."""
    if "{process}" in dsp_out:
        return dsp_out.format(process=pi)
    root, ext = os.path.splitext(dsp_out)
    return f"{root}.p{pi}{ext}"


def host_partition(
    lh5_tables, i_start, n_entries, entry_list, entry_mask,
    total_rows_fn, pc: int, pi: int,
):
    """Partition bulk-production work across ``pc`` hosts for host ``pi``.

    Multiple channel tables go round-robin (the TPU-pod analog of the
    reference's one-numba-process-per-channel batch fan-out, reference
    ``build_dsp.py:238`` per-table loop + external scheduler); a single
    table splits its entry range contiguously. ``total_rows_fn(tb)`` is
    called only when the range must be derived from the file.
    Returns ``(lh5_tables, i_start, n_entries, entry_list, entry_mask)``.
    """
    import numpy as np

    if pc <= 1:
        return lh5_tables, i_start, n_entries, entry_list, entry_mask
    if len(lh5_tables) > 1:
        mine = list(lh5_tables)[pi::pc]
        log.info(
            "host %d/%d: processing %d of %d tables", pi, pc, len(mine),
            len(lh5_tables),
        )
        return mine, i_start, n_entries, entry_list, entry_mask
    if entry_mask is not None:
        entry_list = np.flatnonzero(np.asarray(entry_mask))
        entry_mask = None
    if entry_list is not None:
        chunk = np.array_split(np.asarray(entry_list), pc)[pi]
        return lh5_tables, i_start, n_entries, chunk, None
    total = n_entries
    if total is None:
        total = max(0, int(total_rows_fn(lh5_tables[0])) - i_start)
    base, rem = divmod(total, pc)
    my_n = base + (1 if pi < rem else 0)
    my_start = i_start + pi * base + min(pi, rem)
    log.info(
        "host %d/%d: entries [%d, %d) of %d", pi, pc, my_start,
        my_start + my_n, total,
    )
    return lh5_tables, my_start, my_n, entry_list, entry_mask

# process-wide compiled-chain cache: repeated build_dsp calls with the same
# (config, db, input schema) reuse the traced+compiled chain instead of
# paying multi-second retrace per file (DSPEED_TPU_CHAIN_CACHE=0 disables).
# LRU-bounded: long-lived sessions sweeping many configs/schemas must not
# accumulate every compiled chain forever
_CHAIN_CACHE: dict = {}
_CHAIN_CACHE_MAX = int(os.getenv("DSPEED_TPU_CHAIN_CACHE_MAX", "16"))


def _schema_fingerprint(tb) -> tuple:
    import json as _json

    fp = []
    for name, col in tb.items():
        entry = (name, type(col).__name__)
        if isinstance(col, Table):
            entry += (_schema_fingerprint(col),)
        elif hasattr(col, "nda"):
            entry += (str(col.dtype), col.nda.shape[1:],
                      _json.dumps(col.attrs, sort_keys=True, default=str))
        elif hasattr(col, "flattened_data"):
            entry += (str(col.dtype),)
        fp.append(entry)
    return tuple(fp)


def _chain_cache_key(processors, db_dict, outputs, tb_in):
    import json as _json

    if os.getenv("DSPEED_TPU_CHAIN_CACHE", "1") in ("0", "false"):
        return None
    try:
        return (
            _json.dumps(processors, sort_keys=True, default=str),
            _json.dumps(db_dict, sort_keys=True, default=str),
            tuple(outputs) if outputs is not None else None,
            _schema_fingerprint(tb_in),
            # chunk length: a cached chain's output buffers are sized for
            # it, so a longer first chunk must not reuse a shorter build
            len(tb_in),
        )
    except TypeError:
        return None

_DB_PARSER = re.compile(r"(?![^\w_.])db\.[\w_.]+")


def _prefetched(iterable, chain=None):
    """Iterate with one chunk of read-ahead on a worker thread, overlapping
    host HDF5 reads with device execution (the TPU-side replacement for the
    reference's synchronous block loop).

    With ``chain``, the worker also gathers + starts the host->device
    upload of each chunk (:meth:`ProcessingChain.stage_inputs`), so chunk
    ``i+1``'s transfer — often the dominant production cost — overlaps
    chunk ``i``'s execution, fetch and write. Yields ``(tb, staged)``.
    """
    from concurrent.futures import ThreadPoolExecutor

    it = iter(iterable)
    sentinel = object()

    def fetch():
        tb = next(it, sentinel)
        if tb is sentinel:
            return tb
        # capture the chunk's entry offset on the worker: by the time the
        # consumer sees this chunk, read-ahead has already advanced the
        # iterator's current_i_entry to the next one
        i_entry = getattr(iterable, "current_i_entry", 0)
        staged = chain.stage_inputs(tb) if chain is not None else None
        return (tb, staged, i_entry)

    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(fetch)
        while True:
            item = fut.result()
            if item is sentinel:
                return
            fut = ex.submit(fetch)
            yield item


def _load_mapping(obj, what: str):
    if isinstance(obj, str):
        with open(os.path.expandvars(os.path.expanduser(obj))) as f:
            text = f.read()
        try:
            import json

            return json.loads(text)
        except ValueError:
            import yaml

            return yaml.safe_load(text)
    return obj


def _db_lookup(token: str, db_dict, what: str):
    try:
        node = db_dict
        for key in token.split(".")[1:]:
            node = node[key]
        log.debug("database lookup: found %s for %s", node, token)
        return node
    except (KeyError, TypeError):
        raise ProcessingChainError(f"did not find {token} in database ({what}).")


def _auto_buffer_len(
    candidates=(1024, 2048, 4096, 8192), default: int = 3200
) -> int:
    """Probe the host<->device transport at a few chunk sizes and return
    the fastest (the reference pins 3200, ``build_dsp.py:40``; on a remote
    accelerator transport the sweet spot drifts session-to-session — a
    stale pin measured 40% off the same-day optimum on v5e). CPU/local
    backends keep the reference default: the probe only measures transfer,
    which local backends don't pay."""
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        return default
    try:
        rng = np.random.default_rng(7)

        @jax.jit
        def trivial(w):
            return w.astype(jnp.float32).sum(axis=1)

        best_n, best_rate = default, 0.0
        for n in candidates:
            payload = rng.integers(
                0, 16000, (n, 4096), dtype=np.uint16
            )
            _ = np.asarray(trivial(payload))  # compile + warm per shape
            t0 = time.perf_counter()
            _ = np.asarray(trivial(payload))
            rate = n / (time.perf_counter() - t0)
            if rate > best_rate:
                best_n, best_rate = n, rate
        log.debug("auto buffer_len picked %d", best_n)
        return best_n
    except Exception:  # probe failure must never block production
        return default


def build_dsp(
    raw_in: str | LGDO,
    dsp_out: str | None = None,
    dsp_config: str | Mapping = None,
    lh5_tables: Collection[str] | str = None,
    base_group: str = None,
    database: str | Mapping = None,
    outputs: Collection[str] = None,
    write_mode: str = None,
    entry_list: Collection[int] = None,
    entry_mask: Collection[bool] = None,
    i_start: int = 0,
    n_entries: int | None = None,
    buffer_len: int | str = 3200,
    block_width: int = 16,
    chan_config: str | Mapping[str, str] = None,
    distribute: bool = True,
    stats: MutableMapping | None = None,
    checked: bool = False,
):
    """Run a DSP recipe over raw waveform data; see the reference docstring
    (``build_dsp.py:27-126``) for parameter semantics, which are preserved.

    ``stats``: optional mutable mapping filled with the run's timing split —
    ``loading_s`` (time blocked on input read-ahead), ``processing_s``
    (dispatch + device compute + D2H fetch), ``write_s`` (output-manager +
    LH5 writes on the writer thread), ``total_s`` and ``rows`` — summed over
    all processed tables. Compute, fetch and write overlap across chunks,
    so the components can legitimately sum past ``total_s``.

    ``buffer_len="auto"``: probe the host<->device transport once and use
    today's fastest chunk size (remote-accelerator transports drift
    session-to-session; see ``_auto_buffer_len``). On CPU backends the
    reference default (3200) is kept.

    ``checked``: data-dependent ``DSPFatal`` parity with the reference.
    Kernels whose reference bodies raise per event on bad data (``get``
    index out of range, non-integral/out-of-range search starts,
    non-integral pick-off indices) emit per-event flag columns; after each
    chunk the flags are scanned host-side and production halts with the
    reference's message, the processor string, and the exact entry in
    ``wf_range`` (reference ``errors.py:10-40``). Off by default: those
    events then follow the chain-wide convention and become NaN. Checks
    apply to the steps as built: a search absorbed into a fused front has
    a structurally valid start (the front computes it in-kernel as an
    argmax/previous-link index, always integral and in range), so the
    checkable conditions that remain after fusion are exactly the ones
    that can still fire; ``DSPEED_TPU_FUSE=0`` checks the literal
    per-processor layout.

    ``distribute`` (default on): under multi-host JAX
    (``jax.distributed.initialize``; ``jax.process_count() > 1``) each host
    takes its own share of the work — channel tables round-robin, or a
    contiguous entry-range slice of a single table — and writes its own
    output file (``dsp_out`` gains a ``.p<idx>`` suffix, or substitute a
    ``{process}`` placeholder). The reference leaves this fan-out to
    external batch systems (one numba process per channel job).
    """
    if buffer_len == "auto":
        buffer_len = _auto_buffer_len()
    if isinstance(lh5_tables, str):
        lh5_tables = [lh5_tables]

    if isinstance(raw_in, (Table, LH5Iterator)):
        base_group = base_group or ""
        lh5_tables = lh5_tables if lh5_tables is not None else [""]
        if len(lh5_tables) > 1:
            raise RuntimeError(
                "in-memory Table/LH5Iterator input allows a single lh5_tables "
                f"entry, got {len(lh5_tables)}"
            )
    elif isinstance(raw_in, str):
        if base_group is None:
            base_group = "raw" if lh5.ls(raw_in, "raw") else ""
        prefix = f"{base_group}/" if base_group else ""
        if lh5_tables is None:
            lh5_tables = lh5.ls(raw_in, f"{prefix}*")
        else:
            lh5_tables = [
                tab for tab_wc in lh5_tables for tab in lh5.ls(raw_in, f"{prefix}{tab_wc}")
            ]
        # a discovered channel group may hold a single nested 'raw' table
        # (e.g. ch024/raw): descend into it; drop names that resolve to
        # nothing in the file
        def _resolve_tb(name: str) -> str | None:
            if lh5.ls(raw_in, f"{name}/*") == [f"{name}/raw"]:
                return f"{name}/raw"
            return name if lh5.ls(raw_in, name) else None

        lh5_tables = [t for t in map(_resolve_tb, lh5_tables) if t]
        if len(lh5_tables) == 0:
            raise RuntimeError(f"could not find any valid LH5 table in {raw_in}")
    else:
        raise RuntimeError(
            f"unsupported raw_in type {type(raw_in).__name__!r}: expected a "
            "file name, Table, or LH5Iterator"
        )

    # ---- multi-host partitioning (BASELINE config 5) ----
    pc, pi = 1, 0
    if distribute:
        try:
            import jax

            pc, pi = jax.process_count(), jax.process_index()
        except Exception:  # backend not initialized yet: single host
            pc, pi = 1, 0
    write_base = 0
    if pc > 1:
        def _total_rows(tb):
            if isinstance(raw_in, str):
                return lh5.read_n_rows(tb or "raw", raw_in)
            return len(raw_in)

        orig_i_start = i_start
        lh5_tables, i_start, n_entries, entry_list, entry_mask = (
            host_partition(
                lh5_tables, i_start, n_entries, entry_list, entry_mask,
                _total_rows, pc, pi,
            )
        )
        # each host writes its own file: positions are local to the host's
        # entry range, not global (a fresh .p<idx> file written at the
        # global offset would carry a zero-filled prefix)
        write_base = i_start - orig_i_start
        if isinstance(dsp_out, str):
            dsp_out = per_host_out_path(dsp_out, pi)

    dsp_config = _load_mapping(dsp_config, "dsp_config")
    chan_config = _load_mapping(chan_config, "chan_config") or {}
    chan_config = {
        chan: _load_mapping(cfg, f"chan_config[{chan}]")
        for chan, cfg in chan_config.items()
    }
    database = _load_mapping(database, "database")
    if database and not isinstance(database, Mapping):
        raise ValueError("input database is not a valid JSON or YAML file or dict")

    if dsp_out is None:
        dsp_st = Struct()
    else:
        if os.path.isfile(dsp_out):
            if write_mode is None:
                raise FileExistsError(
                    f"refusing to touch existing output {dsp_out}; pass "
                    "write_mode='r'/'a'/'u'"
                )
            if write_mode == "r":
                os.remove(dsp_out)
        dsp_st = LH5Store(keep_open=True)

    for tb in lh5_tables:
        # per-channel config selection: first matching chan_config wildcard
        # wins, else the shared dsp_config
        this_config = next(
            (cfg for pat, cfg in chan_config.items() if fnmatch(tb, pat)),
            dsp_config,
        )
        if this_config is None:
            log.info("no config for table %s; skipping", tb)
            continue

        # per-channel database slice (reference :247-253)
        db_dict = database
        if tb not in ("", "raw"):
            chan_name = next(k for k in tb.split("/") if k not in ("", "raw"))
            db_dict = (database or {}).get(chan_name)
            if db_dict is not None:
                log.info("Found database for %s", chan_name)

        # entry selection shared by the main iterator and every friend
        sel_kw = dict(
            entry_list=entry_list, entry_mask=entry_mask,
            i_start=i_start, n_entries=n_entries, buffer_len=buffer_len,
        )
        if isinstance(raw_in, str):
            lh5_in = LH5Iterator(raw_in, tb, **sel_kw)
        else:
            lh5_in = raw_in

        # "friend" aux inputs (reference :271-330)
        config_inputs = this_config.get("inputs", [])
        if isinstance(config_inputs, Mapping):
            config_inputs = [config_inputs]
        for ci in config_inputs:
            file, group = ci["file"], ci["group"]
            prefix_, suffix_ = ci.get("prefix", ""), ci.get("suffix", "")
            if _DB_PARSER.fullmatch(file):
                file = _db_lookup(file, db_dict, "friend file")
            if _DB_PARSER.fullmatch(group):
                group = _db_lookup(group, db_dict, "friend group")
            if isinstance(lh5_in, LH5Iterator):
                lh5_in.add_friend(
                    LH5Iterator(file, group, **sel_kw),
                    prefix=prefix_, suffix=suffix_,
                )
            else:
                lh5_in.join(
                    lh5.read(group, file, n_rows=len(lh5_in)),
                    prefix=prefix_,
                    suffix=suffix_,
                )

        processors = this_config["processors"]
        _outputs = this_config["outputs"] if outputs is None else outputs

        tot_n_rows = len(lh5_in)
        if n_entries is not None:
            tot_n_rows = min(n_entries, tot_n_rows)

        if isinstance(lh5_in, LH5Iterator):
            lh5_it = lh5_in
            lh5_it.n_entries = tot_n_rows
            tb_in = lh5_in.read(0)
        else:
            tb_in = lh5_in[i_start : i_start + tot_n_rows]
            lh5_it = [tb_in]

        log.info("Processing table %s with %d rows", tb, tot_n_rows)
        loading_time = 0.0
        write_time = 0.0
        start = time.time()

        cache_key = _chain_cache_key(processors, db_dict, _outputs, tb_in)
        cached = _CHAIN_CACHE.get(cache_key) if cache_key is not None else None
        if cached is not None:
            proc_chain, field_mask, tb_out = cached
            # move-to-end: insertion order doubles as LRU recency
            _CHAIN_CACHE[cache_key] = _CHAIN_CACHE.pop(cache_key)
            if proc_chain._checked != checked:  # cache is mode-agnostic
                proc_chain.set_checked(checked)
            log.debug("reusing compiled chain for table %s", tb)
        else:
            proc_chain, field_mask, tb_out = build_processing_chain(
                processors,
                tb_in,
                db_dict=db_dict,
                outputs=_outputs,
                block_width=block_width,
            )
            if checked:
                proc_chain.set_checked(True)
            if cache_key is not None:
                _CHAIN_CACHE[cache_key] = (proc_chain, field_mask, tb_out)
                while len(_CHAIN_CACHE) > _CHAIN_CACHE_MAX:
                    _CHAIN_CACHE.pop(next(iter(_CHAIN_CACHE)))
        if isinstance(lh5_it, LH5Iterator):
            lh5_it.reset_field_mask(field_mask)

        progress_bar = None
        if log.isEnabledFor(logging.INFO):
            try:
                from tqdm.auto import tqdm

                progress_bar = tqdm(
                    desc=f"Processing table {tb}",
                    total=tot_n_rows,
                    delay=2,
                    unit=" rows",
                )
            except ImportError:
                pass

        curr = time.time()
        loading_time += curr - start
        processing_time = 0.0

        dsp_name = tb.replace("raw", "dsp")
        tb_fill = None
        if isinstance(dsp_st, Struct):
            tb_fill = deepcopy(tb_out)
            tb_fill.resize(0)
            if dsp_name == "":
                dsp_st = tb_fill
            else:
                *groups, tb_name = dsp_name.split("/")
                node = dsp_st
                for gr in groups:
                    node = node.setdefault(gr, Struct())
                node[tb_name] = tb_fill

        profile_dir = os.getenv("DSPEED_TPU_PROFILE")
        profiler_cm = None
        if profile_dir:
            import contextlib

            import jax

            profiler_cm = jax.profiler.trace(profile_dir)
            profiler_cm.__enter__()

        chunk_iter = (
            _prefetched(lh5_it, chain=proc_chain)
            if isinstance(lh5_it, LH5Iterator)
            else ((tb, None, 0) for tb in lh5_it)
        )

        # output pipeline: dispatch chunk i+1 to the device FIRST, then join
        # chunk i's writer job (D2H fetch + output-manager write + LH5
        # write on one FIFO worker thread). The device computes chunk i+1
        # while chunk i drains to disk — with the input-side read-ahead in
        # _prefetched this triple-buffers read / compute / write. The join
        # before the next writer submit keeps tb_out single-buffered: a
        # chunk's managers never write while the store still reads it.
        from concurrent.futures import ThreadPoolExecutor

        def _drain(pending, n, i_entry):
            t0 = time.time()
            proc_chain.finish_chunk(pending, n)
            t1 = time.time()
            if isinstance(dsp_st, LH5Store):
                out_view = tb_out[0:n] if n != len(tb_out) else tb_out
                dsp_st.write(
                    obj=out_view,
                    name=dsp_name,
                    lh5_file=dsp_out,
                    wo_mode="o" if write_mode == "u" else "a",
                    write_start=i_start - write_base + i_entry,
                    n_rows=n,
                )
            else:
                tb_fill.append(tb_out[0:n] if n != len(tb_out) else tb_out)
            return time.time() - t0, time.time() - t1

        writer = ThreadPoolExecutor(1)
        in_flight = None  # (future, wf_range)

        def _join(in_flight):
            nonlocal processing_time, write_time
            fut, wf_range = in_flight
            try:
                drain_s, write_s = fut.result()
            except DSPFatal as e:
                if e.wf_range is not None:  # checked mode: exact entry
                    e.wf_range = (
                        wf_range[0] + e.wf_range[0],
                        wf_range[0] + e.wf_range[1],
                    )
                else:
                    e.wf_range = wf_range
                raise e
            processing_time += drain_s - write_s
            write_time += write_s
            if progress_bar is not None:
                progress_bar.update(wf_range[1] - wf_range[0])

        try:
            for tb_in, staged, i_entry in chunk_iter:
                loading_time += time.time() - curr
                t_proc = time.time()
                try:
                    pending, n = proc_chain.dispatch_chunk(tb_in, staged=staged)
                except DSPFatal as e:
                    if e.wf_range is not None:
                        e.wf_range = (
                            i_entry + e.wf_range[0],
                            i_entry + e.wf_range[1],
                        )
                    else:
                        e.wf_range = (i_entry, i_entry + len(tb_in))
                    raise e
                processing_time += time.time() - t_proc
                if in_flight is not None:
                    _join(in_flight)
                if pending is not None:
                    in_flight = (
                        writer.submit(_drain, pending, n, i_entry),
                        (i_entry, i_entry + n),
                    )
                curr = time.time()
            if in_flight is not None:
                _join(in_flight)
                curr = time.time()
        finally:
            writer.shutdown(wait=True)

        if progress_bar is not None:
            progress_bar.close()
        if profiler_cm is not None:
            profiler_cm.__exit__(None, None, None)
            log.info("JAX profiler trace written to %s", profile_dir)

        total_time = time.time() - start
        log.info("Table %s processed in %.2f seconds", tb, total_time)
        log.debug("Table %s loading time: %.2f seconds", tb, loading_time)
        log.debug("Table %s write time: %.2f seconds", tb, write_time)
        log.debug("Table %s processing time: %.2f seconds", tb, processing_time)
        if stats is not None:
            stats["loading_s"] = stats.get("loading_s", 0.0) + loading_time
            stats["processing_s"] = stats.get("processing_s", 0.0) + processing_time
            stats["write_s"] = stats.get("write_s", 0.0) + write_time
            stats["total_s"] = stats.get("total_s", 0.0) + total_time
            stats["rows"] = stats.get("rows", 0) + tot_n_rows
        if log.isEnabledFor(logging.DEBUG):
            times = proc_chain.get_timing()
            log.debug("Processor timing info (eager profile mode only): ")
            for proc, t in sorted(times.items(), key=lambda kv: kv[1], reverse=True):
                log.debug("%s: %.3f s", proc, t)

    # in lgdo, Table subclasses Struct; here they are distinct types
    if isinstance(dsp_st, (Struct, Table)):
        return dsp_st
    dsp_st.close()
