"""Batched mapping pipeline with ordered output.

The reference's 3-step read/map/write pipeline (map.c:242-343, kthread.c)
maps to a batch loop here:

  read  -> up to mini_batch_size residues of queries per mini-batch
  map   -> data-parallel across a fork-based process pool (the kt_for
           analog); with use_tpu, the alignment round's extension DPs of
           the whole mini-batch are additionally batched onto the TPU
           Pallas kernel
  write -> input-order emit with the per-query best-score/coverage
           output filters

Output is byte-identical across (n_threads, use_tpu) settings.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from .align import DpEnv
from .bseq import BatchReader
from .format import write_output
from .index import Index
from .mapper import map_query
from .options import F_GFF, MapOpt

# worker-process state, inherited via fork
_W: dict = {}


def _emit_query(mi: Index, opt: MapOpt, name: str, seq: np.ndarray, regs,
                id_counter: list[int], out) -> None:
    """Per-query ordered emit with output filters (map.c:297-313)."""
    best_sc = -1
    if regs:
        r0 = regs[0]
        best_sc = r0.p.dp_max if r0.p is not None else r0.chn_sc
    n_out = 0
    for j, r in enumerate(regs):
        if j >= opt.out_n:
            break
        sc = r.p.dp_max if r.p is not None else r.chn_sc
        if sc <= 0 or sc < float(best_sc) * opt.out_sim:
            continue
        if r.qe - r.qs < float(len(seq)) * opt.out_cov:
            continue
        id_counter[0] += 1
        out.write(write_output(mi, opt, name, seq, r, id_counter[0], j + 1))
        n_out += 1
    if n_out == 0:
        out.write(write_output(mi, opt, name, seq, None, 0, 0))


def _worker_map(seq_bytes: bytes):
    seq = np.frombuffer(seq_bytes, dtype=np.uint8)
    return map_query(_W["mi"], seq, _W["opt"], env=_W["env"])


def _worker_pre_align(seq_bytes: bytes):
    from .mapper import pre_align
    seq = np.frombuffer(seq_bytes, dtype=np.uint8)
    return pre_align(_W["mi"], seq, _W["opt"])


def _make_pool(mi: Index, opt: MapOpt, n_workers: int):
    import multiprocessing as mp
    import warnings
    _W["mi"] = mi
    _W["opt"] = opt
    _W["env"] = DpEnv(opt)
    ctx = mp.get_context("fork")
    with warnings.catch_warnings():
        # fork after jax/BLAS threads exist: safe here because the map
        # workers touch only numpy + libmpnative (no locks shared with
        # those threads)
        warnings.filterwarnings("ignore", message=".*fork.*")
        return ctx.Pool(n_workers)


class _Prefetcher:
    """Read batch N+1 while batch N maps (the kt_pipeline analog,
    kthread.c:97-159)."""

    def __init__(self, reader: BatchReader, chunk_size: int):
        import queue as _q
        import threading
        self._q: "_q.Queue" = _q.Queue(maxsize=1)

        def run():
            while True:
                b = reader.read_batch(chunk_size)
                self._q.put(b)
                if not b:
                    return

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def get(self):
        return self._q.get()


def _probe_backend_guarded() -> None:
    """Bounded backend-init check before building the device engine.

    On relay-attached devices the claim handshake can wedge: a raw
    jax.devices() on the main thread then blocks past every batch
    watchdog and the run dies at the harness timeout (observed in the
    --big --tpu soak).  Delegates to the package-wide guarded+cached
    probe (kernels.probe_backend_guarded); raises on a dead backend so
    the caller degrades to the host engine."""
    from .kernels import probe_backend_guarded
    if not probe_backend_guarded():
        raise TimeoutError("no usable TPU backend (probe failed or timed out)")


# routing A/B: nonzero enables the measured engine probe in auto mode
# (0 disables — auto then always keeps the device engine); the A/B
# block size itself is min(512, len(batch)//3)
ROUTE_PROBE_N = int(os.environ.get("MINIPROT_TPU_ROUTE_PROBE", "1"))
ROUTE_MIN_BATCH = 512
# a DECISIVE probe outcome (>= this rate ratio) is cached on disk and
# reused for this long, so repeat runs on the same machine skip the
# probe entirely — the steady-state default then matches the faster
# engine's wall exactly.  Near-ties are re-probed every run (relay
# weather shifts minute to minute on relay-attached chips).
ROUTE_CACHE_MARGIN = 1.3
ROUTE_CACHE_TTL_S = 6 * 3600.0


def _route_cache_path() -> str:
    return os.path.join(os.path.expanduser("~/.cache/miniprot_tpu"),
                        "route.json")


def _route_cache_load():
    """Cached routing decision, or None (absent, stale, or indecisive)."""
    import json
    import time as _time
    try:
        with open(_route_cache_path()) as f:
            c = json.load(f)
        if _time.time() - c["ts"] > ROUTE_CACHE_TTL_S:
            return None
        slow, fast = max(c["t_dev"], c["t_host"]), min(c["t_dev"], c["t_host"])
        if slow < fast * ROUTE_CACHE_MARGIN:
            return None
        return c["choice"]
    except Exception:
        return None


def _route_cache_store(t_dev: float, t_host: float, choice: str) -> None:
    import json
    import time as _time
    try:
        path = _route_cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"ts": _time.time(), "t_dev": t_dev,
                       "t_host": t_host, "choice": choice}, f)
        os.replace(tmp, path)
    except OSError:
        pass


def _route_probe(mi, opt, env, engine, part, block, pool, id_counter,
                 out):
    """Measured-cost engine routing by SPLIT A/B: map the first `block`
    queries on the device engine and the next `block` on the host
    engine — every query mapped exactly ONCE (outputs are byte-
    identical by construction, so the split never shows in the output)
    — then keep the faster engine for the rest of the run.

    Why a block this large: a small probe cannot show the device's
    steady-state rate — with only ~64 queries in flight its batches go
    out with near-empty lane dimensions and per-wave relay latency
    dominates (observed live: a 64-query device probe read 22/s while
    the full-batch device run sustained 107/s).  512 queries is the
    scale the run actually executes at.  The device block also absorbs
    the one-time costs (daemon connection, traces) a long run
    amortizes; that is honest — a short run pays them too.

    On a relay-attached chip the device path's per-wave latency can
    exceed its kernel advantage for host-cheap workloads; the default
    must be the fastest correct path on the machine the run lands on,
    so the decision is measured, not assumed.  Probe cost: ZERO
    duplicated work — only the timing of work the run needed anyway."""
    import time as _time
    dev_part, host_part = part[:block], part[block:]
    t0 = _time.monotonic()
    dev_results = map_batch_tpu(mi, opt, env, engine, dev_part, pool)
    t_dev = _time.monotonic() - t0
    for rec, seq, regs in dev_results:
        _emit_query(mi, opt, rec.name, seq, regs, id_counter, out)
    t0 = _time.monotonic()
    if pool is not None:
        host_results = pool.map(_worker_map, [r.seq for r in host_part],
                                chunksize=max(1, len(host_part) // 32))
    else:
        host_results = [map_query(mi, np.frombuffer(rec.seq, np.uint8),
                                  opt, env=env) for rec in host_part]
    t_host = _time.monotonic() - t0
    for rec, regs in zip(host_part, host_results):
        seq = np.frombuffer(rec.seq, dtype=np.uint8)
        _emit_query(mi, opt, rec.name, seq, regs, id_counter, out)
    keep = (not engine.broken) and t_dev <= t_host
    sys.stderr.write(
        f"[route] A/B over {block}+{len(host_part)} queries: device "
        f"{t_dev:.2f}s vs host {t_host:.2f}s -> "
        f"{'device' if keep else 'host'} engine for this run\n")
    return keep, t_dev, t_host


def map_file(mi: Index, fn: str, opt: MapOpt, n_threads: int = 1,
             out=None, use_tpu=False, dbg: dict | None = None,
             ckpt: str | None = None, stats: dict | None = None) -> int:
    """Map all queries in a FASTA/FASTQ file (mp_map_file, map.c:330-343).

    use_tpu: False = host engine; True = device engine (forced);
    "auto" = device engine, but the first mini-batch (when big enough)
    starts with a measured split A/B — one block of queries on each
    engine, each mapped once, the faster engine keeps the run
    (_route_probe; decisive outcomes cached 6h).

    ckpt: path of a mini-batch checkpoint journal (requires a seekable
    `out`).  Mini-batches are idempotent work units (the reference's
    kt_pipeline structure, kthread.c:97-159, has the same property);
    after each batch the journal records (batch, n_mapped, id_counter,
    byte offset).  On restart the output is truncated to the last
    complete batch and mapping resumes at the next one, producing
    byte-identical output to an uninterrupted run."""
    out = out or sys.stdout
    dbg = dbg or {}
    reader = BatchReader(fn)
    env = DpEnv(opt)
    id_counter = [0]
    done_batches = -1
    ckpt_f = None
    if ckpt is not None:
        if os.path.exists(ckpt):
            with open(ckpt) as f:
                lines = [ln for ln in f.read().splitlines()
                         if ln.count("\t") == 3]
            if lines:
                b, nm, idc, off = lines[-1].split("\t")
                done_batches, id_counter[0] = int(b), int(idc)
                out.seek(int(off))
            else:
                out.seek(0)  # crashed before the first journal entry
            out.truncate()
        ckpt_f = open(ckpt, "a")
    if opt.flag & F_GFF and done_batches < 0:
        out.write("##gff-version 3\n")
    from .sysutil import profiler
    profiler.start("map")
    n_mapped = 0
    engine = None
    if use_tpu:
        try:
            from .device import TpuExtEngine
            engine = TpuExtEngine(opt)
            if engine.client is None:
                # no warm daemon: the engine drives the backend itself,
                # so fail fast here if there is no usable backend
                _probe_backend_guarded()
        except Exception as e:
            sys.stderr.write(f"WARNING: TPU engine unavailable ({e}); "
                             "mapping on the host engine instead\n")
            engine = None
    n_workers = max(1, min(n_threads, os.cpu_count() or 1))
    pool = _make_pool(mi, opt, n_workers) if n_workers > 1 else None
    pre = _Prefetcher(reader, opt.mini_batch_size)
    try:
        batch_idx = -1
        while True:
            batch = pre.get()
            if not batch:
                break
            batch_idx += 1
            if batch_idx <= done_batches:
                n_mapped += len(batch)  # already emitted by a prior run
                continue
            if (engine is not None and use_tpu == "auto"
                    and batch_idx == done_batches + 1
                    and len(batch) >= ROUTE_MIN_BATCH
                    and ROUTE_PROBE_N > 0):
                cached = _route_cache_load()
                if cached is not None:
                    sys.stderr.write(f"[route] cached decision: {cached} "
                                     f"engine (re-probed when older than "
                                     f"{ROUTE_CACHE_TTL_S/3600:.0f}h)\n")
                    if stats is not None:
                        stats.update(route_choice=cached,
                                     route_cached=True)
                    if cached == "host":
                        engine = None
                else:
                    block = min(512, max(64, len(batch) // 3))
                    part, batch = batch[:2 * block], batch[2 * block:]
                    keep, t_dev, t_host = _route_probe(
                        mi, opt, env, engine, part, block, pool,
                        id_counter, out)
                    if not engine.broken:
                        # a probe polluted by an engine failure (relay
                        # wedge, daemon death) measured the failure,
                        # not the machine — never pin it for 6h
                        _route_cache_store(t_dev, t_host,
                                           "device" if keep else "host")
                    if stats is not None:
                        stats.update(route_probe_device_s=round(t_dev, 3),
                                     route_probe_host_s=round(t_host, 3),
                                     route_choice="device" if keep
                                     else "host")
                    n_mapped += len(part)
                    if not keep:
                        engine = None
            if engine is not None:
                _map_batch_tpu(mi, opt, env, engine, batch, id_counter, out, pool)
            elif pool is not None:
                results = pool.map(_worker_map, [r.seq for r in batch],
                                   chunksize=max(1, len(batch) // (n_workers * 8)))
                for rec, regs in zip(batch, results):
                    seq = np.frombuffer(rec.seq, dtype=np.uint8)
                    _emit_query(mi, opt, rec.name, seq, regs, id_counter, out)
            else:
                for rec in batch:
                    if dbg.get("qname"):
                        sys.stderr.write(f"QR\t{rec.name}\t{len(rec.seq)}\t0\n")
                    seq = np.frombuffer(rec.seq, dtype=np.uint8)
                    regs = map_query(mi, seq, opt, env=env, dbg=dbg)
                    _emit_query(mi, opt, rec.name, seq, regs, id_counter, out)
            n_mapped += len(batch)
            if ckpt_f is not None:
                out.flush()
                ckpt_f.write(f"{batch_idx}\t{n_mapped}\t{id_counter[0]}\t"
                             f"{out.tell()}\n")
                ckpt_f.flush()
            from . import sysutil
            sysutil.log("map_file", "mapped %d sequences", len(batch))
    finally:
        profiler.stop("map")
        if engine is not None:
            from . import sysutil
            sysutil.log(
                "map_file",
                "DP split: %d device / %d host calls; %.1f%% of cells on "
                "device", engine.n_tpu, engine.n_host,
                100.0 * profiler.device_fraction())
            if stats is not None:
                stats.update(n_tpu=engine.n_tpu, n_host=engine.n_host,
                             device_fraction=profiler.device_fraction())
        if ckpt_f is not None:
            ckpt_f.close()
        if pool is not None:
            pool.terminate()
            pool.join()
    return n_mapped


# pre_align streaming: chunk size fed to the align pump (0 = whole
# batch at once), and the minimum number of active generators to
# bundle before a flush round (small early rounds would fragment the
# device batches).  Default 0: on THIS relay-attached fabric streaming
# measured neutral-to-negative (200Mb x 2000: 93/s at 164 round trips
# streamed vs 96-102/s at 134 trips whole-batch — the extra rounds'
# relay latency eats the pre_align overlap).  On a co-located chip the
# extra rounds are ~free and the overlap is pure win; enable with
# MINIPROT_TPU_PRE_CHUNK=256 there.
PRE_CHUNK = int(os.environ.get("MINIPROT_TPU_PRE_CHUNK", "0"))
MIN_ACTIVE_GENS = 512


def map_batch_tpu(mi: Index, opt: MapOpt, env: DpEnv, engine, batch,
                  pool=None) -> list:
    """Map one mini-batch with TPU-batched extension DPs; returns
    [(rec, seq, final_regs), ...] in batch order.

    Seed/chain/refine (pre_align) run on a producer thread, optionally
    STREAMING in PRE_CHUNK-query chunks while the align pump runs
    device waves for the chunks already produced: pre_align is
    dominated by GIL-free native calls, so it executes during the
    waves' network wait.  Whether that overlap pays depends on the
    fabric — see the PRE_CHUNK constant note.  Generator results are
    identical regardless of which flush round a generator joins (batch
    composition never affects the bit-exact per-lane DP), so output is
    byte-identical at every chunking; ordering is preserved because
    chunks arrive in input order from the single producer."""
    import queue as _q
    import threading

    from .align import align_region_steps
    from .mapper import finish_align, pre_align

    ready: _q.Queue = _q.Queue(maxsize=4)

    chunk = PRE_CHUNK if PRE_CHUNK > 0 else max(1, len(batch))

    def producer() -> None:
        try:
            for c0 in range(0, len(batch), chunk):
                ch = batch[c0:c0 + chunk]
                if pool is not None:
                    pre = pool.map(_worker_pre_align,
                                   [r.seq for r in ch],
                                   chunksize=max(1, len(ch) // 32))
                else:
                    pre = [pre_align(mi, np.frombuffer(r.seq, np.uint8),
                                     opt) for r in ch]
                ready.put((ch, pre))
            ready.put(None)
        except BaseException as e:   # surface in the pump, never hang it
            ready.put(("error", e))

    threading.Thread(target=producer, daemon=True,
                     name="pre-align-producer").start()
    per_query: list = []
    gens: list = []
    active: dict[int, list] = {}
    done_producing = False

    def prime(ch, pre) -> None:
        for rec, (regs, ext) in zip(ch, pre):
            seq = np.frombuffer(rec.seq, dtype=np.uint8)
            per_query.append((rec, seq, regs))
            for r, (el, er) in zip(regs, ext):
                gi = len(gens)
                g = align_region_steps(env, opt, mi, len(seq), seq, r,
                                       el, er)
                gens.append(g)
                try:
                    active[gi] = next(g)
                except StopIteration:
                    pass

    while True:
        # absorb chunks: block while idle or under the bundling floor,
        # drain opportunistically otherwise
        while not done_producing:
            block = len(active) < MIN_ACTIVE_GENS
            try:
                item = ready.get(block=block)
            except _q.Empty:
                break
            if item is None:
                done_producing = True
                break
            if item[0] == "error":
                raise item[1]
            prime(*item)
        if not active:
            if done_producing:
                break
            continue
        handles = {gi: [engine.submit(req) for req in reqs]
                   for gi, reqs in active.items()}
        results = engine.flush()
        nxt: dict[int, list] = {}
        for gi, hs in handles.items():
            try:
                nxt[gi] = gens[gi].send([results[h] for h in hs])
            except StopIteration:
                pass
        active = nxt
    return [(rec, seq, finish_align(mi, opt, regs))
            for rec, seq, regs in per_query]


def _map_batch_tpu(mi: Index, opt: MapOpt, env: DpEnv, engine, batch,
                   id_counter, out, pool=None) -> None:
    for rec, seq, regs in map_batch_tpu(mi, opt, env, engine, batch, pool):
        _emit_query(mi, opt, rec.name, seq, regs, id_counter, out)
