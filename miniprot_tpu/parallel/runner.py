"""Multi-host data-parallel mapping driver.

The reference parallelizes mapping with kt_for threads inside one
process (map.c:291, kthread.c) and keeps output in input order through
the kt_pipeline handoff (map.c:293-325).  At pod scale the equivalent
is: shard queries round-robin across processes/hosts (data parallel —
queries are independent), map each shard against the local index
replica, and restore the global input order at emission on process 0.

Every output mode emits in parallel: each shard FORMATS its own
queries' text and spools it, so the process-0 emit never re-formats —
this removes the serial formatting term that binds the scaling model
at high shard counts (docs/SCALING.md).  For id-free modes (PAF,
--aln, --trans — the default) a spooled record is (query_index, text)
and the merge is pure ordered concatenation.  GFF/GTF record ids
(``MP%06d``, format.c:372) are assigned in *output* order, which is
only known after the cross-host merge, so they use a TWO-PHASE id
assignment: shards format with a NUL-sentinel standing in for the id
digits (_DeferredId) and spool (query_index, text, n_records); the
merge keeps a running global id base per record stream and rewrites
each sentinel to ``base + local`` — a cheap string splice, not a
re-format, so GFF scales like PAF.

Spools are STREAMS: each shard appends one pickled record per query as
it maps (so a shard never holds its results in RAM), and the process-0
emit is a k-way heap merge over lazy per-shard readers (so the merge
holds one record per shard, not the whole run).  A 25k-protein mammal
run across 16 hosts therefore needs O(16) records of merge memory
instead of O(25k).

Coordination uses a shared spool directory plus the jax.distributed
barrier when available (multi-host pods have both); the spool files
double as per-shard checkpoints — a preempted run can be resumed by
re-running only the processes whose spool file is missing.
"""

from __future__ import annotations

import heapq
import os
import pickle

import numpy as np

from ..align import DpEnv
from ..bseq import BatchReader
from ..index import Index
from ..mapper import map_query
from ..options import F_GFF, F_GTF, MapOpt
from ..pipeline import _emit_query


def emit_is_parallel(opt: MapOpt) -> bool:
    """True when per-query output text is independent of global state
    (no output-order record ids), so a spooled record is final text.
    GFF/GTF also format shard-side, but through the deferred-id
    two-phase scheme (see module docstring / _DeferredId)."""
    return not (opt.flag & (F_GFF | F_GTF))


class _DeferredId:
    """Stands in for the global GFF/GTF record id during shard-side
    formatting.  Supports the id-counter arithmetic the emit path does
    (``id_counter[0] += 1`` per emitted record) and formats — via the
    writers' existing ``{gid:06d}`` f-strings, unchanged — as a
    NUL-delimited sentinel carrying the shard-local ordinal.  The
    process-0 merge rewrites each sentinel to the true global id once
    output order is known (``_rewrite_ids``)."""

    __slots__ = ("local",)

    def __init__(self, local: int) -> None:
        self.local = local

    def __add__(self, k: int) -> "_DeferredId":
        return _DeferredId(self.local + k)

    def __format__(self, spec: str) -> str:
        return f"\x00{self.local}\x00"


def _rewrite_ids(text: str, base: int) -> str:
    """Splice global ids into shard-formatted GFF/GTF text: sentinel
    segments (odd positions after a NUL split) hold the local ordinal;
    the true id is ``base + local`` zero-padded exactly as the writers'
    ``{gid:06d}`` would have printed it."""
    if "\x00" not in text:
        return text
    parts = text.split("\x00")
    for i in range(1, len(parts), 2):
        parts[i] = format(base + int(parts[i]), "06d")
    return "".join(parts)


def spool_path(spool_dir: str, process_id: int) -> str:
    return os.path.join(spool_dir, f"shard{process_id:05d}.pkl")


def wait_for_spools(spool_dir: str, num_processes: int,
                    timeout: float = 86400.0, poll: float = 0.5) -> None:
    """Filesystem barrier: block until every shard spool exists.

    Used when no jax.distributed client coordinates the processes (e.g.
    independent CLI launches over a shared filesystem).  Spool files are
    written to a .tmp name and os.replace()d, so existence implies the
    shard is complete."""
    import time as _time
    deadline = _time.monotonic() + timeout
    missing = set(range(num_processes))
    while missing:
        missing = {pid for pid in missing
                   if not os.path.exists(spool_path(spool_dir, pid))}
        if not missing:
            return
        if _time.monotonic() > deadline:
            raise TimeoutError(
                f"shards never finished: {sorted(missing)} "
                f"(no spool file after {timeout:.0f}s)")
        _time.sleep(poll)


def map_shard(mi: Index, fn: str, opt: MapOpt, process_id: int,
              num_processes: int, spool_dir: str,
              resume: bool = False, use_tpu: bool = False) -> int:
    """Map queries with global index % num_processes == process_id,
    streaming (query_index, name, seq_bytes, regions) records to the
    shard spool in ascending query order.

    resume: when the final spool file already exists, skip mapping (the
    atomic .tmp -> final rename makes an existing spool a complete,
    trustworthy checkpoint; docstring at module top).

    use_tpu: batch this shard's alignment-round DPs onto the local
    accelerator (each host drives its own chip; the spooled Region
    records are identical either way).  Degrades to the host engine
    when no TPU backend is live."""
    engine = None
    if use_tpu:
        try:
            from ..device import TpuExtEngine
            engine = TpuExtEngine(opt)
            if engine.client is None:
                from ..pipeline import _probe_backend_guarded
                _probe_backend_guarded()
        except Exception as e:
            import sys
            sys.stderr.write(f"WARNING: TPU engine unavailable ({e}); "
                             f"shard {process_id} maps on the host engine\n")
            engine = None
    if resume and os.path.exists(spool_path(spool_dir, process_id)):
        return -1
    env = DpEnv(opt)
    reader = BatchReader(fn)
    par_emit = emit_is_parallel(opt)
    n = 0
    qi = 0
    tmp = spool_path(spool_dir, process_id) + ".tmp"

    def spool_rec(fp, qi0, rec, regs):
        import io as _io
        buf = _io.StringIO()
        if par_emit:
            # format here: the proc-0 merge then only concatenates
            _emit_query(mi, opt, rec.name,
                        np.frombuffer(rec.seq, dtype=np.uint8), regs,
                        [0], buf)
            pickle.dump((qi0, buf.getvalue()), fp,
                        protocol=pickle.HIGHEST_PROTOCOL)
        else:
            # GFF/GTF: format here too, with deferred ids; the merge
            # splices in the global id base (two-phase id assignment)
            idc = [_DeferredId(0)]
            _emit_query(mi, opt, rec.name,
                        np.frombuffer(rec.seq, dtype=np.uint8), regs,
                        idc, buf)
            pickle.dump((qi0, buf.getvalue(), idc[0].local), fp,
                        protocol=pickle.HIGHEST_PROTOCOL)

    with open(tmp, "wb") as fp:
        while True:
            batch = reader.read_batch(opt.mini_batch_size)
            if not batch:
                break
            mine = [(qi0, rec) for qi0, rec in
                    enumerate(batch, start=qi)
                    if qi0 % num_processes == process_id]
            qi += len(batch)
            if engine is not None:
                from ..pipeline import map_batch_tpu
                mapped = map_batch_tpu(mi, opt, env, engine,
                                       [rec for _, rec in mine])
                for (qi0, _), (rec, _, regs) in zip(mine, mapped):
                    spool_rec(fp, qi0, rec, regs)
                    n += 1
            else:
                for qi0, rec in mine:
                    seq = np.frombuffer(rec.seq, dtype=np.uint8)
                    regs = map_query(mi, seq, opt, env=env)
                    spool_rec(fp, qi0, rec, regs)
                    n += 1
    os.replace(tmp, spool_path(spool_dir, process_id))  # atomic: resumable
    return n


def _iter_spool(path: str):
    with open(path, "rb") as fp:
        while True:
            try:
                yield pickle.load(fp)
            except EOFError:
                return


def emit_merged(mi: Index, opt: MapOpt, num_processes: int, spool_dir: str,
                out) -> int:
    """Process-0 ordered emit: streaming k-way merge of the shard spools
    in global query order, through the standard per-query output
    filters.  Memory: one in-flight record per shard."""
    streams = [_iter_spool(spool_path(spool_dir, pid))
               for pid in range(num_processes)]
    if opt.flag & F_GFF:
        out.write("##gff-version 3\n")
    id_counter = [0]
    n = 0
    # each stream is ascending in qi, so heapq.merge restores the global
    # input order without materializing anything
    for rec in heapq.merge(*streams, key=lambda r: r[0]):
        if len(rec) == 2:          # parallel emit: pre-formatted text
            out.write(rec[1])
        elif len(rec) == 3:        # GFF/GTF: splice in the global ids
            out.write(_rewrite_ids(rec[1], id_counter[0]))
            id_counter[0] += rec[2]
        else:                      # legacy spool: Region records
            qi, name, seq_bytes, regs = rec
            seq = np.frombuffer(seq_bytes, dtype=np.uint8)
            _emit_query(mi, opt, name, seq, regs, id_counter, out)
        n += 1
    return n


def map_file_multihost(mi: Index, fn: str, opt: MapOpt, process_id: int,
                       num_processes: int, spool_dir: str, out,
                       barrier=None, resume: bool = False,
                       use_tpu: bool = False) -> int:
    """Full multi-host run for one process: map my shard, barrier, and
    (on process 0) emit the merged ordered output.

    barrier: callable; defaults to jax.experimental.multihost_utils.
    sync_global_devices when a jax.distributed client is initialized,
    else the filesystem barrier (wait for every shard's spool file) —
    the mode the CLI's --shards flag uses, where each shard is an
    independent process over a shared spool directory."""
    n = map_shard(mi, fn, opt, process_id, num_processes, spool_dir,
                  resume=resume, use_tpu=use_tpu)
    if barrier is None:
        if num_processes > 1:
            try:
                # presence of a jax.distributed client, WITHOUT touching
                # jax backends: backend init can wedge on a degraded
                # relay, and the fs-mode barrier must not require it
                from jax._src.distributed import global_state as _jd
                dist_up = getattr(_jd, "client", None) is not None
            except Exception:
                dist_up = False
            if dist_up:
                from jax.experimental.multihost_utils import \
                    sync_global_devices
                barrier = lambda: sync_global_devices("miniprot_tpu_spool")
            elif process_id == 0:
                barrier = lambda: wait_for_spools(spool_dir, num_processes)
            else:
                # fs mode: a non-zero shard is done once its own spool
                # is renamed; only the emitter must wait for everyone
                barrier = lambda: None
        else:
            barrier = lambda: None
    if process_id == 0:
        barrier()
        return emit_merged(mi, opt, num_processes, spool_dir, out)
    barrier()
    return n
