"""Multi-host data-parallel mapping driver.

The reference parallelizes mapping with kt_for threads inside one
process (map.c:291, kthread.c) and keeps output in input order through
the kt_pipeline handoff (map.c:293-325).  At pod scale the equivalent
is: shard queries round-robin across processes/hosts (data parallel —
queries are independent), map each shard against the local index
replica, and restore the global input order at emission on process 0.

For output modes whose per-query text is independent of global state
(PAF, --aln, --trans — everything except GFF/GTF), each shard FORMATS
its own queries' text and spools (query_index, text): the process-0
emit is then a pure ordered byte-stream concatenation, removing the
serial formatting term that binds the scaling model at high shard
counts (docs/SCALING.md).  GFF/GTF spool Region records instead,
because their record ids (``MP%06d``, format.c:372) are assigned in
*output* order, which is only known after the cross-host merge.

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
    (no output-order record ids), so shards can format their own text."""
    return not (opt.flag & (F_GFF | F_GTF))


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
        if par_emit:
            # format here: the proc-0 merge then only concatenates
            import io as _io
            buf = _io.StringIO()
            _emit_query(mi, opt, rec.name,
                        np.frombuffer(rec.seq, dtype=np.uint8), regs,
                        [0], buf)
            pickle.dump((qi0, buf.getvalue()), fp,
                        protocol=pickle.HIGHEST_PROTOCOL)
        else:
            pickle.dump((qi0, rec.name, rec.seq, regs), fp,
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
        else:
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
