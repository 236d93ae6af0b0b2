"""Multi-host data-parallel mapping driver.

The reference parallelizes mapping with kt_for threads inside one
process (map.c:291, kthread.c) and keeps output in input order through
the kt_pipeline handoff (map.c:293-325).  At pod scale the equivalent
is: shard queries round-robin across processes/hosts (data parallel —
queries are independent), map each shard against the local index
replica, and restore the global input order at emission on process 0.

Region records (not formatted text) are spooled, because GFF record ids
(``MP%06d``) are assigned in *output* order (format.c:372), which is
only known after the cross-host merge.

Coordination uses a shared spool directory plus the jax.distributed
barrier when available (multi-host pods have both); the spool files
double as per-shard checkpoints — a preempted run can be resumed by
re-running only the processes whose spool file is missing.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from ..align import DpEnv
from ..bseq import BatchReader
from ..index import Index
from ..mapper import map_query
from ..options import F_GFF, MapOpt
from ..pipeline import _emit_query


def spool_path(spool_dir: str, process_id: int) -> str:
    return os.path.join(spool_dir, f"shard{process_id:05d}.pkl")


def map_shard(mi: Index, fn: str, opt: MapOpt, process_id: int,
              num_processes: int, spool_dir: str) -> int:
    """Map queries with global index % num_processes == process_id and
    spool (query_index, name, seq_bytes, regions) records."""
    env = DpEnv(opt)
    reader = BatchReader(fn)
    out = []
    qi = 0
    while True:
        batch = reader.read_batch(opt.mini_batch_size)
        if not batch:
            break
        for rec in batch:
            if qi % num_processes == process_id:
                seq = np.frombuffer(rec.seq, dtype=np.uint8)
                regs = map_query(mi, seq, opt, env=env)
                out.append((qi, rec.name, rec.seq, regs))
            qi += 1
    tmp = spool_path(spool_dir, process_id) + ".tmp"
    with open(tmp, "wb") as fp:
        pickle.dump(out, fp, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, spool_path(spool_dir, process_id))  # atomic: resumable
    return len(out)


def emit_merged(mi: Index, opt: MapOpt, num_processes: int, spool_dir: str,
                out) -> int:
    """Process-0 ordered emit: merge every shard's spool in global query
    order and run the standard per-query output filters."""
    records = []
    for pid in range(num_processes):
        with open(spool_path(spool_dir, pid), "rb") as fp:
            records.extend(pickle.load(fp))
    records.sort(key=lambda r: r[0])
    if opt.flag & F_GFF:
        out.write("##gff-version 3\n")
    id_counter = [0]
    for _, name, seq_bytes, regs in records:
        seq = np.frombuffer(seq_bytes, dtype=np.uint8)
        _emit_query(mi, opt, name, seq, regs, id_counter, out)
    return len(records)


def map_file_multihost(mi: Index, fn: str, opt: MapOpt, process_id: int,
                       num_processes: int, spool_dir: str, out,
                       barrier=None) -> int:
    """Full multi-host run for one process: map my shard, barrier, and
    (on process 0) emit the merged ordered output.

    barrier: callable; defaults to jax.experimental.multihost_utils.
    sync_global_devices when a jax.distributed client is initialized,
    else a no-op (single process)."""
    n = map_shard(mi, fn, opt, process_id, num_processes, spool_dir)
    if barrier is None:
        if num_processes > 1:
            from jax.experimental.multihost_utils import sync_global_devices
            barrier = lambda: sync_global_devices("miniprot_tpu_spool")
        else:
            barrier = lambda: None
    barrier()
    if process_id == 0:
        return emit_merged(mi, opt, num_processes, spool_dir, out)
    return n
