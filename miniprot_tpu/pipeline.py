"""Batched mapping pipeline with ordered output.

The reference's 3-step read/map/write pipeline (map.c:242-343) maps to a
batch loop here: read up to mini_batch_size residues of queries, map the
batch (data-parallel across a process pool or, on TPU, across chips via
the parallel/ layer), then emit in input order with the per-query
best-score/coverage output filters.
"""

from __future__ import annotations

import sys

import numpy as np

from .align import DpEnv
from .bseq import BatchReader
from .format import write_output
from .index import Index
from .mapper import map_query
from .options import F_GFF, MapOpt


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


def map_file(mi: Index, fn: str, opt: MapOpt, n_threads: int = 1,
             out=None, use_tpu: bool = False) -> int:
    """Map all queries in a FASTA/FASTQ file (mp_map_file, map.c:330-343).

    With use_tpu, the alignment round's extension DPs are batched across
    all regions of the whole mini-batch and dispatched to the Pallas
    kernel; output is byte-identical to the host path.
    """
    out = out or sys.stdout
    reader = BatchReader(fn)
    env = DpEnv(opt)
    id_counter = [0]
    if opt.flag & F_GFF:
        out.write("##gff-version 3\n")
    n_mapped = 0
    engine = None
    if use_tpu:
        from .device import TpuExtEngine
        engine = TpuExtEngine(opt)
    while True:
        batch = reader.read_batch(opt.mini_batch_size)
        if not batch:
            break
        if engine is None:
            for rec in batch:
                seq = np.frombuffer(rec.seq, dtype=np.uint8)
                regs = map_query(mi, seq, opt, env=env)
                _emit_query(mi, opt, rec.name, seq, regs, id_counter, out)
        else:
            _map_batch_tpu(mi, opt, env, engine, batch, id_counter, out)
        n_mapped += len(batch)
    return n_mapped


def _map_batch_tpu(mi: Index, opt: MapOpt, env: DpEnv, engine, batch,
                   id_counter, out) -> None:
    """One mini-batch with TPU-batched extension DPs."""
    from .align import align_region_steps
    from .device import pump_align_generators
    from .mapper import finish_align, pre_align

    per_query = []
    gens = []
    for rec in batch:
        seq = np.frombuffer(rec.seq, dtype=np.uint8)
        regs, ext = pre_align(mi, seq, opt)
        per_query.append((rec, seq, regs))
        for r, (el, er) in zip(regs, ext):
            gens.append(align_region_steps(env, opt, mi, len(seq), seq, r,
                                           el, er))
    pump_align_generators(gens, engine)
    for rec, seq, regs in per_query:
        regs = finish_align(mi, opt, regs)
        _emit_query(mi, opt, rec.name, seq, regs, id_counter, out)
