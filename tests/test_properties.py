"""Property tests over randomized workloads (SURVEY §4 item 3).

The reference asserts at align.c:194-200 that every region's extended
CIGAR consumes exactly (ve - vs) genome bases and (qe - qs) query
residues.  The byte-parity fuzz tests imply this indirectly (a CIGAR
with the right bytes has the right spans), but this checks the
invariant directly on the in-memory Region/Extra representation, for
every region of every query — including secondary regions that the
output filters may drop before emission.
"""

import numpy as np
import pytest

from miniprot_tpu.align import C_D, C_F, C_G, C_I, C_M, C_N, C_U, C_V
from miniprot_tpu.bseq import read_fastx
from miniprot_tpu.index import Index
from miniprot_tpu.mapper import map_query
from miniprot_tpu.options import IdxOpt, MapOpt
from miniprot_tpu.testgen import make_workload


def cigar_consumption(cigar: np.ndarray) -> tuple[int, int]:
    """(genome nt, query aa) consumed by an extended CIGAR
    (op semantics per align.c:97-153 / mp_extra_cal)."""
    nl = al = 0
    for c in cigar:
        op, ln = int(c) & 0xF, int(c) >> 4
        if op == C_M:
            nl += 3 * ln
            al += ln
        elif op == C_I:
            al += ln
        elif op == C_D:
            nl += 3 * ln
        elif op == C_F:
            nl += ln
        elif op == C_G:
            nl += ln
            al += 1
        elif op in (C_N, C_U, C_V):
            nl += ln
            al += op != C_N
        else:
            raise AssertionError(f"unexpected CIGAR op {op}")
    return nl, al


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cigar_consumes_exact_spans(tmp_path, seed):
    fa = str(tmp_path / "g.fa")
    faa = str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=300_000, n_genes=10, seed=seed,
                  n_ctg=2, max_exons=6, max_intron=3000,
                  mut_rate=0.04, rev_frac=0.4, fs_frac=0.3)
    mi = Index.build(fa, IdxOpt())
    opt = MapOpt()
    n_regions = 0
    for rec in read_fastx(faa):
        seq = np.frombuffer(rec.seq, np.uint8)
        for r in map_query(mi, seq, opt):
            if r.p is None:
                continue
            n_regions += 1
            nl, al = cigar_consumption(r.p.cigar)
            assert nl == r.ve - r.vs, (
                f"{rec.name}: CIGAR consumes {nl} nt, region spans "
                f"{r.ve - r.vs}")
            assert al == r.qe - r.qs, (
                f"{rec.name}: CIGAR consumes {al} aa, region spans "
                f"{r.qe - r.qs}")
    assert n_regions >= 8, "workload failed to produce enough alignments"
