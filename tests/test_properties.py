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


def test_set_parent_native_matches_python():
    """The native mp_set_parent port must match the pure-Python oracle
    field-for-field on randomized region lists (overlap geometry,
    p-carrying regions, hard-mask mode, float mask levels)."""
    import copy

    import numpy as np

    from miniprot_tpu.hits import Extra, Region, _set_parent_py, set_parent

    rng = np.random.default_rng(606)
    for trial in range(200):
        n = int(rng.integers(1, 40))
        regs = []
        for _ in range(n):
            qs = int(rng.integers(0, 300))
            qe = qs + int(rng.integers(1, 200))
            r = Region(vid=int(rng.integers(0, 3)), qs=qs, qe=qe,
                       vs=int(rng.integers(0, 10000)),
                       ve=int(rng.integers(10000, 20000)),
                       chn_sc=int(rng.integers(0, 500)),
                       a=np.zeros(int(rng.integers(1, 30)), np.uint64))
            if rng.random() < 0.5:
                r.p = Extra(dp_max=int(rng.integers(-50, 800)),
                            dp_max2=int(rng.integers(-50, 400)))
            regs.append(r)
        mask_level = float(rng.choice([0.5, 0.8, 1.0]))
        mask_len = int(rng.choice([0, 50, 2**30]))
        sub_diff = int(rng.choice([0, 6, 50]))
        hard = int(rng.random() < 0.3)
        regs_py = copy.deepcopy(regs)
        set_parent(mask_level, mask_len, regs, sub_diff, hard)
        _set_parent_py(mask_level, mask_len, regs_py, sub_diff, hard)
        for i, (rc, rp) in enumerate(zip(regs, regs_py)):
            assert (rc.parent, rc.n_sub, rc.subsc) == \
                (rp.parent, rp.n_sub, rp.subsc), (trial, i)
            if rc.p is not None:
                assert rc.p.dp_max2 == rp.p.dp_max2, (trial, i)


def test_select_sub_native_matches_python():
    """The native mp_select_sub port must return the same surviving
    region lists as the Python oracle, including the n_2nd budget and
    duplicate suppression."""
    import copy

    import numpy as np

    from miniprot_tpu.hits import (Extra, Region, _select_sub_py,
                                   select_sub, set_parent)

    rng = np.random.default_rng(608)
    for trial in range(200):
        n = int(rng.integers(1, 80))
        regs = []
        for _ in range(n):
            qs = int(rng.integers(0, 200))
            qe = qs + int(rng.integers(1, 150))
            r = Region(vid=int(rng.integers(0, 2)), qs=qs, qe=qe,
                       vs=int(rng.integers(0, 5000)),
                       ve=int(rng.integers(5000, 9000)),
                       chn_sc=int(rng.integers(0, 400)),
                       chn_sc_ungap=int(rng.integers(-10, 300)),
                       a=np.zeros(int(rng.integers(1, 10)), np.uint64))
            if rng.random() < 0.5:
                r.p = Extra(dp_max=int(rng.integers(-50, 700)))
            regs.append(r)
        set_parent(0.5, 2**30, regs, 6, 0)   # realistic parent links
        pri_ratio = float(rng.choice([0.5, 0.8, 0.97]))
        min_diff = int(rng.choice([0, 10]))
        best_n = int(rng.choice([1, 5, 100]))
        got = select_sub(pri_ratio, min_diff, best_n, copy.deepcopy(regs))
        want = _select_sub_py(pri_ratio, min_diff, best_n,
                              copy.deepcopy(regs))
        assert [(r.qs, r.qe, r.vs, r.parent, r.id) for r in got] == \
            [(r.qs, r.qe, r.vs, r.parent, r.id) for r in want], trial


def test_chn_sc_ungap_batch_matches_scalar():
    import numpy as np

    from miniprot_tpu import native

    rng = np.random.default_rng(607)
    cnts = rng.integers(1, 50, 30).astype(np.int64)
    ks = np.zeros(30, np.int64)
    np.cumsum(cnts[:-1], out=ks[1:])
    a = rng.integers(0, 2**63, int(cnts.sum()), dtype=np.uint64)
    out = native.chn_sc_ungap_approx_batch(ks, cnts, a, 6)
    for c in range(30):
        want = native.chn_sc_ungap_approx(a[ks[c]:ks[c] + cnts[c]], 6)
        assert int(out[c]) == want, c
