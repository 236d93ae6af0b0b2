"""Randomized end-to-end parity: synthetic multi-exon genes vs reference."""
import subprocess
import sys

import numpy as np
import pytest

from miniprot_tpu import tables


AA = "ARNDCQEGHILKMFPSTWYV"


def make_aa2codons():
    T = tables.get_tables(1)
    m = {}
    for c in range(64):
        aa = tables.AA_I2C[T.codon[c]]
        b = "ACGT"[c >> 4] + "ACGT"[(c >> 2) & 3] + "ACGT"[c & 3]
        m.setdefault(aa, []).append(b)
    return m


def synth(rng, path_fa, path_faa, n_genes=2):
    aa2c = make_aa2codons()
    glen = int(rng.integers(15000, 40000))
    g = list(rng.choice(list("ACGT"), glen))
    prots = []
    for _ in range(n_genes):
        plen = int(rng.integers(60, 250))
        prot = "".join(rng.choice(list(AA), plen))
        n_ex = int(rng.integers(1, 5))
        cuts = sorted(rng.choice(np.arange(1, plen), n_ex - 1,
                                 replace=False).tolist()) if n_ex > 1 else []
        bounds = [0] + cuts + [plen]
        start = int(rng.integers(0, glen - plen * 3 - n_ex * 2600 - 10))
        pos = start
        for e in range(n_ex):
            for ch in prot[bounds[e]:bounds[e + 1]]:
                cod = aa2c[ch][int(rng.integers(len(aa2c[ch])))]
                g[pos:pos + 3] = list(cod)
                pos += 3
            if e < n_ex - 1:
                ilen = int(rng.integers(80, 2500))
                g[pos], g[pos + 1] = "G", "T"
                g[pos + ilen - 2], g[pos + ilen - 1] = "A", "G"
                pos += ilen
        p = list(prot)
        for _ in range(int(rng.integers(0, max(2, plen // 20)))):
            p[int(rng.integers(plen))] = AA[int(rng.integers(20))]
        if rng.random() < 0.3:
            k = int(rng.integers(1, plen - 1))
            if rng.random() < 0.5:
                del p[k]
            else:
                p.insert(k, AA[int(rng.integers(20))])
        prots.append("".join(p))
    s = "".join(g)
    with open(path_fa, "w") as f:
        f.write(">chrT\n")
        for i in range(0, glen, 60):
            f.write(s[i:i + 60] + "\n")
    with open(path_faa, "w") as f:
        for i, p in enumerate(prots):
            f.write(f">prot{i}\n{p}\n")


@pytest.mark.parametrize("seed,mode", [
    (101, []), (102, ["--gff"]), (103, ["-j", "2"]), (104, ["--gtf"]),
    (105, ["--aln"]), (106, ["-u"]), (107, ["--trans"]),
    (108, ["--gff-only"]), (109, ["--aln", "--trans"]),
    # non-standard genetic codes end-to-end: -T changes the translation
    # table through index build + DP + output (nasw-tab.c:16-55); the
    # soak mixes these randomly, these two pin them deterministically
    (110, ["-T", "4"]), (111, ["-T", "11", "--gff"]),
])
def test_fuzz_parity(ref_binary, tmp_path, seed, mode):
    rng = np.random.default_rng(seed)
    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    synth(rng, fa, faa)
    ref = subprocess.run([ref_binary, "-t1", *mode, fa, faa],
                         capture_output=True, text=True).stdout
    import contextlib, io
    from miniprot_tpu import cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", *mode, fa, faa]) == 0
    assert buf.getvalue() == ref


@pytest.mark.parametrize("seed,mode", [
    (301, []), (302, ["-j", "0"]), (303, ["-j", "2"]),
    (304, ["--gff", "-j", "1"]),
])
def test_noncanonical_splice_parity(ref_binary, tmp_path, seed, mode):
    """Adversarial splice-site classes (VERDICT r04 #4): GC-AG and
    AT-AC introns plus controlled poly-Y tails (splice model class
    arithmetic at nasw-sse.c:106-155, tables nasw-tab.c:124-129) must
    stay byte-identical under every splice model -j 0/1/2 — AND the
    model must demonstrably decide something on this workload (the -j 0
    output differs from -j 1's), so the parity is not vacuous."""
    from miniprot_tpu.testgen import make_workload
    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=400_000, n_genes=12, seed=seed,
                  n_ctg=2, max_intron=3000, rev_frac=0.3,
                  splice_classes=0.6)
    ref = subprocess.run([ref_binary, "-t1", *mode, fa, faa],
                         capture_output=True, text=True).stdout
    import contextlib, io
    from miniprot_tpu import cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", *mode, fa, faa]) == 0
    assert buf.getvalue() == ref
    if seed == 301:
        alt = subprocess.run([ref_binary, "-t1", "-j", "0", fa, faa],
                             capture_output=True, text=True).stdout
        assert alt != ref, "splice model made no difference: the " \
            "non-canonical classes are not being exercised"


@pytest.mark.parametrize("seed,mode", [(201, []), (202, ["--gff"])])
def test_reverse_strand_parity(ref_binary, tmp_path, seed, mode):
    """Half the genes implanted on the reverse strand."""
    from miniprot_tpu.testgen import make_workload
    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=600_000, n_genes=16, seed=seed,
                  n_ctg=2, max_intron=6000, rev_frac=0.5)
    ref = subprocess.run([ref_binary, "-t1", *mode, fa, faa],
                         capture_output=True, text=True).stdout
    import contextlib, io
    from miniprot_tpu import cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", *mode, fa, faa]) == 0
    assert buf.getvalue() == ref


@pytest.fixture(scope="module")
def fs_workload(tmp_path_factory):
    """Genes with implanted genomic frameshifts (F/G CIGAR ops)."""
    from miniprot_tpu.testgen import make_workload
    d = tmp_path_factory.mktemp("fs")
    fa, faa = str(d / "g.fa"), str(d / "q.faa")
    make_workload(fa, faa, genome_len=3_000_000, n_genes=60, seed=77,
                  n_ctg=2, max_intron=8000, rev_frac=0.3, fs_frac=0.8)
    return fa, faa


@pytest.mark.parametrize("mode", [[], ["--gff"], ["--aln"], ["--trans"],
                                  ["--gtf"]])
def test_frameshift_parity(ref_binary, fs_workload, mode):
    """Byte-parity on frameshift-heavy genes in every output mode (the
    F/G CIGAR, fs counters, and residue renderers)."""
    import contextlib, io as _io
    from miniprot_tpu import cli
    fa, faa = fs_workload
    ref = subprocess.run([ref_binary, "-t1", *mode, fa, faa],
                         capture_output=True, text=True).stdout
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", *mode, fa, faa]) == 0
    assert buf.getvalue() == ref


def test_out_sim_float32_boundary(ref_binary, tmp_path):
    """Regression: option floats live in C `float` fields (miniprot.h:57-69).
    0.99f rounds UP, so with best=900 the out_sim filter threshold is
    891.00000858 and a second hit scoring exactly 891 must be DROPPED;
    a double 0.99 threshold (891.0) would keep it.  Found by the soak
    harness (-u -S, seed 2129301922)."""
    from miniprot_tpu.testgen import make_workload
    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=1253313, n_genes=119, seed=2129301922,
                  n_ctg=3, max_intron=8000, rev_frac=0.4, fs_frac=0.0,
                  mut_rate=0.2)
    mode = ["-u", "-S"]
    ref = subprocess.run([ref_binary, "-t1", *mode, fa, faa],
                         capture_output=True, text=True).stdout
    import contextlib
    import io
    from miniprot_tpu import cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", "-t1", *mode, fa, faa]) == 0
    assert buf.getvalue() == ref


@pytest.mark.parametrize("seed,pmut,mode", [
    (301, 0.0, []),            # perfect retrocopies: near-tie ranking
    (302, 0.0, ["--gff"]),
    (303, 0.02, []),           # mutated retrocopies
])
def test_pseudogene_parity_and_ranking(ref_binary, tmp_path, seed, pmut,
                                       mode):
    """Processed pseudogenes (intronless high-identity retrocopies):
    byte-parity with the reference, AND the anti-pseudogene machinery
    demonstrably fires — for at least one query, a spliced (intron-
    containing) alignment is ranked PRIMARY while an intronless copy of
    the same protein appears as a secondary hit.  Reference analogs:
    dp_max ranking (align.c:102-119) + mp_select_multi_exon
    (hit.c:238-250)."""
    import contextlib
    import io as _io
    import re

    from miniprot_tpu import cli
    from miniprot_tpu.testgen import make_workload
    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=1_500_000, n_genes=24, seed=seed,
                  n_ctg=2, max_exons=6, max_intron=5000, rev_frac=0.5,
                  mut_rate=0.02, pseudo_frac=1.0, pseudo_mut=pmut)
    ref = subprocess.run([ref_binary, "-t1", *mode, fa, faa],
                         capture_output=True, text=True).stdout
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", *mode, fa, faa]) == 0
    out = buf.getvalue()
    assert out == ref
    if mode:
        return
    # ranking check on the PAF: group lines by query, in output order
    # (rank order); the machinery fired if some query's FIRST hit is
    # spliced while a later hit of the same query is intronless
    per_q: dict = {}
    for ln in out.splitlines():
        f = ln.split("\t")
        if len(f) < 12:
            continue
        cg = next((x[5:] for x in f[12:] if x.startswith("cg:Z:")), "")
        per_q.setdefault(f[0], []).append(cg)
    fired = sum(1 for cigs in per_q.values()
                if len(cigs) >= 2 and re.search(r"\d+[NUV]", cigs[0])
                and any(not re.search(r"\d+[NUV]", c) for c in cigs[1:]))
    assert fired >= 3, (
        f"anti-pseudogene ranking never demonstrably fired "
        f"({fired} queries with spliced-primary + intronless-secondary)")


@pytest.mark.parametrize("seed,copt", [
    (301, []),            # defaults: satellite cross-products bind max_ava
    (302, ["-c", "50"]),  # low k-mer occ cap: boxplot + hard cap bind
    (303, ["-c", "10"]),  # cap so tight it demonstrably changes output
    (304, []),            # heavier satellites (see body): max_ava regime
])
def test_repeat_dense_parity(ref_binary, tmp_path, seed, copt):
    """Tandem gene arrays + stop-free satellite repeats: per-k-mer
    occupancy far above normal, so the dynamic per-query boxplot
    max_occ rule (map.c:126-141) and the refine round's max_ava
    cross-product truncation (map.c:53-79) decide which seeds survive.
    Byte-parity proves both truncation heuristics replicate exactly in
    the saturated regime; the -c 10 case additionally asserts the cap
    CHANGED the output vs a default run (the test is not vacuous)."""
    import contextlib
    import io as _io
    from miniprot_tpu import cli
    from miniprot_tpu.testgen import make_workload
    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    sat_copies = (400, 900) if seed == 304 else (100, 500)
    make_workload(fa, faa, genome_len=2_000_000, n_genes=24, seed=seed,
                  n_ctg=2, max_intron=3000, rev_frac=0.4,
                  tandem_frac=0.5, tandem_copies=(3, 9),
                  satellites_per_ctg=2, satellite_copies=sat_copies)
    ref = subprocess.run([ref_binary, "-t1", *copt, fa, faa],
                         capture_output=True, text=True).stdout
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", *copt, fa, faa]) == 0
    assert buf.getvalue() == ref
    if copt == ["-c", "10"]:
        base = subprocess.run([ref_binary, "-t1", fa, faa],
                              capture_output=True, text=True).stdout
        assert base != ref, "-c 10 did not change output: the occ cap " \
                            "never decided anything on this workload"


def test_big_contig_past_2gb_parity(ref_binary, tmp_path):
    """A 2.3 Gbp single contig with a gene island past 2^31 bp: the
    coordinate regime the reference's 32-bit block-binned positions
    exist for (tex/miniprot.tex:172-177, NEWS.md:57) and where int32
    overflow bugs in a numpy/C port would live — block ids, region
    vs/ve, extension windows, the ctg.len - ve strand flip at output.
    The contig is mostly 'N' (no k-mers), so the run is IO-bound, not
    compute-bound (~3 min for both mappers).  Byte-parity required."""
    import contextlib
    import io as _io
    from miniprot_tpu import cli
    from miniprot_tpu.testgen import make_sparse_big_workload
    fa, faa = str(tmp_path / "big.fa"), str(tmp_path / "big.faa")
    n = make_sparse_big_workload(fa, faa)
    assert n >= 6
    ref = subprocess.run([ref_binary, "-t1", fa, faa],
                         capture_output=True, text=True).stdout
    # the far island's hits must actually carry >2^31 coordinates
    assert any(int(ln.split("\t")[7]) > 2**31
               for ln in ref.splitlines() if ln.count("\t") >= 11)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", "-t1", fa, faa]) == 0
    assert buf.getvalue() == ref
