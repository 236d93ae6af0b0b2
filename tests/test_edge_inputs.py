"""Input edge cases vs the reference binary: empty query sets, ambiguous
residues ('*', 'X', invalid letters), 1-aa proteins, CRLF line endings,
FASTQ queries, gzip inputs, N runs in the genome."""
import contextlib
import io
import subprocess

import pytest


def run_mine(args):
    from miniprot_tpu import cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", *args]) == 0
    return buf.getvalue()


@pytest.fixture(scope="module")
def edge_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    (d / "g.fa").write_text(
        ">ctg1 some comment here\r\nACGTACGTAC\r\nGTACGTACGT\r\n"
        ">ctg2\nTTTTGGGGCCCCAAAANNNNNNNNNNACGTACGTACGTACGTACGTACGT\n")
    (d / "q.faa").write_text(">p1\nMKV*XLLZ\n>p2\nM\n"
                             ">p3\nMKVLLPQRSTAVILMKVLLPQRSTAVIL\n")
    (d / "empty.faa").write_text("")
    (d / "q.fq").write_text("@q1 cmt\nMKVLL\n+\nIIIII\n")
    subprocess.run(["gzip", "-k", "-f", str(d / "g.fa"), str(d / "q.faa")],
                   check=True)
    return d


@pytest.mark.parametrize("qn,extra", [
    ("empty.faa", []), ("q.faa", []), ("q.faa", ["-u"]), ("q.fq", ["-u"])])
def test_edge_inputs_match_reference(ref_binary, edge_files, qn, extra):
    d = edge_files
    ref = subprocess.run([ref_binary, "-t1", *extra, str(d / "g.fa"),
                          str(d / qn)], capture_output=True, text=True).stdout
    assert run_mine([*extra, str(d / "g.fa"), str(d / qn)]) == ref


def test_gzip_inputs_match_reference(ref_binary, edge_files):
    d = edge_files
    ref = subprocess.run([ref_binary, "-t1", str(d / "g.fa.gz"),
                          str(d / "q.faa.gz")],
                         capture_output=True, text=True).stdout
    assert run_mine([str(d / "g.fa.gz"), str(d / "q.faa.gz")]) == ref


def test_long_protein_saturation_parity(ref_binary, tmp_path):
    """A single-exon 6000-aa gene pushes path scores past int16: the
    host DP must reproduce the reference's saturating-int16 behavior."""
    import numpy as np
    from miniprot_tpu.testgen import _aa2codons
    rng = np.random.default_rng(14)
    aa2c = _aa2codons()
    AA = "ARNDCQEGHILKMFPSTWYV"
    plen = 6000
    prot = "".join(rng.choice(list(AA), plen))
    g = list("".join(rng.choice(list("ACGT"), 2000)))
    for ch in prot:
        g.extend(list(aa2c[ch][int(rng.integers(len(aa2c[ch])))]))
    g.extend(list("".join(rng.choice(list("ACGT"), 2000))))
    fa, faa = str(tmp_path / "l.fa"), str(tmp_path / "l.faa")
    open(fa, "w").write(">lg\n" + "".join(g) + "\n")
    p = list(prot)
    for _ in range(150):
        p[int(rng.integers(plen))] = AA[int(rng.integers(20))]
    open(faa, "w").write(">lp\n" + "".join(p) + "\n")
    ref = subprocess.run([ref_binary, "-t1", fa, faa],
                         capture_output=True, text=True).stdout
    assert "AS:i:" in ref
    assert run_mine([fa, faa]) == ref


def test_dbg_no_refine_does_not_crash(dpp3_files):
    """--dbg-no-refine reaches the alignment stage with block-resolution
    anchors; a 1-nt left-extension window used to make the C prep's
    nas-shift length negative (heap smash).  The reference binary itself
    segfaults on larger no-refine workloads (its ns_prep_seq_left has
    the same unguarded memmove, nasw-sse.c:207); ours must complete and
    emit the same (empty) output the reference produces on this input."""
    genome, query = dpp3_files
    out = run_mine(["--dbg-no-refine", genome, query])
    assert out == ""


def test_dbg_aflt_matches_reference(ref_binary, dpp3_files, tmp_path):
    """--dbg-aflt (MP_DBG_MORE_DP): disable anchor filtering and DP each
    region in one call — the reference's internal oracle for the
    anchored DP (align.c:248-257, 303-305).  Byte-parity on DPP3 and on
    a synthetic multi-gene workload."""
    import subprocess

    from miniprot_tpu.testgen import make_workload

    genome, query = dpp3_files
    fa = str(tmp_path / "g.fa")
    faa = str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=200_000, n_genes=8, seed=77,
                  n_ctg=2, max_exons=5, max_intron=2000,
                  mut_rate=0.05, rev_frac=0.4, fs_frac=0.2)
    for g, q in ((genome, query), (fa, faa)):
        ref = subprocess.run([ref_binary, "-t1", "--dbg-aflt", g, q],
                             capture_output=True, text=True).stdout
        assert run_mine(["--dbg-aflt", g, q]) == ref


def test_dbg_anchor_chain_dumps_match_reference(ref_binary, tmp_path):
    """--dbg-anchor / --dbg-chain stderr dumps (map.c:179-184, 113-124)
    byte-match the reference's, pinning the seed and chain internals
    directly (not just the final output)."""
    import subprocess

    from miniprot_tpu.testgen import make_workload

    fa = str(tmp_path / "g.fa")
    faa = str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=150_000, n_genes=5, seed=31,
                  n_ctg=2, max_exons=5, max_intron=2000,
                  mut_rate=0.04, rev_frac=0.5, fs_frac=0.2)

    def dumps(cmd):
        r = subprocess.run(cmd, capture_output=True, text=True)
        lines = [ln for ln in r.stderr.splitlines()
                 if ln.startswith(("X\t", "Y1\t"))]
        return r.stdout, "\n".join(lines)

    ref_out, ref_dump = dumps(
        [ref_binary, "-t1", "--dbg-anchor", "--dbg-chain", fa, faa])
    my_out, my_dump = dumps(
        ["python", "-m", "miniprot_tpu.cli", "-t1", "--no-tpu",
         "--dbg-anchor", "--dbg-chain", fa, faa])
    assert my_dump == ref_dump
    assert my_out == ref_out
    assert ref_dump.count("\n") > 50, "dump unexpectedly small"


def test_inprocess_main_never_hard_exits(edge_files, monkeypatch):
    """cli.main(argv) with a WEDGED device module must return normally:
    the os._exit(0) teardown shortcut is reserved for processes the CLI
    owns (argv=None).  Regression: a wedged-relay probe during pytest
    collection set device.WEDGED and the first in-process cli.main()
    test then killed the whole pytest run with exit code 0 (silently
    truncating the suite while looking green)."""
    import miniprot_tpu.device as dev
    d = edge_files
    monkeypatch.setattr(dev, "WEDGED", True)
    out = run_mine([str(d / "g.fa"), str(d / "q.faa")])
    # reaching this line at all is the point; sanity-check output too
    assert "p3" in out or out == ""
