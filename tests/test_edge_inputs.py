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
        assert cli.main(list(args)) == 0
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
