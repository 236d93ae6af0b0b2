"""Golden end-to-end tests: byte-equality with reference miniprot on DPP3."""
import io
import pathlib
import subprocess
import sys

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


def run_mine(args, genome, query):
    from miniprot_tpu import cli
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["--no-tpu", *args, genome, query])
    assert rc == 0
    return buf.getvalue()


@pytest.mark.parametrize("mode,golden", [
    ([], "golden_dpp3.paf"),
    (["--gff"], "golden_dpp3.gff"),
    (["--gtf"], "golden_dpp3.gtf"),
    (["--aln"], "golden_dpp3.aln"),
])
def test_dpp3_golden(dpp3_files, mode, golden):
    genome, query = dpp3_files
    out = run_mine(mode, genome, query)
    expected = (GOLDEN / golden).read_text()
    assert out == expected


@pytest.mark.parametrize("mode", [
    ["--trans"], ["-u", "-S"], ["--no-cs"], ["-j", "2"], ["--gff-only"],
    ["-F", "17"], ["-p", "0.5"], ["--gff", "--gff-delim", ":"],
])
def test_dpp3_vs_reference_binary(dpp3_files, ref_binary, mode):
    genome, query = dpp3_files
    ref = subprocess.run([ref_binary, "-t1", *mode, genome, query],
                         capture_output=True, text=True).stdout
    mine = run_mine(mode, genome, query)
    assert mine == ref


def test_index_bytes_vs_reference(dpp3_files, ref_binary, tmp_path):
    genome, _ = dpp3_files
    ref_mpi = tmp_path / "ref.mpi"
    my_mpi = tmp_path / "my.mpi"
    subprocess.run([ref_binary, "-t1", "-d", str(ref_mpi), genome],
                   capture_output=True, check=True)
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import IdxOpt
    idx = Index.build(genome, IdxOpt())
    idx.dump(str(my_mpi))
    assert ref_mpi.read_bytes() == my_mpi.read_bytes()
    # and mapping from a restored index matches too
    idx2 = Index.restore(str(my_mpi))
    assert idx2.n_kb == idx.n_kb
