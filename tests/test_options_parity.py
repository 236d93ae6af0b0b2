"""CLI option parity vs the reference binary on a synthetic workload."""
import contextlib
import io
import subprocess

import numpy as np
import pytest

from miniprot_tpu.testgen import make_workload


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    d = tmp_path_factory.mktemp("wl")
    fa, faa = str(d / "g.fa"), str(d / "q.faa")
    make_workload(fa, faa, genome_len=400_000, n_genes=16, seed=9,
                  n_ctg=2, max_intron=8000)
    # a splice-score file covering both contigs
    rng = np.random.default_rng(5)
    with open(d / "s.spsc", "w") as f:
        for ctg in ("ctg0", "ctg1"):
            for p in rng.integers(1, 200_000, 800):
                f.write(f"{ctg}\t{p}\t{'+-'[int(rng.integers(2))]}\t"
                        f"{'DA'[int(rng.integers(2))]}\t{int(rng.integers(-20, 30))}\n")
    return fa, faa, str(d / "s.spsc")


def run_mine(args):
    from miniprot_tpu import cli
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert cli.main(["--no-tpu", *args]) == 0
    return buf.getvalue()


@pytest.mark.parametrize("mode", [
    [], ["-T", "2"], ["-T", "5"], ["-G", "5k"], ["-I"], ["-n", "5", "-m", "20"],
    ["-k", "5", "-M", "0"], ["--no-pre-chain"], ["-O", "15", "-E", "2"],
    ["-J", "40"], ["--J2", "9"], ["-B", "0"], ["--xdrop", "50"],
    ["-p", "0.4", "-N", "5"], ["--outn", "2"], ["-j", "0"], ["-A"],
    ["--max-intron-out", "5k"], ["--no-cs"], ["-K", "100k"],
    ["--gff", "--gff-delim", "|"], ["--gff", "-P", "XX"],
    ["--outs", "0.5", "--outc", "0.3"], ["--ie-coef", "2.0"],
    ["--max-skip", "5"], ["-L", "15"], ["-b", "6"], ["-c", "50"],
    ["-C", "0.5"], ["-C", "0"], ["-C", "2.5"], ["-F", "30"],
    ["-e", "3000"], ["-g", "800"], ["-w", "1.25"],
])
def test_flag_parity(ref_binary, workload, mode):
    fa, faa, _ = workload
    ref = subprocess.run([ref_binary, "-t1", *mode, fa, faa],
                         capture_output=True, text=True).stdout
    assert run_mine([*mode, fa, faa]) == ref


@pytest.mark.parametrize("mode", [
    ["--spsc={spsc}"],
    ["--spsc={spsc}", "-j", "2"],
    ["--spsc={spsc}", "--spsc0=-3"],
    ["--spsc={spsc}", "-J", "35"],
])
def test_spsc_parity(ref_binary, workload, mode):
    fa, faa, spsc = workload
    mode = [m.format(spsc=spsc) for m in mode]
    ref = subprocess.run([ref_binary, "-t1", *mode, fa, faa],
                         capture_output=True, text=True).stdout
    assert run_mine([*mode, fa, faa]) == ref
