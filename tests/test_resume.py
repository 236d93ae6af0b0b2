"""Checkpoint/resume of mapping runs (-o FILE --resume).

Mini-batches are idempotent work units; the journal records
(batch, n_mapped, id_counter, offset) after each one, so a killed run
restarted with the same command produces byte-identical output to an
uninterrupted run (incl. GFF ID numbering across the resume boundary).
"""
import os
import subprocess
import sys

import pytest

from miniprot_tpu.testgen import make_workload


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    d = tmp_path_factory.mktemp("rs")
    fa, faa = str(d / "g.fa"), str(d / "q.faa")
    make_workload(fa, faa, genome_len=300_000, n_genes=24, seed=11, n_ctg=2,
                  max_intron=4000)
    return fa, faa


def run_cli(args):
    args = ["--no-tpu", *args]
    return subprocess.run([sys.executable, "-m", "miniprot_tpu.cli", *args],
                          capture_output=True, text=True, cwd="/root/repo")


@pytest.mark.parametrize("mode", [[], ["--gff"]])
def test_resume_matches_uninterrupted(tmp_path, workload, mode):
    fa, faa = workload
    full = tmp_path / "full.out"
    part = tmp_path / "part.out"
    # -K 2k -> many mini-batches
    r = run_cli(["-t1", "-K", "2k", *mode, "-o", str(full), fa, faa])
    assert r.returncode == 0, r.stderr
    # interrupted first run: stop after ~3 batches via a query-file prefix?
    # simpler: run with --resume, then truncate the journal to batch 2 and
    # the output to that batch's offset (exactly the on-disk state a kill
    # after batch 2 leaves behind), then resume.
    r = run_cli(["-t1", "-K", "2k", *mode, "--resume", "-o", str(part), fa, faa])
    assert r.returncode == 0, r.stderr
    ck = str(part) + ".ckpt"
    lines = open(ck).read().splitlines()
    assert len(lines) >= 4, "expected several mini-batches"
    keep = lines[:3]
    off = int(keep[-1].split("\t")[3])
    with open(ck, "w") as f:
        f.write("\n".join(keep) + "\n")
    with open(part, "r+") as f:
        f.truncate(off)
    r = run_cli(["-t1", "-K", "2k", *mode, "--resume", "-o", str(part), fa, faa])
    assert r.returncode == 0, r.stderr
    assert part.read_bytes() == full.read_bytes()
    # resuming a completed run is a no-op
    before = part.read_bytes()
    r = run_cli(["-t1", "-K", "2k", *mode, "--resume", "-o", str(part), fa, faa])
    assert r.returncode == 0, r.stderr
    assert part.read_bytes() == before


def test_resume_partial_journal_line(tmp_path, workload):
    """A torn (partial) last journal line is ignored."""
    fa, faa = workload
    out = tmp_path / "o.out"
    r = run_cli(["-t1", "-K", "2k", "--resume", "-o", str(out), fa, faa])
    assert r.returncode == 0, r.stderr
    want = out.read_bytes()
    ck = str(out) + ".ckpt"
    lines = open(ck).read().splitlines()
    off = int(lines[1].split("\t")[3])
    with open(ck, "w") as f:
        f.write("\n".join(lines[:2]) + "\n12\t34")  # torn write, no newline/fields
    with open(out, "r+") as f:
        f.truncate(off)
    r = run_cli(["-t1", "-K", "2k", "--resume", "-o", str(out), fa, faa])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == want


def test_resume_empty_journal_truncates_partial_output(tmp_path, workload):
    """A crash before the first journal entry leaves a partial output
    file and an empty journal; resume must not leave stale bytes."""
    fa, faa = workload
    out = tmp_path / "o.out"
    r = run_cli(["-t1", "-K", "2k", "--resume", "-o", str(out), fa, faa])
    assert r.returncode == 0, r.stderr
    want = out.read_bytes()
    with open(str(out) + ".ckpt", "w"):
        pass  # empty journal
    with open(out, "ab") as f:
        f.write(b"X" * (len(want) + 500))  # longer partial garbage
    r = run_cli(["-t1", "-K", "2k", "--resume", "-o", str(out), fa, faa])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == want
