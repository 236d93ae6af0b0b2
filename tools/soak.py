#!/usr/bin/env python
"""Randomized end-to-end parity soak against the reference binary.

Generates synthetic whole-genome workloads (miniprot_tpu.testgen) with
randomized genome size, gene count, contig count, strand mix, genomic
frameshifts and mutation rate, runs BOTH the reference miniprot and
miniprot_tpu under a randomized option mix, and byte-diffs the outputs.
Any divergence writes a repro bundle under --keep-dir and exits nonzero.

Usage:
    python tools/soak.py --runs 100 [--seed0 1] [--ref /tmp/refbuild/miniprot]
                         [--tpu]   # also run the --tpu path when a chip is up

The option mixes cover the output formats, splice models, scoring and
chaining knobs that change behavior (same matrix the fixed tests pin).
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPTION_MIXES = [
    [],
    ["--gff"],
    ["--gtf"],
    ["--aln"],
    ["--trans"],
    ["-u"],
    ["--gff-only"],
    ["-j", "2"],
    ["-j", "0"],
    ["-S"],
    ["-O", "6", "-E", "2"],
    ["-J", "17"],
    ["-F", "30"],
    ["-C", "0"],
    ["-C", "2.5"],
    ["-B", "0"],
    ["-p", "0.3"],
    ["-N", "5"],
    ["--outs", "0.5"],
    ["--outc", "0.6"],
    ["--outn", "2"],
    ["-n", "5"],
    ["-w", "1.5"],
    ["-l", "4"],
    ["-k", "5"],
    ["-M", "0"],
    ["-L", "60"],
    ["--no-cs"],
    ["--max-skip", "5"],
    ["--ie-coef", "1.5"],
    ["-e", "2000"],
    ["-G", "5k"],
    ["--aln", "--trans", "--gff"],
    # non-standard genetic code end-to-end (tables.py implements 1-33;
    # this pins the -T path through index build + DP + output)
    ["-T", "4"],
    ["-T", "11", "--gff"],
    # qname-based GFF ids (format.c:372-374) instead of MP%06d
    ["--gff", "--gff-delim", ":"],
]


def run_one(seed: int, ref_bin: str, use_tpu: bool, keep_dir: str,
            timeout: int = 1200, big: bool = False) -> tuple[bool, bool]:
    """Run one randomized workload; returns (passed, device_engaged).

    device_engaged is True only when the run's stderr shows at least one
    DP batch actually executed on the device ("DP split: N device ...")
    — on --tpu runs that silently fell back to the host (failed relay
    claim, watchdog fallback) it stays False, so the soak tally can
    report how many runs genuinely exercised the chip."""
    from miniprot_tpu.testgen import make_workload
    rng = np.random.default_rng(seed)
    if big:  # whole-genome scale: dynamic max_occ, saturation regimes
        params = dict(
            genome_len=int(rng.integers(5_000_000, 40_000_000)),
            n_genes=int(rng.integers(30, 400)),
            seed=seed,
            n_ctg=int(rng.integers(1, 9)),
            max_exons=int(rng.integers(1, 12)),
            max_intron=int(rng.choice([1000, 20000, 100000])),
            mut_rate=float(rng.choice([0.0, 0.05, 0.15, 0.25])),
            rev_frac=float(rng.choice([0.0, 0.3, 1.0])),
            fs_frac=float(rng.choice([0.0, 0.15, 0.4])),
            splice_classes=float(rng.choice([0.0, 0.3, 0.7])),
        )
    else:
        params = dict(
            genome_len=int(rng.integers(100_000, 3_000_000)),
            n_genes=int(rng.integers(2, 30)),
            seed=seed,
            n_ctg=int(rng.integers(1, 4)),
            max_exons=int(rng.integers(1, 9)),
            max_intron=int(rng.choice([1000, 5000, 20000])),
            mut_rate=float(rng.choice([0.0, 0.02, 0.08, 0.15])),
            rev_frac=float(rng.choice([0.0, 0.3, 1.0])),
            fs_frac=float(rng.choice([0.0, 0.15])),
            splice_classes=float(rng.choice([0.0, 0.3, 0.7])),
        )
    mix = OPTION_MIXES[int(rng.integers(len(OPTION_MIXES)))]
    tmp = tempfile.mkdtemp(prefix="soak")
    fa = os.path.join(tmp, "g.fa")
    faa = os.path.join(tmp, "p.faa")
    try:
        make_workload(fa, faa, **params)
        # ~20% of runs add a randomized external splice-score track
        # (not with -S, which disables splicing)
        if rng.random() < 0.2 and "-S" not in mix:
            spsc = os.path.join(tmp, "s.spsc")
            per_ctg = params["genome_len"] // params["n_ctg"]
            with open(spsc, "w") as f:
                for _ in range(int(rng.integers(10, 200))):
                    ctg = f"ctg{int(rng.integers(params['n_ctg']))}"
                    pos = int(rng.integers(1, max(per_ctg - 2, 2)))
                    strand = "+-"[int(rng.integers(2))]
                    typ = "DA"[int(rng.integers(2))]
                    sc = int(rng.integers(-30, 31))
                    f.write(f"{ctg}\t{pos}\t{strand}\t{typ}\t{sc}\n")
            mix = mix + [f"--spsc={spsc}"]
        def _device_engaged(stderr: bytes) -> bool:
            # pipeline.py logs "DP split: N device / M host calls" on
            # every --tpu run; N > 0 means the chip really ran batches.
            for line in stderr.splitlines():
                if b"DP split:" in line:
                    try:
                        n = int(line.split(b"DP split:")[1].split()[0])
                    except (IndexError, ValueError):
                        return False
                    return n > 0
            return False

        def _demotion_reason(stderr: bytes) -> str:
            """Why a --tpu run did NOT engage the chip (VERDICT r03 #6:
            demotions must be a logged, counted metric, not a mystery).
            Returns the first diagnostic line the engine emitted, or a
            structural classification."""
            markers = (b"WARNING: TPU batch failed",
                       b"WARNING: TPU engine unavailable",
                       b"TPU backend unavailable",
                       b"device collect exceeded",
                       b"daemon error")
            for line in stderr.splitlines():
                if any(m in line for m in markers):
                    return line.decode(errors="replace")[:200]
            for line in stderr.splitlines():
                if b"DP split:" in line:
                    return ("0 device batches, no engine warning "
                            "(all jobs below device thresholds?)")
            return "no DP-split line (engine never constructed)"

        ref = subprocess.run([ref_bin, "-t1", *mix, fa, faa],
                             capture_output=True, timeout=600)
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        extra = env.get("PYTHONPATH", "")
        env["PYTHONPATH"] = repo + (os.pathsep + extra if extra else "")
        args = ["-t1", *mix]
        args.append("--tpu" if use_tpu else "--no-tpu")
        if use_tpu:
            # keep wedged-relay runs moving: fast probe + batch watchdog
            env["MINIPROT_TPU_PROBE_TIMEOUT"] = "30"
            env.setdefault("MINIPROT_TPU_BATCH_TIMEOUT", "45")
        try:
            mine = subprocess.run([sys.executable, "-m", "miniprot_tpu.cli",
                                   *args, fa, faa],
                                  capture_output=True, timeout=timeout,
                                  env=env)
        except subprocess.TimeoutExpired:
            if use_tpu:
                # on --tpu runs this is almost always a wedged device
                # relay, an environmental failure, not a parity
                # divergence; log and keep soaking
                print(f"TIMEOUT at seed {seed} (mix={mix}); relay wedge? "
                      "continuing", flush=True)
                return True, False
            # a host-path timeout is a real hang/livelock: record it as
            # a failure with a repro bundle
            print(f"HOST TIMEOUT at seed {seed} (mix={mix})", flush=True)
            os.makedirs(keep_dir, exist_ok=True)
            dst = os.path.join(keep_dir, f"seed{seed}-timeout")
            shutil.copytree(tmp, dst, dirs_exist_ok=True)
            with open(os.path.join(dst, "info.txt"), "w") as f:
                f.write(f"seed={seed}\nparams={params}\nmix={mix}\n"
                        f"host path TIMEOUT after {timeout}s\n")
            return False, False
        if ref.stdout == mine.stdout and mine.returncode == 0:
            dev = use_tpu and _device_engaged(mine.stderr)
            if use_tpu and not dev:
                print(f"DEMOTED at seed {seed} (mix={mix}): "
                      f"{_demotion_reason(mine.stderr)}", flush=True)
            return True, dev
        os.makedirs(keep_dir, exist_ok=True)
        dst = os.path.join(keep_dir, f"seed{seed}")
        shutil.copytree(tmp, dst, dirs_exist_ok=True)
        with open(os.path.join(dst, "info.txt"), "w") as f:
            f.write(f"seed={seed}\nparams={params}\nmix={mix}\n"
                    f"ref_bytes={len(ref.stdout)} mine_bytes={len(mine.stdout)}\n"
                    f"mine_rc={mine.returncode}\n"
                    f"mine_stderr:\n{mine.stderr.decode()[-3000:]}\n")
        with open(os.path.join(dst, "ref.out"), "wb") as f:
            f.write(ref.stdout)
        with open(os.path.join(dst, "mine.out"), "wb") as f:
            f.write(mine.stdout)
        print(f"DIVERGENCE at seed {seed}: mix={mix} params={params} "
              f"-> repro in {dst}", flush=True)
        return False, use_tpu and _device_engaged(mine.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> int:
    from miniprot_tpu.sysutil import disable_numpy_thp
    disable_numpy_thp()
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=50)
    ap.add_argument("--seed0", type=int, default=int(time.time()) % 100000)
    ap.add_argument("--ref", default="/tmp/refbuild/miniprot")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--keep-dir", default="/tmp/soak_failures")
    ap.add_argument("--timeout", type=int, default=1200,
                    help="per-run CLI timeout (relay wedges on --tpu)")
    ap.add_argument("--big", action="store_true",
                    help="5-40Mb genomes (dynamic max_occ, saturation)")
    ap.add_argument("--daemon", action="store_true",
                    help="start one warm device daemon and route every "
                         "--tpu run through it (no per-run kernel compile)")
    a = ap.parse_args()
    daemon_proc = None
    if a.daemon and a.tpu:
        sock = f"/tmp/soak_daemon_{os.getpid()}.sock"
        daemon_proc = subprocess.Popen(
            [sys.executable, "-m", "miniprot_tpu.daemon",
             "--socket", sock, "--warm"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        deadline = time.time() + 600
        while not os.path.exists(sock):
            if daemon_proc.poll() is not None or time.time() > deadline:
                print("soak: daemon failed to start; runs go direct",
                      flush=True)
                daemon_proc = None
                break
            time.sleep(1)
        if daemon_proc is not None:
            os.environ["MINIPROT_TPU_DAEMON_SOCK"] = sock
            print(f"soak: device daemon warm on {sock}", flush=True)
    t0 = time.time()
    bad = 0
    engaged = 0
    for k in range(a.runs):
        seed = a.seed0 + k
        ok, dev = run_one(seed, a.ref, a.tpu, a.keep_dir, timeout=a.timeout,
                          big=a.big)
        bad += 0 if ok else 1
        engaged += 1 if dev else 0
        if (k + 1) % 10 == 0 or not ok:
            extra = f", {engaged} device-engaged" if a.tpu else ""
            print(f"[{k + 1}/{a.runs}] {bad} divergence(s){extra}, "
                  f"{time.time() - t0:.0f}s", flush=True)
    extra = f", {engaged} device-engaged" if a.tpu else ""
    print(f"done: {a.runs} runs, {bad} divergence(s){extra}")
    if daemon_proc is not None:
        daemon_proc.terminate()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
