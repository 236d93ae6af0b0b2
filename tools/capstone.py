"""GRCh38-shaped capstone A/B (VERDICT r04 #2).

Generates the ~3Gbp x 24-contig x ~20k-protein workload
(testgen.make_grch38_workload — hg38 length skew + tandem/satellite/
frameshift/non-canonical-splice classes), then runs

  1. the reference binary          (/tmp/refbuild/miniprot -t1)
  2. our host engine               (cli --no-tpu)
  3. our default engine            (cli, auto-routed; warm daemon if up)

each under /usr/bin/time -v, records wall seconds, proteins/s and PEAK
RSS (the half of the reference paper's table nobody had recorded yet:
15.3-22.5 GB at this scale, tex/miniprot.tex:480-481), asserts PAF
byte-parity between all three, and writes one JSON record that bench.py
merges into the round record as capstone_* fields.

Usage:  python tools/capstone.py [--scale 1.0] [--genes 20000]
                                 [--dir ~/.cache/miniprot_tpu/capstone]
Workload + outputs are cached in --dir; delete it to regenerate.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_BIN = "/tmp/refbuild/miniprot"
RECORD = "record.json"


def _run_timed(cmd, out_path, err_path, env=None):
    """Run cmd, returning (wall_s, peak_rss_kb).  No /usr/bin/time in
    this image, so peak RSS comes from polling the kernel-maintained
    VmHWM high-water mark in /proc/<pid>/status (monotone; a final-
    200ms miss window is the only inaccuracy)."""
    t0 = time.monotonic()
    with open(out_path, "wb") as out, open(err_path, "wb") as err:
        p = subprocess.Popen(cmd, stdout=out, stderr=err, env=env)
        rss_kb = 0
        status = f"/proc/{p.pid}/status"
        while p.poll() is None:
            try:
                with open(status) as f:
                    m = re.search(r"VmHWM:\s+(\d+) kB", f.read())
                if m:
                    rss_kb = max(rss_kb, int(m.group(1)))
            except OSError:
                pass
            time.sleep(0.2)
        rc = p.returncode
    wall = time.monotonic() - t0
    if rc != 0:
        with open(err_path, "rb") as f:
            tail = f.read().decode("utf-8", "replace")
        raise RuntimeError(f"{cmd[0]} rc={rc}: {tail[-800:]}")
    return wall, rss_kb


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--genes", type=int, default=20_000)
    ap.add_argument("--dir", default=os.path.expanduser(
        "~/.cache/miniprot_tpu/capstone"))
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-default", action="store_true")
    args = ap.parse_args(argv)
    d = args.dir
    os.makedirs(d, exist_ok=True)
    fa = os.path.join(d, "genome.fa")
    faa = os.path.join(d, "query.faa")
    meta_p = os.path.join(d, "meta.json")

    if not (os.path.exists(fa) and os.path.exists(meta_p)):
        from miniprot_tpu.testgen import make_grch38_workload
        print(f"[capstone] generating scale={args.scale} "
              f"genes={args.genes} ...", flush=True)
        t0 = time.monotonic()
        n_prot = make_grch38_workload(fa, faa, scale=args.scale,
                                      total_genes=args.genes)
        meta = {"scale": args.scale, "n_proteins": n_prot,
                "genome_bytes": os.path.getsize(fa),
                "gen_wall_s": round(time.monotonic() - t0, 1)}
        json.dump(meta, open(meta_p, "w"))
        print(f"[capstone] generated {n_prot} proteins, "
              f"{meta['genome_bytes']/1e9:.2f} GB fasta in "
              f"{meta['gen_wall_s']}s", flush=True)
    meta = json.load(open(meta_p))
    n_prot = meta["n_proteins"]

    rec = {"capstone_scale": meta["scale"],
           "capstone_n_contigs": 24,
           "capstone_n_proteins": n_prot,
           "capstone_genome_gb": round(meta["genome_bytes"] / 1e9, 2)}
    rec_path = os.path.join(d, RECORD)
    if os.path.exists(rec_path):
        rec.update(json.load(open(rec_path)))

    def record(tag, wall, rss_kb):
        rec[f"capstone_{tag}_wall_s"] = round(wall, 1)
        rec[f"capstone_{tag}_rss_gb"] = round((rss_kb or 0) / 1e6, 2)
        rec[f"capstone_{tag}_prot_per_s"] = round(n_prot / wall, 1)
        json.dump(rec, open(rec_path, "w"), indent=1)
        print(f"[capstone] {tag}: wall={wall:.0f}s "
              f"rss={rec[f'capstone_{tag}_rss_gb']}GB "
              f"{rec[f'capstone_{tag}_prot_per_s']}/s", flush=True)

    env = dict(os.environ)

    if not args.skip_ref and "capstone_ref_wall_s" not in rec:
        print("[capstone] reference run ...", flush=True)
        wall, rss = _run_timed([REF_BIN, "-t1", fa, faa],
                               os.path.join(d, "ref.paf"),
                               os.path.join(d, "ref.err"))
        record("ref", wall, rss)

    if "capstone_host_wall_s" not in rec:
        print("[capstone] host engine run ...", flush=True)
        wall, rss = _run_timed(
            [sys.executable, "-m", "miniprot_tpu.cli", "--no-tpu", "-t1",
             fa, faa],
            os.path.join(d, "host.paf"), os.path.join(d, "host.err"),
            env=env)
        record("host", wall, rss)

    if not args.skip_default and "capstone_default_wall_s" not in rec:
        print("[capstone] default (auto-routed) engine run ...", flush=True)
        wall, rss = _run_timed(
            [sys.executable, "-m", "miniprot_tpu.cli", fa, faa],
            os.path.join(d, "default.paf"), os.path.join(d, "default.err"),
            env=env)
        record("default", wall, rss)

    ok = True
    ref_paf = os.path.join(d, "ref.paf")
    for tag in ("host", "default"):
        p = os.path.join(d, f"{tag}.paf")
        if os.path.exists(ref_paf) and os.path.exists(p):
            same = subprocess.run(["cmp", "-s", ref_paf, p]).returncode == 0
            rec[f"capstone_{tag}_parity"] = same
            ok &= same
    json.dump(rec, open(rec_path, "w"), indent=1)
    print(json.dumps(rec), flush=True)
    print(f"[capstone] parity: {'OK' if ok else 'MISMATCH'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
