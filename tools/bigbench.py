"""Big-workload end-to-end benchmark with device-time accounting.

Measures the BASELINE north-star metric (proteins aligned/sec/chip) on a
whole-genome-scale synthetic workload (default 200Mb x 2000 proteins,
the same scale as the README's host-path A/B), with the `--tpu` device
engine, and records everything needed to separate chip time from relay
time on this relay-attached dev machine:

  - wall-clock proteins/s for the map stage and end-to-end
  - device_blocked_s: wall time the driver thread spent inside device
    launches/collects/fetches (includes relay RTTs + on-chip compute)
  - device_round_trips + an independently measured per-RTT cost
  - DP cell split (host vs device, ext vs cigar)
  - co-located projection: map_wall - device_blocked_s + est. kernel
    compute time (cells / measured kernel GCUPS) — what the same run
    costs when the chip is attached locally instead of via the relay

Usage: python tools/bigbench.py [--genome-mb 200] [--n-genes 2000]
       [--no-tpu] [--threads 1] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_rtt(n: int = 12) -> float:
    """Median seconds for one minimal device round trip (4-byte put+get)."""
    import jax
    import numpy as np
    x = np.zeros(1, np.int32)
    d = jax.device_put(x)
    np.asarray(d)  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        d = jax.device_put(x)
        np.asarray(d)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=int, default=200)
    ap.add_argument("--n-genes", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--no-tpu", action="store_true")
    ap.add_argument("--route", choices=("tpu", "host", "auto"),
                    default=None,
                    help="engine selection: tpu = device engine forced "
                         "(default), host = host engine (same as "
                         "--no-tpu), auto = the CLI's default measured "
                         "routing probe decides (pipeline._route_probe)")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--keep", help="directory to keep workload + output in")
    ap.add_argument("--keep-index", action="store_true",
                    help="with --keep: dump the built index to the keep "
                         "dir and restore it on later runs (skips the "
                         "200Mb index build, ~1 min, on warm bench runs)")
    ap.add_argument("--out", help="write the JSON record here too")
    ap.add_argument("--cold", action="store_true",
                    help="skip the warm-up pass (measure cold-start: jit "
                         "tracing of every shape variant lands in the "
                         "timed run)")
    ap.add_argument("--warm-n", type=int, default=80,
                    help="queries in the warm-up pass")
    ap.add_argument("--daemon-sock", default=None,
                    help="route device batches through a running device "
                         "daemon on this unix socket (see "
                         "miniprot_tpu/daemon.py); the daemon's async "
                         "launcher overlaps relay uploads with host work")
    ap.add_argument("--ext-gcups", type=float, default=0.0,
                    help="measured ext kernel GCUPS for the projection "
                         "(0 = use bench history fallback 35.7)")
    ap.add_argument("--cig-gcups", type=float, default=0.0,
                    help="measured CIGAR kernel GCUPS for the projection "
                         "(0 = use bench history fallback)")
    args = ap.parse_args()

    from miniprot_tpu.sysutil import disable_numpy_thp, profiler
    disable_numpy_thp()
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.pipeline import map_file
    from miniprot_tpu.testgen import make_workload

    td = args.keep or tempfile.mkdtemp(prefix="bigbench-")
    os.makedirs(td, exist_ok=True)
    fa = os.path.join(td, "g.fa")
    faa = os.path.join(td, "q.faa")
    rec: dict = {"genome_mb": args.genome_mb, "n_genes_requested": args.n_genes}

    # a kept workload is only reusable when it was generated with the
    # same parameters; the meta file guards against a stale keep dir
    meta_path = os.path.join(td, "workload.json")
    meta = {"genome_mb": args.genome_mb, "n_genes": args.n_genes,
            "seed": args.seed}
    kept = False
    if args.keep and os.path.exists(fa) and os.path.exists(faa):
        try:
            with open(meta_path) as f:
                kept = json.load(f) == meta
        except (OSError, ValueError):
            kept = False
    t0 = time.perf_counter()
    if not kept:
        n = make_workload(fa, faa, genome_len=args.genome_mb * 1_000_000,
                          n_genes=args.n_genes, seed=args.seed, n_ctg=4,
                          max_intron=20_000, rev_frac=0.5, fs_frac=0.1)
        rec["n_proteins"] = n
        if args.keep:
            with open(meta_path, "w") as f:
                json.dump(meta, f)
    else:
        rec["n_proteins"] = sum(1 for ln in open(faa) if ln.startswith(">"))
    rec["gen_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    mpi = os.path.join(td, "g.mpi")
    mi = None
    if args.keep_index and kept and os.path.exists(mpi):
        try:
            mi = Index.restore(mpi)
            rec["index_restored"] = True
        except Exception as e:   # e.g. a truncated dump from a killed
            print(f"bigbench: kept index unusable ({e!r}); rebuilding",
                  file=sys.stderr)
            os.unlink(mpi)
    if mi is None:
        mi = Index.build(fa, IdxOpt())
        if args.keep_index and args.keep:
            # atomic: a run killed mid-dump must not poison the cache
            mi.dump(mpi + ".tmp")
            os.replace(mpi + ".tmp", mpi)
    rec["index_build_s"] = round(time.perf_counter() - t0, 2)

    daemon_probe = None
    if args.daemon_sock:
        os.environ["MINIPROT_TPU_DAEMON_SOCK"] = args.daemon_sock
        os.environ.pop("MINIPROT_TPU_DAEMON", None)
        from miniprot_tpu.daemon import DaemonClient
        daemon_probe = DaemonClient.maybe_connect(args.daemon_sock)
        rec["daemon"] = daemon_probe is not None
        if daemon_probe is None:
            print("bigbench: daemon socket dead; running direct",
                  file=sys.stderr)
    route = args.route or ("host" if args.no_tpu else "tpu")
    use_tpu = route != "host"
    rtt = 0.0
    if use_tpu:
        # a daemon-attached client never initializes a local backend
        # (batches ship over the socket, results come back decoded), so
        # a reachable daemon keeps the device path available even when
        # the local relay claim fails (brownout) — only a daemon-less
        # run needs the in-process backend
        from miniprot_tpu.kernels import probe_backend_guarded
        have_local = probe_backend_guarded()
        if have_local:
            rtt = measure_rtt()
        elif daemon_probe is None:
            print("bigbench: no live TPU backend and no daemon; "
                  "running host path", file=sys.stderr)
            use_tpu = False
        else:
            print("bigbench: local backend unavailable; device work "
                  "runs daemon-side only", file=sys.stderr)
    rec["use_tpu"] = use_tpu
    rec["route"] = route
    rec["relay_rtt_s"] = round(rtt, 4)

    if use_tpu and not args.cold:
        # warm-up: map a small subset first so jit tracing + kernel
        # compiles of the common shape buckets (one-time per process,
        # ~0.3s of pure-Python trace per variant plus relay-side
        # compile fetches) do not land in the timed run — steady-state
        # is what a serving deployment sees.  Residual cold shapes in
        # the big run still count against it.
        import io as _io
        import itertools
        warm_faa = os.path.join(td, "warm.faa")
        with open(faa) as src, open(warm_faa, "w") as dst:
            take = args.warm_n * 2  # name+seq lines
            dst.writelines(itertools.islice(src, take))
        t0 = time.perf_counter()
        map_file(mi, warm_faa, MapOpt(), n_threads=args.threads,
                 out=_io.StringIO(), use_tpu=True)
        rec["warmup_s"] = round(time.perf_counter() - t0, 2)

    profiler.enabled = True
    profiler.device_blocked_s = 0.0
    profiler.device_exposed_s = 0.0
    profiler.device_round_trips = 0
    profiler.wave_samples = []
    profiler.flush_rounds = 0
    profiler.cells_host = profiler.cells_tpu = 0
    profiler.cells_tpu_ext = profiler.cells_tpu_cig = 0
    profiler.cells_tpu_cig_small = 0
    profiler.n_dp_host = profiler.n_dp_tpu = 0
    stats: dict = {}
    out_path = os.path.join(td, "out.paf")
    d0 = daemon_probe.ping() if daemon_probe is not None else None
    t0 = time.perf_counter()
    with open(out_path, "w") as out:
        n_mapped = map_file(mi, faa, MapOpt(), n_threads=args.threads,
                            out=out,
                            use_tpu="auto" if (use_tpu and route == "auto")
                            else use_tpu, stats=stats)
    map_wall = time.perf_counter() - t0
    if daemon_probe is not None:
        # daemon-side device duty cycle over the timed run: how much of
        # the wall the chip path (uploads+dispatch / fetch+decode) was
        # actually busy — the number VERDICT r02 said nobody had
        d1 = daemon_probe.ping()
        if "launch_busy_s" in d1 and "launch_busy_s" in d0:
            rec["daemon_launch_busy_s"] = round(
                d1["launch_busy_s"] - d0["launch_busy_s"], 2)
            rec["daemon_collect_busy_s"] = round(
                d1["collect_busy_s"] - d0["collect_busy_s"], 2)
            rec["daemon_duty_cycle"] = round(
                (rec["daemon_launch_busy_s"] + rec["daemon_collect_busy_s"])
                / max(map_wall, 1e-9), 3)
        daemon_probe.close()
    rec["n_mapped"] = n_mapped
    rec["map_wall_s"] = round(map_wall, 2)
    rec["proteins_per_sec_wall"] = round(n_mapped / map_wall, 2)
    rec["device_blocked_s"] = round(profiler.device_blocked_s, 2)
    rec["device_exposed_s"] = round(profiler.device_exposed_s, 2)
    rec["device_round_trips"] = profiler.device_round_trips
    rec["cells_tpu_ext"] = profiler.cells_tpu_ext
    rec["cells_tpu_cig"] = profiler.cells_tpu_cig
    rec["cells_tpu_cig_small"] = profiler.cells_tpu_cig_small
    rec["cells_host"] = profiler.cells_host
    rec["n_dp_tpu"] = profiler.n_dp_tpu
    rec["n_dp_host"] = profiler.n_dp_host
    rec.update({k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in stats.items()})

    if use_tpu:
        ext_g = args.ext_gcups or 35.7   # BENCH_r02 kernel-time rate
        cig_g = args.cig_gcups or 2.0    # device-time rate (see bench.py)
        kernel_s = (profiler.cells_tpu_ext / 1e9 / ext_g
                    + profiler.cells_tpu_cig / 1e9 / cig_g)
        rec["est_kernel_compute_s"] = round(kernel_s, 2)
        # collect waves run overlapped with host work, so only the
        # residual join stalls (device_exposed_s) lengthened the wall.
        # Conservative projection: remove those stalls, charge the full
        # kernel compute serially.  Optimistic bound: a co-located chip
        # overlaps kernels with host work perfectly, so the wall is
        # max(host residue, kernel time).  The truth sits between.
        host_side = map_wall - profiler.device_exposed_s
        proj = host_side + kernel_s
        rec["colocated_projection_s"] = round(proj, 2)
        rec["proteins_per_sec_chip_projected"] = round(n_mapped / proj, 2)
        rec["proteins_per_sec_chip_projected_max"] = round(
            n_mapped / max(host_side, kernel_s, 1e-9), 2)
        rec["relay_overhead_s"] = round(
            profiler.device_blocked_s - kernel_s, 2)
        # relay floor analysis (VERDICT r04 #3): generator flush rounds
        # are SEQUENTIAL (each round's results feed the next round's
        # requests), so the device path's wall can never drop below
        # flush_rounds x the cheapest observed wave — however perfectly
        # host work overlaps.  relay_floor_s against the host/device
        # wall gap settles whether device > host is reachable on this
        # fabric or only on a co-located attachment.
        ws = sorted(profiler.wave_samples)
        rec["flush_rounds"] = profiler.flush_rounds
        if ws:
            rec["wave_cost_min_s"] = round(ws[0], 4)
            rec["wave_cost_med_s"] = round(ws[len(ws) // 2], 4)
            rec["wave_cost_p90_s"] = round(ws[int(len(ws) * 0.9)], 4)
            rec["n_waves"] = len(ws)
            rec["relay_floor_s"] = round(profiler.flush_rounds * ws[0], 2)

    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
