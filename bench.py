"""Benchmark: sustained GCUPS of the Pallas splice/frameshift DP kernel
plus the end-to-end north-star metric with device-time accounting.

Prints one JSON line:
  {"metric": "nasw_dp_gcups", "value": N, "unit": "GCUPS",
   "vs_baseline": R,
   "ext_gcups_reps": [...], "ext_gcups_spread": S,   # run-to-run drift
   "cigar_gcups_device": C,       # CIGAR kernel incl. on-device walk
   "e2e_n_proteins": 2000,        # 200Mb x 2000 whole-genome workload
   "proteins_per_sec_chip": W,    # wall-clock through the dev relay
   "proteins_per_sec_chip_projected": P,  # co-located projection
   "e2e_device_blocked_s"/"e2e_relay_overhead_s"/...: accounting}

vs_baseline is the ratio against one CPU core of the reference
implementation running its SSE nasw kernel on the same machine
(measured 0.50-1.05 GCUPS here; re-measured live when the reference
binary is available).  The paper target is >=10x a reference core.
Kernel rates are device-time (queued kernels bounded by one fetch);
the e2e wall number includes the dev container's relay latency, which
the projection (wall - device-blocked + estimated kernel time)
removes — see tools/bigbench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import time

import numpy as np

REF_CORE_GCUPS_FALLBACK = 0.50  # measured: /tmp/refbench 10000 500 50 1


def measure_ref_core() -> float:
    """Measure the reference nasw kernel on one CPU core if available."""
    try:
        if not os.path.exists("/tmp/refbuild/libminiprot.a"):
            if not os.path.isdir("/root/reference"):
                return REF_CORE_GCUPS_FALLBACK
            subprocess.run(
                "mkdir -p /tmp/refbuild && cp -r /root/reference/* /tmp/refbuild/"
                " && make -C /tmp/refbuild -j8 >/dev/null 2>&1",
                shell=True, check=True, timeout=120)
        src = r"""
#include <stdio.h>
#include <stdlib.h>
#include <time.h>
#include "nasw.h"
int main() {
    int nl = 10000, al = 500, iters = 50;
    char *ns = malloc(nl), *as = malloc(al);
    ns_opt_t opt; ns_rst_t r;
    srand(7);
    for (int i = 0; i < nl; ++i) ns[i] = "ACGT"[rand()&3];
    for (int i = 0; i < al; ++i) as[i] = "ARNDCQEGHILKMFPSTWYV"[rand()%20];
    /* score-only, x-drop off: the mode directly comparable to the
       Pallas kernel (which also runs score-only over the full
       rectangle in this benchmark) */
    ns_make_tables(1); ns_opt_init(&opt); opt.flag = 0; opt.xdrop = 1<<28;
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    long cells = 0;
    for (int it = 0; it < iters; ++it) {
        ns_rst_init(&r);
        ns_global_gs16b(0, ns, nl, as, al, &opt, 0, &r);
        cells += (long)nl * al;
        if (r.cigar) free(r.cigar);
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    printf("%.4f\n", cells / dt / 1e9);
    return 0;
}
"""
        with open("/tmp/_refgcups.c", "w") as f:
            f.write(src)
        subprocess.run(
            "gcc -O3 -std=gnu99 -I/tmp/refbuild /tmp/_refgcups.c -o /tmp/_refgcups"
            " -L/tmp/refbuild -lminiprot -lz -lm -lpthread",
            shell=True, check=True, timeout=60)
        out = subprocess.run(["/tmp/_refgcups"], capture_output=True, text=True,
                             timeout=120, check=True)
        return float(out.stdout.strip())
    except Exception:
        return REF_CORE_GCUPS_FALLBACK


def measure_pallas_gcups(detail: dict | None = None) -> float:
    """Device-time GCUPS of the extension kernel: queue `iters` kernels
    back-to-back, bound them with ONE small fetch (the device executes
    queued kernels serially, so per-kernel relay latency is excluded).
    Runs 3 repetitions and reports the median + spread via `detail` so
    run-to-run relay drift is visible in the round record."""
    import jax

    from miniprot_tpu.kernels import nasw_pallas as nk

    on_tpu = jax.default_backend() == "tpu"
    AL, B = 512, nk.B_LANES
    # interpret mode (no TPU present) runs ~10^4x slower: shrink the
    # problem so the benchmark still completes and reports a rate
    NL = ((10240 if on_tpu else 264) + nk.ROW_CHUNK - 1) // nk.ROW_CHUNK * nk.ROW_CHUNK
    if not on_tpu:
        AL = 64
    # xdrop disabled so every genome row is genuinely computed (random
    # inputs must not be allowed to trip the early exit)
    call = nk._compiled_ext(AL, NL, not on_tpu)
    rng = np.random.default_rng(1)
    opts = nk._opts_array(11, 1, 23, 1 << 28, 5)
    nas = rng.integers(0, 20, (NL, B)).astype(np.int8)
    D = rng.integers(0, 31, (NL + 8, B)).astype(np.int16)
    A = rng.integers(0, 31, (NL + 8, B)).astype(np.int16)
    logpen = np.zeros((NL, B), np.int8)
    nlv = np.full((8, B), NL, np.int32)
    prof = rng.integers(0, 2**31 - 1, (6, AL, B)).astype(np.int32)
    em = np.zeros((AL, B), np.int8)
    em[AL - 1] = 1
    qpad = np.zeros((AL, B), np.int8)
    args = [jax.device_put(x) for x in
            (nas, D, A, logpen, nlv, opts, prof, em, qpad)]
    r = call(*args)
    np.asarray(r[0])  # force full execution + transfer (warm-up)
    iters = 20 if on_tpu else 2
    reps = 3 if on_tpu else 1
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = call(*args)
        np.asarray(r[0])
        dt = (time.perf_counter() - t0) / iters
        rates.append(NL * AL * B / dt / 1e9)
    rates.sort()
    if detail is not None:
        detail["ext_gcups_reps"] = [round(x, 2) for x in rates]
        detail["ext_gcups_spread"] = round(rates[-1] - rates[0], 2)
    return rates[len(rates) // 2]


def measure_cigar_kernel_gcups() -> dict:
    """Device-time GCUPS of the full-traceback CIGAR kernel including
    the on-device traceback walk (the dtb path the product uses): queue
    K batches, bound with one small fetch of the LAST batch's outputs —
    per-batch relay latency excluded, so this is the chip's rate.
    Measured at both production shape classes: the small anchored-gap
    class (al<=32 x 2048 rows) and the large class (al<=128 x 8192)
    that carries most CIGAR cells on whole-genome runs."""
    import jax

    from miniprot_tpu import tables
    from miniprot_tpu.kernels import nasw_cigar_pallas as ck

    on_tpu = jax.default_backend() == "tpu"
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    rng = np.random.default_rng(5)

    def mk(AL, NL):
        batch = ck.RawCigarBatch(AL, NL, mat, (11, 1, 23, 29, 100, 5, 0.5),
                                 sp=sp, trans_code=1)
        for _ in range(ck.B):
            batch.add_raw(rng.integers(0, 4, NL).astype(np.uint8),
                          rng.integers(0, 20, AL).astype(np.uint8), io=29)
        return batch

    shapes = (((32, 2048, 6), (128, 8192, 4)) if on_tpu
              else ((16, 256, 1),))
    rates = []
    for AL, NL, K in shapes:
        b = mk(AL, NL)
        h = b.launch(interpret=not on_tpu)
        jax.device_get(h[1:])        # warm-up / compile
        batches = [mk(AL, NL) for _ in range(K)]
        t0 = time.perf_counter()
        handles = [bt.launch(interpret=not on_tpu) for bt in batches]
        jax.device_get(handles[-1][1:])
        dt = time.perf_counter() - t0
        rates.append(round(NL * AL * ck.B * K / dt / 1e9, 2))
    return {"cigar_gcups_device_small": rates[0],
            "cigar_gcups_device": rates[-1]}


def measure_e2e_big() -> dict:
    """End-to-end mapping throughput on the whole-genome-scale workload
    (200Mb x 2000 proteins) via tools/bigbench.py in a subprocess, with
    full device-time accounting: wall proteins/s, device-blocked
    seconds, round trips, relay RTT, DP cell split, and the co-located
    projection.  The workload matches the README's host-path A/B so the
    host (23.0s map, 86.9/s) and reference-binary numbers are directly
    comparable.

    Runs through a warm device daemon (the production deployment shape:
    kernels compiled once, async launcher overlapping relay uploads
    with host work — measured 2.7x the direct wall rate); if the daemon
    fails to come up the run goes direct, exactly as before."""
    import sys
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bigbench.py")
    sock = f"/tmp/bench_daemon_{os.getpid()}.sock"
    daemon = subprocess.Popen(
        [sys.executable, "-m", "miniprot_tpu.daemon",
         "--socket", sock, "--warm"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    deadline = time.time() + 600
    while not os.path.exists(sock):
        if daemon.poll() is not None or time.time() > deadline:
            print("bench: daemon failed to start; e2e runs direct",
                  file=sys.stderr)
            daemon = None
            break
        time.sleep(1)
    args = [sys.executable, tool, "--genome-mb", "200",
            "--n-genes", "2000"]
    if daemon is not None:
        args += ["--daemon-sock", sock]
    try:
        out = subprocess.run(args, capture_output=True, text=True,
                             timeout=1800)
    finally:
        if daemon is not None:
            daemon.terminate()
    if out.returncode != 0:
        raise RuntimeError(f"bigbench failed: {out.stderr[-400:]}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    return {
        "e2e_n_proteins": rec.get("n_proteins"),
        "e2e_map_wall_s": rec.get("map_wall_s"),
        "e2e_daemon": rec.get("daemon", False),
        "proteins_per_sec_chip": rec.get("proteins_per_sec_wall"),
        "proteins_per_sec_chip_projected":
            rec.get("proteins_per_sec_chip_projected"),
        "e2e_device_blocked_s": rec.get("device_blocked_s"),
        "e2e_device_round_trips": rec.get("device_round_trips"),
        "e2e_relay_rtt_s": rec.get("relay_rtt_s"),
        "e2e_relay_overhead_s": rec.get("relay_overhead_s"),
        "e2e_daemon_duty_cycle": rec.get("daemon_duty_cycle"),
        "dp_cells_device_fraction": rec.get("device_fraction"),
    }


def _measure_in_subprocess() -> float:
    """Fresh-interpreter measurement: a failed relay claim at process
    start is fatal for the whole process (the backend never registers),
    so in-process retries cannot recover from it."""
    import sys
    out = subprocess.run([sys.executable, os.path.abspath(__file__),
                          "--measure-only"],
                         capture_output=True, text=True, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(f"subprocess bench failed: {out.stderr[-500:]}")
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    from miniprot_tpu.sysutil import disable_numpy_thp, \
        ensure_responsive_backend
    disable_numpy_thp()
    import sys
    # the benchmark is the round's permanent record: if the device relay
    # is wedged right now, ride it out for up to ~30 min before failing
    # (wedges observed here are transient).  A "wedged" verdict demotes
    # this process to CPU jax — reporting an interpret-mode rate as the
    # chip's GCUPS would be wrong, so fail loudly instead.
    if "--measure-only" not in sys.argv:
        status = ensure_responsive_backend(retries=10, retry_wait=90)
        if status == "wedged":
            raise SystemExit(
                "bench: TPU relay wedged (backend init hangs); no honest "
                "device measurement is possible — see BENCH history for "
                "the last live numbers")
    if "--measure-only" in sys.argv:
        detail: dict = {}
        g = measure_pallas_gcups(detail)
        print(json.dumps(detail), file=sys.stderr)
        print(g)
        return
    if "--cigar-only" in sys.argv:
        print(json.dumps(measure_cigar_kernel_gcups()))
        return
    if "--e2e-only" in sys.argv:
        print(json.dumps(measure_e2e_big()))
        return
    # retry ladder: the TPU is attached through a relay whose claim can
    # transiently fail or WEDGE (backend init blocks forever, no
    # exception); a lost benchmark would cost the whole round's record.
    # First in-process under a watchdog thread — a wedge must surface as
    # a timeout, not a hang — then fresh subprocesses with hard
    # timeouts, spaced out to give a degraded relay time to recover.
    gcups = None
    detail: dict = {}
    watchdog_s = float(os.environ.get("MINIPROT_TPU_BENCH_TIMEOUT", "420"))
    try:
        import queue as _q
        import threading as _t
        box: _q.Queue = _q.Queue(1)

        def run() -> None:
            try:
                box.put((True, measure_pallas_gcups(detail)))
            except BaseException as e:
                box.put((False, e))

        _t.Thread(target=run, daemon=True, name="bench-watchdog").start()
        ok, val = box.get(timeout=watchdog_s)
        if not ok:
            raise val
        gcups = val
    except Exception as ex:
        print(f"bench: first attempt failed ({ex!r}); retrying in a "
              "fresh process", file=sys.stderr)
    if gcups is None:
        for attempt in range(3):
            time.sleep(60)
            try:
                gcups = _measure_in_subprocess()
                break
            except Exception as ex:
                print(f"bench: subprocess attempt {attempt + 1} failed "
                      f"({ex!r})", file=sys.stderr)
        else:
            raise SystemExit("bench: all measurement attempts failed")
    ref = measure_ref_core()
    # the secondary metrics each run in their own subprocess with a hard
    # timeout: a wedged device relay during the (transfer-heavy) CIGAR
    # or e2e measurements must not lose the primary metric
    extra = {}
    # e2e budget: up to 600s daemon warm-up + 1800s bigbench
    for flag, timeout_s in (("--cigar-only", 900), ("--e2e-only", 2700)):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), flag],
                capture_output=True, text=True, timeout=timeout_s)
            if out.returncode == 0:
                extra.update(json.loads(out.stdout.strip().splitlines()[-1]))
            else:
                print(f"bench: {flag} failed: {out.stderr[-300:]}",
                      file=sys.stderr)
        except Exception as ex:
            print(f"bench: {flag} failed ({ex!r})", file=sys.stderr)
    print(json.dumps({
        "metric": "nasw_dp_gcups",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / ref, 2),
        **detail,
        **extra,
    }))


if __name__ == "__main__":
    main()
