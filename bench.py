"""Benchmark: sustained GCUPS of the Pallas splice/frameshift DP kernel.

Prints one JSON line:
  {"metric": "nasw_dp_gcups", "value": N, "unit": "GCUPS", "vs_baseline": R}

vs_baseline is the ratio against one CPU core of the reference
implementation running its SSE nasw kernel on the same machine
(measured 0.50 GCUPS here; re-measured live when the reference binary
is available).  The paper target is >=10x a reference core.
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


def measure_pallas_gcups() -> float:
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
    # xdrop effectively off so every genome row is genuinely computed
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
    iters = 20 if jax.default_backend() == "tpu" else 2
    t0 = time.perf_counter()
    for _ in range(iters):
        r = call(*args)
    # the device executes queued kernels serially; one host transfer of
    # the last result bounds all of them (block_until_ready alone can
    # return early on the relay-backed backend here)
    np.asarray(r[0])
    dt = (time.perf_counter() - t0) / iters
    return NL * AL * B / dt / 1e9


def measure_cigar_gcups() -> float:
    """Sustained GCUPS of the full-traceback CIGAR kernel, measured the
    way the product drives it (device.py two-phase dispatch): several
    batches launched back-to-back, then collected — so transfers
    pipeline behind compute instead of paying one relay round trip per
    batch.  Includes the on-device traceback walk and the state-stream
    fetch."""
    import jax

    from miniprot_tpu import tables
    from miniprot_tpu.kernels import nasw_cigar_pallas as ck

    on_tpu = jax.default_backend() == "tpu"
    # nl=2048 matches the typical anchored-gap rectangle; it also keeps
    # the traceback fetch (the dominant cost through a relay) bounded
    AL, NL = (32, 2048) if on_tpu else (16, 256)
    K = 6 if on_tpu else 1               # batches in flight
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    rng = np.random.default_rng(5)

    def mk():
        batch = ck.RawCigarBatch(AL, NL, mat, (11, 1, 23, 29, 100, 5, 0.5),
                                 sp=sp, trans_code=1)
        for _ in range(ck.B):
            nt4 = rng.integers(0, 4, NL).astype(np.uint8)
            aas = rng.integers(0, 20, AL).astype(np.uint8)
            batch.add_raw(nt4, aas, io=29)
        return batch

    b = mk()
    b.run(interpret=not on_tpu)          # warm-up / compile
    batches = [mk() for _ in range(K)]   # host-side construction untimed
    t0 = time.perf_counter()
    pend = [(bt, bt.launch(interpret=not on_tpu)) for bt in batches]
    for bt, handles in pend:
        bt.collect(handles)
    dt = time.perf_counter() - t0
    return NL * AL * ck.B * K / dt / 1e9


def measure_e2e_proteins_per_sec():
    """End-to-end mapping throughput on a synthetic workload, with the
    TPU engine when a backend is live.  Returns (proteins_per_sec,
    device_fraction, n_proteins)."""
    import io as _io
    import tempfile

    from miniprot_tpu.cli import tpu_live
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.pipeline import map_file
    from miniprot_tpu.testgen import make_workload

    live = tpu_live()
    with tempfile.TemporaryDirectory() as td:
        fa, faa = os.path.join(td, "g.fa"), os.path.join(td, "q.faa")
        n_genes = 48
        make_workload(fa, faa, genome_len=3_000_000, n_genes=n_genes,
                      seed=7, n_ctg=2, max_intron=20_000, rev_frac=0.5)
        mi = Index.build(fa, IdxOpt())
        stats: dict = {}
        buf = _io.StringIO()
        # warm run compiles the kernels; the timed run measures steady state
        map_file(mi, faa, MapOpt(), n_threads=1, out=_io.StringIO(),
                 use_tpu=live, stats=stats)
        t0 = time.perf_counter()
        stats = {}
        map_file(mi, faa, MapOpt(), n_threads=1, out=buf, use_tpu=live,
                 stats=stats)
        dt = time.perf_counter() - t0
        return n_genes / dt, stats.get("device_fraction", 0.0), n_genes


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
        print(measure_pallas_gcups())
        return
    if "--cigar-only" in sys.argv:
        print(json.dumps({"cigar_gcups": round(measure_cigar_gcups(), 2)}))
        return
    if "--e2e-only" in sys.argv:
        pps, frac, n = measure_e2e_proteins_per_sec()
        print(json.dumps({
            "proteins_per_sec_chip": round(pps, 2),
            "dp_cells_device_fraction": round(frac, 4),
            "e2e_n_proteins": n,
        }))
        return
    # retry ladder: the TPU is attached through a relay whose claim can
    # transiently fail or WEDGE (backend init blocks forever, no
    # exception); a lost benchmark would cost the whole round's record.
    # First in-process under a watchdog thread — a wedge must surface as
    # a timeout, not a hang — then fresh subprocesses with hard
    # timeouts, spaced out to give a degraded relay time to recover.
    gcups = None
    watchdog_s = float(os.environ.get("MINIPROT_TPU_BENCH_TIMEOUT", "420"))
    try:
        import queue as _q
        import threading as _t
        box: _q.Queue = _q.Queue(1)

        def run() -> None:
            try:
                box.put((True, measure_pallas_gcups()))
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
    for flag, timeout_s in (("--cigar-only", 900), ("--e2e-only", 900)):
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
        **extra,
    }))


if __name__ == "__main__":
    main()
