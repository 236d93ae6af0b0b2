"""Kernel benchmark measurements, shared by bench.py and the daemon.

These are the device-time GCUPS measurements behind the round record
(bench.py at the repo root).  They live in the package so the device
daemon (daemon.py) can run them in ITS process over a "bench" RPC —
the daemon holds the warm compiled kernels, so a bench run that
attaches to a live daemon skips the minutes-per-shape relay-side
Mosaic compile a fresh process pays.  Device-time rates are process
independent: kernels are queued back-to-back and bounded by one small
fetch, so per-RPC/relay latency is excluded either way.
"""

from __future__ import annotations

import time

import numpy as np


def measure_ext_gcups(detail: dict | None = None) -> float:
    """Device-time GCUPS of the extension kernel: queue `iters` kernels
    back-to-back, bound them with ONE small fetch (the device executes
    queued kernels serially, so per-kernel relay latency is excluded).
    Runs 3 repetitions and reports the median + spread via `detail` so
    run-to-run relay drift is visible in the round record."""
    import jax

    from .kernels import nasw_pallas as nk

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


def measure_cigar_gcups() -> dict:
    """Device-time GCUPS of the full-traceback CIGAR kernel including
    the on-device traceback walk (the dtb path the product uses): queue
    K batches, bound with one small fetch of the LAST batch's outputs —
    per-batch relay latency excluded, so this is the chip's rate.
    Measured at both production shape classes: the small anchored-gap
    class (al<=32 x 2048 rows) and the large class (al<=128 x 8192)
    that carries most CIGAR cells on whole-genome runs."""
    import jax

    from . import tables
    from .kernels import nasw_cigar_pallas as ck

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
    out = {"cigar_gcups_device_small": rates[0],
           "cigar_gcups_device": rates[-1]}
    out.update(measure_cigar_host_gcups())
    return out


def measure_cigar_host_gcups() -> dict:
    """One-core host-engine rate at the SAME two CIGAR shape classes,
    the other half of the per-class device-vs-host routing data
    (device.CIG_DEVICE_MIN_AL).  Uses the production host path
    (DpEnv.dp -> native striped C kernel, traceback mode)."""
    import time as _time

    from .align import DpEnv
    from .native import DPF_CIGAR
    from .options import MapOpt

    env = DpEnv(MapOpt())
    rng = np.random.default_rng(9)
    nt = np.frombuffer(b"ACGT", np.uint8)
    aa = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    out = {}
    for key, al, nl, n in (("cigar_gcups_host_small", 32, 2048, 24),
                           ("cigar_gcups_host", 128, 8192, 12)):
        probs = [(nt[rng.integers(0, 4, nl)], aa[rng.integers(0, 20, al)])
                 for _ in range(n)]
        env.dp(*probs[0], DPF_CIGAR)   # warm (tables, scratch slots)
        t0 = _time.perf_counter()
        for nsq, asq in probs:
            env.dp(nsq, asq, DPF_CIGAR)
        dt = _time.perf_counter() - t0
        out[key] = round(nl * al * n / dt / 1e9, 2)
    return out


def run_bench_op(kind: str):
    """Daemon-side entry point for the "bench" RPC."""
    if kind == "ext":
        detail: dict = {}
        v = measure_ext_gcups(detail)
        detail["value"] = v
        return detail
    if kind == "cigar":
        return measure_cigar_gcups()
    raise ValueError(f"unknown bench kind {kind!r}")
