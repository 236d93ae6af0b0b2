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


# documented op-mix constants for the derived VPU-utilization estimate
# (DESIGN.md perf accounting): full-tile VPU lane-ops issued per DP cell
# and the practical int32 VPU lane-op throughput the ext kernel's
# measured plateau implies (38.5 GCUPS x 63 ops/cell ~= 2.4e12 = ~60%
# of practical peak -> peak ~= 4.0e12 lane-ops/s on this chip)
EXT_OPS_PER_CELL = 63
CIG_SCAN_OPS_PER_CELL = 140
VPU_PEAK_LANE_OPS = 4.0e12


def _genic_nt(rng, NL, AL):
    """A gap-patch-shaped problem: coding flanks matching the query
    around one long GT..AG intron — the content class the alignment
    stage's big CIGAR rectangles actually carry (align.c:62-80)."""
    from . import tables
    T = tables.get_tables(1)
    n_aa = AL
    half = (n_aa // 2) * 3
    pre = rng.integers(0, 4, half).astype(np.uint8)
    suf = rng.integers(0, 4, n_aa * 3 - half).astype(np.uint8)
    ilen = NL - len(pre) - len(suf)
    intron = rng.integers(0, 4, ilen).astype(np.uint8)
    intron[0], intron[1] = 2, 3          # GT
    intron[-2], intron[-1] = 0, 2        # AG
    nt = np.concatenate([pre, intron, suf])
    cod = pre.reshape(-1, 3)
    aa1 = T.codon[(cod[:, 0] << 4) | (cod[:, 1] << 2) | cod[:, 2]]
    cod = suf.reshape(-1, 3)
    aa2 = T.codon[(cod[:, 0] << 4) | (cod[:, 1] << 2) | cod[:, 2]]
    aa = np.concatenate([aa1, aa2]).astype(np.uint8)
    aa[aa > 19] = 0                      # stops/X -> A (keep it coding)
    return nt, aa


def measure_cigar_gcups() -> dict:
    """Device-time GCUPS of the full-traceback CIGAR path (kernel +
    on-device walk, exactly what the product launches): queue K
    batches, bound with one small fetch of the LAST batch's outputs —
    per-batch relay latency excluded, so this is the chip's rate.

    Measured at both production shape classes (small anchored-gap
    al<=32 x 2048 and large al<=128 x 8192) for BOTH implementations:
    the scan kernel (the default route, kernels/nasw_cigar_scan.py)
    and the striped-emulation kernel.  Random content is the
    conservative number (it fragments the run-walk's runs); the
    `_genic` figure uses intron-containing rectangles shaped like the
    alignment stage's real gap-patch jobs."""
    import jax

    from . import tables
    from .kernels import nasw_cigar_pallas as ck
    from .kernels import nasw_cigar_scan as csk

    on_tpu = jax.default_backend() == "tpu"
    mat = tables.BLOSUM62.copy()
    tables.set_stop_sc(mat, 23)
    sp = tables.splice_model_scores(1)
    rng = np.random.default_rng(5)

    def mk(cls, AL, NL, genic=False):
        batch = cls(AL, NL, mat, (11, 1, 23, 29, 100, 5, 0.5),
                    sp=sp, trans_code=1)
        for _ in range(getattr(cls, "CAPACITY", ck.B)):
            if genic:
                nt, aa = _genic_nt(rng, NL, AL)
            else:
                nt = rng.integers(0, 4, NL).astype(np.uint8)
                aa = rng.integers(0, 20, AL).astype(np.uint8)
            batch.add_raw(nt, aa, io=29)
        return batch

    def rate(cls, AL, NL, K, genic=False):
        # ext-kernel methodology: inputs staged on device ONCE, then K
        # back-to-back launches bounded by one small fetch — measures
        # the chip's compute rate, not the attachment's upload
        # bandwidth (which belongs to the e2e stage).  Reuses the
        # batch's own packed-upload launch path.
        from .kernels.nasw_pallas import _opts_array, _pack_arrays
        b = mk(cls, AL, NL, genic)
        opts = _opts_array(b.go, b.ge, b.fs, b.xdrop, b.end_bonus)
        rows_used = b.nl
        if cls is csk.Raw4ScanCigarBatch:
            rows_used = b._rows_used()
            arrs = (b.nt, b.iov, b.nlv1, b.nlv8, b.slens8, opts, b.prof,
                    b.alv8)
        elif hasattr(b, "_rows_used"):
            rows_used = b._rows_used()
            arrs = (b.nt, b.iov, b.nlv1, b.nlv, b.slens, opts, b.prof,
                    b.alv)
        else:
            rows_used = 2048
            while rows_used < b.nl:
                rows_used <<= 1
            rows_used = min(b.nl, rows_used)
            arrs = (b.nt, b.iov, b.nlv1, b.nlv, b.slens, opts, b.prof,
                    b.endsel.astype(np.int8), b.qpad, b.alv)
        buf, spec = _pack_arrays(arrs)
        if cls is csk.Raw4ScanCigarBatch:
            from .kernels.nasw_cigar_scan import \
                _compiled_scan_p4_raw_dtb_packed
            call = _compiled_scan_p4_raw_dtb_packed(
                b.nl, rows_used, b.sp_key, b.trans_code, spec, not on_tpu)
        elif hasattr(b, "_rows_used"):
            from .kernels.nasw_cigar_scan import \
                _compiled_scan_raw_dtb_packed
            call = _compiled_scan_raw_dtb_packed(
                AL, b.nl, rows_used, b.sp_key, b.trans_code, spec,
                not on_tpu)
        else:
            from .kernels.nasw_cigar_pallas import \
                _compiled_cigar_raw_dtb_packed
            call = _compiled_cigar_raw_dtb_packed(
                b.slen, b.nl, rows_used, b.sp_key, b.trans_code, spec,
                not on_tpu)
        dbuf = jax.device_put(buf)
        h = call(dbuf)
        jax.device_get(h[-2])        # warm-up / compile
        t0 = time.perf_counter()
        for _ in range(K):
            h = call(dbuf)
        jax.device_get(h[-2])
        dt = time.perf_counter() - t0
        V = getattr(cls, "CAPACITY", ck.B)
        return round(NL * AL * V * K / dt / 1e9, 2)

    out = {}
    if on_tpu:
        out["cigar_gcups_device_small"] = rate(csk.Raw4ScanCigarBatch,
                                               32, 2048, 12)
        out["cigar_gcups_device_small_unstacked"] = rate(
            csk.RawScanCigarBatch, 32, 2048, 20)
        out["cigar_gcups_device"] = rate(csk.RawScanCigarBatch,
                                         128, 8192, 12)
        out["cigar_gcups_device_genic"] = rate(csk.RawScanCigarBatch,
                                               128, 8192, 12, genic=True)
        out["cigar_gcups_striped_small"] = rate(ck.RawCigarBatch,
                                                32, 2048, 12)
        out["cigar_gcups_striped"] = rate(ck.RawCigarBatch, 128, 8192, 4)
        out["cigar_vpu_util"] = round(
            out["cigar_gcups_device"] * 1e9 * CIG_SCAN_OPS_PER_CELL
            / VPU_PEAK_LANE_OPS, 3)
    else:
        r = rate(csk.RawScanCigarBatch, 16, 256, 1)
        out["cigar_gcups_device_small"] = out["cigar_gcups_device"] = r
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
        detail["ext_vpu_util"] = round(
            v * 1e9 * EXT_OPS_PER_CELL / VPU_PEAK_LANE_OPS, 3)
        return detail
    if kind == "cigar":
        return measure_cigar_gcups()
    raise ValueError(f"unknown bench kind {kind!r}")
