"""TPU execution engine for batched alignment DPs.

Collects DP requests from align_region_steps generators across many
regions/queries and dispatches them in shape-bucketed batches of up to
128 problems:

  "ext"    score-only extension DPs  -> kernels/nasw_pallas.ExtBatch
  "cigars" anchored gap-patching DPs -> kernels/nasw_cigar_pallas.CigarBatch
           (bit-exact tracebacks; mixed per-problem stripe counts, so
           one batch serves every al <= 8*slen_max)

CIGAR shape policy: the traceback matrix costs 2*al bytes per genome
row per lane in HBM, so nl buckets are capped per slen class to keep a
batch's tb under CIG_TB_CAP, and launched-but-uncollected batches are
drained in waves once their combined tb passes PENDING_TB_CAP.

Jobs outside the supported shape classes (or whose folded donor+io
streams would go negative, breaking the single-saturation equivalence)
fall back to the host-C striped DP, which produces identical results.
"""

from __future__ import annotations

import os as _os
from dataclasses import dataclass

import numpy as np

from .align import DpEnv
from .kernels import nasw_cigar_pallas as ck
from .kernels import nasw_cigar_scan as csk
from .kernels import nasw_pallas as nk
from .native import DPF_CIGAR, DPF_EXT_LEFT, DPF_EXT_RIGHT
from .options import MapOpt

AL_BUCKETS = (128, 512, 1024)
# multiples of ROW_CHUNK=264; the ext kernel streams the genome axis,
# so the top bucket (101376) covers the default max_intron/2 = 100kb
# extension window (map.c:226) entirely on device
NL_BUCKETS = (2112, 4224, 8448, 16896, 33792, 67584, 101376)
MIN_TPU_NL = 1024        # smaller windows are cheaper on the host
CIG_SLEN_CLASSES = (4, 16, 64)          # al <= 32 / 128 / 512
CIG_NL_BUCKETS = (2048, 4096, 8192, 16384, 32768, 65536)
# traceback HBM caps scale with the chip's memory (default 16GB, the
# v5e; override with MINIPROT_TPU_HBM_GB on smaller devices).  At 16GB
# the slen=64 class reaches nl=32768.  An overshoot is not fatal — a
# device OOM marks the engine broken and the run completes on the host
# engine with identical output — but it forfeits the device for the run.
_HBM_GB = float(_os.environ.get("MINIPROT_TPU_HBM_GB", "16"))
CIG_TB_CAP = int(4200 * _HBM_GB / 16) << 20   # per-batch cap
PENDING_TB_CAP = int(5000 * _HBM_GB / 16) << 20  # drain beyond this
CIG_MIN_NL = 512

# set when a device collect was abandoned on timeout: a worker thread is
# still blocked inside the device runtime and interpreter teardown may
# abort; the CLI checks this and hard-exits after flushing its output
WEDGED = False


def ext_fits_int16(al: int, mat_max: int, end_bonus: int) -> bool:
    """True when the int32 ext kernel is provably bit-equivalent to the
    reference's saturating-int16 arithmetic (nasw-sse.c:342-402) for an
    extension problem with query length ``al``.

    Top side: every true prefix score is <= al*max(mat) (each aligned aa
    contributes at most the best matrix entry; all other transitions are
    penalties), and the tracked candidate adds end_bonus once — so when
    al*mat_max + end_bonus <= 32767 no saturating add in the reference
    ever clips upward, and the int32 kernel computes the same values.

    Bottom side needs no bound: per-step floor clipping commutes with
    the DP's max/sub algebra (clip(max(a,b)-c) == max(clip(a-c),
    clip(b-c))), so a floor-clipped chain equals max(unclipped chain,
    -32768) — and the OUTPUTS (row-max score, end rows) never bind the
    floor because every row keeps a cell reachable through the free
    intron carry (A/B/C states) worth >= -(|min mat| + io + donor +
    acceptor + logpen) >> -32768.  Adversarial tests:
    tests/test_pallas.py::test_ext_saturation_*."""
    return al * max(mat_max, 0) + max(end_bonus, 0) <= 32767


def cig_shape(nl: int, al: int):
    """Pick the (slen_class, nl_bucket) for a CIGAR job, or None when
    the job must run on the host."""
    if nl < CIG_MIN_NL or al < 1:
        return None
    slen_p = (al + 7) // 8
    sc = next((s for s in CIG_SLEN_CLASSES if slen_p <= s), None)
    if sc is None:
        return None
    for b in CIG_NL_BUCKETS:
        if nl <= b and sc * 8 * b * ck.B * 2 <= CIG_TB_CAP:
            return sc, b
    return None


@dataclass
class _ExtJob:
    nsq: np.ndarray
    asq: np.ndarray
    ss: np.ndarray | None
    io: int
    ext_left: bool
    result: tuple | None = None


@dataclass
class _CigJob:
    nsq: np.ndarray
    asq: np.ndarray
    ss: np.ndarray | None
    result: tuple | None = None


class TpuExtEngine:
    """Batches alignment DPs onto the Pallas kernels."""

    client = None   # daemon connection; instance attr when reachable

    def __init__(self, opt: MapOpt, interpret: bool | None = None):
        self.opt = opt
        self.env = DpEnv(opt)  # host fallback + sp/io defaults
        self.sp = self.env.sp
        self.scalars = (opt.go, opt.ge, opt.fs, opt.io, opt.xdrop,
                        opt.end_bonus, opt.ie_coef)
        self.mat = opt.mat
        self.mat_max = int(np.max(opt.mat))
        self.interpret = interpret
        self.ext_jobs: list[_ExtJob] = []
        self.cig_jobs: list[_CigJob] = []
        self.requests: list[tuple] = []   # ("ext", idx) | ("cigars", [idx...])
        self.n_tpu = 0
        self.n_host = 0
        # set on the first device error: every later job runs on the
        # host engine (identical results), so one transient relay or
        # backend failure degrades throughput instead of killing the run
        self.broken = False
        # a running device daemon (daemon.py) holds warm compiled
        # kernels across CLI runs; when one is reachable, launches and
        # collects ship the batch objects there instead of touching the
        # backend in this process (which would pay a fresh Mosaic
        # compile per kernel shape).  MINIPROT_TPU_DAEMON=0 disables.
        self.client = None
        if not interpret and _os.environ.get("MINIPROT_TPU_DAEMON") != "0":
            from . import daemon as _daemon
            self.client = _daemon.DaemonClient.maybe_connect()

    def _device_failed(self, e: Exception) -> None:
        global WEDGED
        if not self.broken:
            import sys
            sys.stderr.write(f"WARNING: TPU batch failed ({e!r}); "
                             "falling back to the host engine for the "
                             "rest of this run\n")
        self.broken = True
        if isinstance(e, TimeoutError):
            # an abandoned collect thread is still blocked inside the
            # device runtime; normal interpreter teardown may abort when
            # it is killed mid-exception (the CLI hard-exits instead)
            WEDGED = True

    def _guarded(self, fn, timeout=None, overlapped=False):
        """Run fn under a watchdog: on relay-attached devices a transfer
        can block for minutes; past MINIPROT_TPU_BATCH_TIMEOUT seconds
        (default 180, 0 disables) the engine gives up on the device and
        recomputes on the host (identical results).  The blocked worker
        thread is abandoned — once that happens the engine is marked
        broken and never touches the device again.

        overlapped=True marks ops running on the wave-prefetch thread
        concurrently with host work: their wall goes into the profiler's
        device_blocked_s (wave seconds) but not device_exposed_s (wall
        the driver actually stalled); the join side credits its real
        wait to exposed instead."""
        import os as _os
        import time as _time
        from .sysutil import profiler
        if timeout is None:
            timeout = float(_os.environ.get("MINIPROT_TPU_BATCH_TIMEOUT",
                                            "180"))
        t0 = _time.monotonic()
        if timeout <= 0 or self.interpret:
            try:
                return fn()
            finally:
                profiler.add_device_block(
                    _time.monotonic() - t0,
                    exposed=0.0 if overlapped else None)
        # daemon thread, NOT ThreadPoolExecutor: the executor's workers
        # are joined at interpreter exit, so one transfer wedged in the
        # relay would hang process shutdown long after the run fell back
        # to the host and finished its work
        import queue as _q
        import threading as _t
        box: _q.Queue = _q.Queue(1)

        def run() -> None:
            try:
                box.put((True, fn()))
            except BaseException as e:   # surfaced to the caller below
                box.put((False, e))

        _t.Thread(target=run, daemon=True, name="tpu-io").start()
        try:
            ok, val = box.get(timeout=timeout)
        except _q.Empty:
            raise TimeoutError(f"device collect exceeded {timeout:.0f}s")
        finally:
            profiler.add_device_block(
                _time.monotonic() - t0,
                exposed=0.0 if overlapped else None)
        if not ok:
            raise val
        return val

    @staticmethod
    def _decoded(batch, handles):
        """Results from prefetched handles: numpy-backed handle tuples
        decode through batch.collect; daemon waves arrive pre-decoded."""
        if isinstance(handles, tuple) and handles and handles[0] == "done":
            return handles[1]
        return batch.collect(handles)

    @staticmethod
    def _daemon_timeout() -> float:
        """Watchdog allowance for daemon RPCs.  A daemon collect may
        legitimately include the FIRST compile of a kernel shape in the
        daemon's lifetime (60-230s through a relay), so daemon ops get
        a higher default than direct transfers; after warm-up they take
        milliseconds.  A genuinely wedged daemon still trips this and
        the run degrades to the host engine."""
        return float(_os.environ.get("MINIPROT_TPU_DAEMON_TIMEOUT", "600"))

    def _collect(self, batch, handles):
        """batch.collect under the transfer watchdog."""
        if isinstance(handles, tuple) and handles and handles[0] == "done":
            return handles[1]   # daemon already fetched and decoded
        if isinstance(handles, tuple) and handles and handles[0] == "daemon":
            return self._guarded(
                lambda: self.client.collect([handles[1]])[0],
                timeout=self._daemon_timeout())
        return self._guarded(lambda: batch.collect(handles))

    def _begin_prefetch(self, pending):
        """Start the wave prefetch on a background thread and return a
        join() callable producing its result.

        The collect wave is mostly network wait (relay RTT + fetch) and,
        through a daemon, daemon-side work — all GIL-free from this
        thread's perspective — so the caller runs its host-fallback DPs
        CONCURRENTLY with the wave instead of before it, hiding the
        wave's latency behind host work (the reverse also holds: the
        wave hides the fallbacks).  join() must be called exactly once."""
        if self.interpret or self.broken or len(pending) < 2:
            # same conditions under which _prefetch declines; the caller
            # falls back to per-batch collects after its host work
            return lambda: None
        import queue as _q
        import threading as _t
        import time as _time
        from .sysutil import profiler
        box: _q.Queue = _q.Queue(1)
        _t.Thread(target=lambda: box.put(self._prefetch(pending)),
                  daemon=True, name="tpu-wave-prefetch").start()

        def join():
            t0 = _time.monotonic()
            r = box.get()
            # only the wait that remained after the caller's host work
            # is wall the driver actually lost to the device
            profiler.add_device_block(0.0, trips=0,
                                      exposed=_time.monotonic() - t0)
            return r

        return join

    def _prefetch(self, pending):
        """One device_get covering every pending batch's outputs.

        Through a relay each per-batch fetch costs a full round trip,
        so a wave of K collected batches paid K round trips; fetching
        the whole wave in one device_get pays one.  Returns a list of
        prefetched handle tuples aligned with `pending` (numpy-backed,
        so the per-batch collect's own fetches become no-ops), or None
        when prefetching is pointless or failed — the caller then runs
        the normal per-batch collect path."""
        if self.interpret or self.broken or len(pending) < 2:
            return None
        if self.client is not None:
            # one daemon round trip for the whole wave; the daemon does
            # the one-fetch device_get AND the decode, so the handles
            # come back as finished result lists
            bids = [h[1] for _, _, h in pending]
            try:
                results = self._guarded(lambda: self.client.collect(bids),
                                        timeout=self._daemon_timeout(),
                                        overlapped=True)
            except Exception as e:
                self._device_failed(e)
                return None
            return [("done", r) for r in results]
        import jax
        tags, tails = [], []
        for _, _, h in pending:
            if isinstance(h, tuple) and isinstance(h[0], str):
                tags.append(h[0])
                tails.append(tuple(h[1:]))
            else:
                tags.append(None)
                tails.append(h)
        try:
            fetched = self._guarded(lambda: jax.device_get(tails),
                                    overlapped=True)
        except Exception as e:
            self._device_failed(e)
            return None
        return [f if t is None else (t, *f)
                for t, f in zip(tags, fetched)]

    def _launch(self, pending: list, idxs: list, batch) -> bool:
        """Launch a batch; on a device error mark the engine broken and
        return False so the caller reroutes the jobs to the host.

        The launch runs under the same watchdog as collects: launching
        uploads the batch's input arrays, and a relay wedged on the
        upload side otherwise blocks here indefinitely (observed in the
        --big --tpu soak: runs killed at the harness timeout with the
        engine stuck inside jnp.asarray, not in a collect)."""
        if self.broken:
            return False
        import os as _os
        # launches get a longer allowance than collects: the first
        # launch of a shape bucket compiles the kernel (up to ~160s
        # observed through a relay), and a false timeout here demotes
        # the whole run to the host engine; 300s = ~2x that worst case
        # while still letting a wedged run demote and finish
        lt = float(_os.environ.get("MINIPROT_TPU_LAUNCH_TIMEOUT", "300"))
        try:
            if self.client is not None:
                # ship the batch to the warm daemon: no local backend
                # init, no per-process kernel compile
                handles = ("daemon",
                           self._guarded(lambda: self.client.launch(batch),
                                         timeout=lt))
            else:
                handles = self._guarded(lambda: batch.launch(self.interpret),
                                        timeout=lt)
            pending.append((idxs, batch, handles))
        except Exception as e:
            self._device_failed(e)
            return False
        self.n_tpu += len(idxs)
        return True

    def _launch_queued(self, pending: list, queue: list) -> tuple:
        """Launch queued (idxs, batch) pairs — ONE daemon RPC for the
        whole group when a daemon serves the engine (launch_many; the
        per-RPC reply wait dominates MB-scale launches on a single
        shared core).  Returns (ok_pairs, failed_idxs); a group failure
        marks the engine broken like any launch failure would."""
        if not queue:
            return [], []
        if self.client is None or self.broken:
            ok, failed = [], []
            for idxs, batch in queue:
                if self._launch(pending, idxs, batch):
                    ok.append((idxs, batch))
                else:
                    failed.extend(idxs)
            return ok, failed
        lt = float(_os.environ.get("MINIPROT_TPU_LAUNCH_TIMEOUT", "300"))
        try:
            bids = self._guarded(
                lambda: self.client.launch_many([b for _, b in queue]),
                timeout=lt)
        except Exception as e:
            self._device_failed(e)
            return [], [i for idxs, _ in queue for i in idxs]
        for (idxs, batch), bid in zip(queue, bids):
            pending.append((idxs, batch, ("daemon", bid)))
            self.n_tpu += len(idxs)
        return list(queue), []

    # ---- request intake ----

    def submit(self, req) -> int:
        if req[0] == "ext":
            _, nsq, asq, ss, io, ext_left = req
            self.ext_jobs.append(_ExtJob(nsq, asq, ss, io, ext_left))
            self.requests.append(("ext", len(self.ext_jobs) - 1))
        else:
            idxs = []
            for nsq, asq, ss in req[1]:
                self.cig_jobs.append(_CigJob(nsq, asq, ss))
                idxs.append(len(self.cig_jobs) - 1)
            self.requests.append(("cigars", idxs))
        return len(self.requests) - 1

    # ---- batching ----

    def _prep(self, job, ext_left, io):
        return nk.prep_problem(job.nsq, job.asq, sp=self.sp,
                               sp_null_bonus=self.opt.sp_null_bonus, io=io,
                               ext_left=ext_left, ss=job.ss)

    def _launch_ext(self, ext_jobs) -> tuple:
        """Bucket + launch the ext batches; returns (pending, host_jobs).
        Jobs without an external splice track ship only raw nt4 windows
        (device-side prep, ~4.5x less transfer); --spsc jobs keep host
        prep."""
        buckets: dict[tuple, list[int]] = {}
        host_jobs: list[int] = []
        for i, job in enumerate(ext_jobs):
            if job.result is not None:
                continue
            nl, al = len(job.nsq), len(job.asq)
            if (self.broken or nl < MIN_TPU_NL or al > AL_BUCKETS[-1]
                    or nl > NL_BUCKETS[-1]
                    or not ext_fits_int16(al, self.mat_max,
                                          self.opt.end_bonus)
                    or self.opt.ie_coef > 8.0):  # raw-path thr table growth
                host_jobs.append(i)   # runs overlapped with the wave
                continue
            al_b = next(b for b in AL_BUCKETS if al <= b)
            nl_b = next(b for b in NL_BUCKETS if nl <= b)
            if job.ss is not None and int(
                    self.opt.ie_coef * np.log2(nl_b) + 0.5) > 126:
                # 126: one-count margin for mp_log2_f32-vs-log2 drift
                # host-prepped (--spsc) batches stream the log-length
                # penalty as int8; the raw-upload path has no such limit
                host_jobs.append(i)
                continue
            buckets.setdefault((al_b, nl_b), []).append(i)
        from . import tables
        from .sysutil import profiler
        T = tables.get_tables()
        pending: list = []
        queue: list = []
        for (al_b, nl_b), idxs in buckets.items():
            for c0 in range(0, len(idxs), nk.B_LANES):
                chunk = idxs[c0:c0 + nk.B_LANES]
                raw_idx = [i for i in chunk if ext_jobs[i].ss is None]
                old_idx = [i for i in chunk if ext_jobs[i].ss is not None]
                if raw_idx:
                    batch = nk.RawExtBatch(
                        al_b, nl_b, self.mat, self.scalars, sp=self.sp,
                        trans_code=tables._default_code)
                    for i in raw_idx:
                        job = ext_jobs[i]
                        nt4 = T.nt4[job.nsq]
                        aas = T.aa20[job.asq]
                        if job.ext_left:
                            nt4 = nt4[::-1]
                            aas = aas[::-1]
                        batch.add_raw(nt4, aas, io=job.io,
                                      ext_left=job.ext_left)
                    queue.append((raw_idx, batch))
                if old_idx:
                    batch = nk.ExtBatch(al_b, nl_b, self.mat, self.scalars)
                    for i in old_idx:
                        job = ext_jobs[i]
                        nas, aas, d, a = self._prep(job, job.ext_left, job.io)
                        batch.add(nas, aas, d, a, io=job.io)
                    queue.append((old_idx, batch))
        ok, failed = self._launch_queued(pending, queue)
        for _, batch in ok:
            profiler.add_tpu_dp(batch.nl * batch.al * batch.n, batch.n)
        host_jobs.extend(failed)
        return pending, host_jobs

    def _ext_host(self, ext_jobs, i) -> None:
        job = ext_jobs[i]
        sc, ntl, aal, _ = self.env.dp(
            job.nsq, job.asq,
            DPF_EXT_LEFT if job.ext_left else DPF_EXT_RIGHT,
            ss=job.ss, io=job.io)
        job.result = (sc, ntl, aal)
        self.n_host += 1

    def _decode_ext(self, ext_jobs, pending, pre) -> None:
        from .sysutil import profiler
        for n, (chunk, batch, handles) in enumerate(pending):
            try:
                if pre is not None:
                    # handles are prefetched numpy: the decode is pure
                    # host work — no watchdog, no device-blocked credit
                    results = None if self.broken else self._decoded(
                        batch, pre[n])
                else:
                    results = None if self.broken else self._collect(batch,
                                                                     handles)
            except Exception as e:
                self._device_failed(e)
                results = None
            if results is None:
                # reverse the launch-time device-cell credit: the work
                # is about to be redone (and counted) by the host engine
                profiler.add_tpu_dp(-batch.nl * batch.al * batch.n,
                                    -batch.n)
                for i in chunk:
                    self.n_tpu -= 1
                    self._ext_host(ext_jobs, i)
            else:
                for i, r in zip(chunk, results):
                    ext_jobs[i].result = r

    def _cig_classes(self):
        """CIGAR batch implementations: the scan kernel (default, ~5x
        the striped kernel, see kernels/nasw_cigar_scan.py) or the
        striped-emulation kernel.  go==0 must use the striped kernel —
        the scan/striped equivalence proof needs go >= 1 (the
        reference's lazy-F break truncates at exact ties).
        MINIPROT_TPU_CIG_IMPL=striped forces the old kernel."""
        impl = _os.environ.get("MINIPROT_TPU_CIG_IMPL", "scan")
        if impl == "scan" and self.scalars[0] >= 1:
            return csk.RawScanCigarBatch, csk.ScanCigarBatch
        return ck.RawCigarBatch, ck.CigarBatch

    def _cig_host(self, cig_jobs, i) -> None:
        job = cig_jobs[i]
        sc, _, _, c = self.env.dp(job.nsq, job.asq, DPF_CIGAR, ss=job.ss)
        job.result = (sc, c)
        self.n_host += 1

    def _decode_cig_one(self, cig_jobs, o_idxs, o_batch, o_handles,
                        prefetched=False) -> None:
        from .sysutil import profiler
        try:
            if prefetched:
                # numpy-backed handles: pure host decode, no watchdog
                results = None if self.broken else self._decoded(
                    o_batch, o_handles)
            else:
                results = None if self.broken else self._collect(
                    o_batch, o_handles)
        except Exception as e:
            self._device_failed(e)
            results = None
        if results is None:
            profiler.add_tpu_dp(-o_batch.nl * o_batch.al * o_batch.n,
                                -o_batch.n,
                                kind="cig_small" if o_batch.al <= 32
                                else "cig")
            for k in o_idxs:
                self.n_tpu -= 1
                self._cig_host(cig_jobs, k)
        else:
            for k, r in zip(o_idxs, results):
                if r is None:
                    # scan-path run-walk hit its round cap for this lane
                    # (adversarially fragmented path); redo on the host
                    profiler.add_tpu_dp(-o_batch.nl * o_batch.al, -1,
                                        kind="cig_small" if o_batch.al <= 32
                                        else "cig")
                    self.n_tpu -= 1
                    self._cig_host(cig_jobs, k)
                else:
                    cig_jobs[k].result = r

    def _launch_cig(self, cig_jobs) -> tuple:
        """Bucket + launch the CIGAR batches; returns (pending,
        host_jobs).  Launched-but-uncollected traceback buffers are
        drained once they pass PENDING_TB_CAP (one flight in the air:
        the pump collects each flush before launching the next)."""
        buckets: dict[tuple, list[int]] = {}
        host_jobs: list[int] = []
        for i, job in enumerate(cig_jobs):
            if job.result is not None:
                continue
            shape = None if self.broken else cig_shape(len(job.nsq),
                                                       len(job.asq))
            if shape is None:
                host_jobs.append(i)   # runs overlapped with the wave
                continue
            buckets.setdefault(shape, []).append(i)
        from . import tables
        from .sysutil import profiler
        T = tables.get_tables()
        pending: list = []
        outstanding = 0

        queue: list = []
        queued_tb = 0

        def flush_queue():
            nonlocal outstanding, queued_tb
            ok, failed = self._launch_queued(pending, queue)
            queue.clear()
            queued_tb = 0
            for k in failed:
                self._cig_host(cig_jobs, k)
            for _, batch in ok:
                outstanding += batch.tb_bytes()
                profiler.add_tpu_dp(batch.nl * batch.al * batch.n, batch.n,
                                    kind="cig_small" if batch.al <= 32
                                    else "cig")
            # drain the oldest launches once the uncollected traceback
            # buffers would crowd HBM
            while outstanding > PENDING_TB_CAP and len(pending) > 1:
                o_idxs, o_batch, o_handles = pending.pop(0)
                self._decode_cig_one(cig_jobs, o_idxs, o_batch, o_handles)
                outstanding -= o_batch.tb_bytes()

        def launch(idxs, batch):
            nonlocal queued_tb
            queue.append((idxs, batch))
            queued_tb += batch.tb_bytes()
            # group launches into one daemon RPC, but never let the
            # queued + in-flight tracebacks overshoot the HBM cap
            if outstanding + queued_tb > PENDING_TB_CAP // 2:
                flush_queue()

        raw_cls, prep_cls = self._cig_classes()
        for (slen, nl_b), idxs in buckets.items():
            # the small class stacks 4 problems per lane column (512 per
            # launch) on the scan kernel — 1.7x the device rate and 4x
            # fewer launch round trips (docs/DESIGN.md accounting)
            cls_here = raw_cls
            if slen <= 4 and raw_cls is csk.RawScanCigarBatch:
                cls_here = csk.Raw4ScanCigarBatch
            cap = getattr(cls_here, "CAPACITY", ck.B)
            raw_all = [i for i in idxs if cig_jobs[i].ss is None]
            old_all = [i for i in idxs if cig_jobs[i].ss is not None]
            for c0 in range(0, len(raw_all), cap):
                raw_idx = raw_all[c0:c0 + cap]
                # no --spsc track: donor >= 0 by construction, so the
                # folded donor stream cannot go negative and the raw
                # nt upload + device prep path is always valid
                batch = cls_here(
                    slen * 8, nl_b, self.mat, self.scalars, sp=self.sp,
                    trans_code=tables._default_code)
                for i in raw_idx:
                    job = cig_jobs[i]
                    batch.add_raw(T.nt4[job.nsq], T.aa20[job.asq],
                                  io=self.opt.io)
                launch(raw_idx, batch)
            for c0 in range(0, len(old_all), ck.B):
                old_idx = old_all[c0:c0 + ck.B]
                usable = []
                batch = prep_cls(slen * 8, nl_b, self.mat, self.scalars)
                for i in old_idx:
                    job = cig_jobs[i]
                    nas, aas, d, a = self._prep(job, False, self.opt.io)
                    if int(d.min()) + self.opt.io < 0:
                        # folded donor stream would go negative: the
                        # single-saturation fold no longer matches the
                        # reference's double-saturating subs; host it
                        self._cig_host(cig_jobs, i)
                        continue
                    batch.add(nas, aas, d, a, io=self.opt.io)
                    usable.append(i)
                if usable:
                    launch(usable, batch)
        flush_queue()
        return pending, host_jobs

    def flush_begin(self) -> "_Flight":
        """Launch every batch of the CURRENT request set and start ONE
        combined ext+cig collect wave; host fallbacks for both kinds run
        here, overlapped with the wave.  Returns the in-flight state —
        call flush_end(flight) (exactly once) for the results.  The
        request/job lists reset, so a second flight could be prepared
        while this one is in the air (the two-cohort pump that used
        this was measured and rejected — see pump_align_generators —
        but the split API remains the engine's structure)."""
        fl = _Flight()
        from .sysutil import profiler
        profiler.flush_rounds += 1
        fl.requests, self.requests = self.requests, []
        fl.ext_jobs, self.ext_jobs = self.ext_jobs, []
        fl.cig_jobs, self.cig_jobs = self.cig_jobs, []
        fl.ext_pending, ext_host = self._launch_ext(fl.ext_jobs)
        fl.cig_pending, cig_host = self._launch_cig(fl.cig_jobs)
        # one combined collect wave: half the round trips of separate
        # ext/cig waves, and every host fallback below overlaps it
        fl.join = self._begin_prefetch(fl.ext_pending + fl.cig_pending)
        for i in ext_host:
            self._ext_host(fl.ext_jobs, i)
        if cig_host:
            # one batched native call (mx_dp16x4 when it pays) instead
            # of one ctypes round trip per tiny rectangle — these are
            # the <CIG_MIN_NL jobs, ~10k+ per whole-genome mini-batch
            res = self.env.dp_cigars(
                [(fl.cig_jobs[i].nsq, fl.cig_jobs[i].asq,
                  fl.cig_jobs[i].ss) for i in cig_host])
            for i, r in zip(cig_host, res):
                fl.cig_jobs[i].result = r
                self.n_host += 1
        return fl

    def flush_end(self, fl: "_Flight") -> list:
        """Join the flight's collect wave, decode, and return results
        aligned with its submit order."""
        pre = fl.join()
        ne = len(fl.ext_pending)
        self._decode_ext(fl.ext_jobs, fl.ext_pending,
                         None if pre is None else pre[:ne])
        for n, (usable, batch, handles) in enumerate(fl.cig_pending):
            self._decode_cig_one(
                fl.cig_jobs, usable, batch,
                pre[ne + n] if pre is not None else handles,
                prefetched=pre is not None)
        out = []
        for kind, ref in fl.requests:
            if kind == "ext":
                out.append(fl.ext_jobs[ref].result)
            else:
                out.append([fl.cig_jobs[i].result for i in ref])
        return out

    def flush(self) -> list:
        return self.flush_end(self.flush_begin())


class _Flight:
    """One in-flight flush: its requests/jobs snapshot, the launched
    batches, and the joined ext+cig collect wave."""

    __slots__ = ("requests", "ext_jobs", "cig_jobs",
                 "ext_pending", "cig_pending", "join")


def pump_align_generators(gens: list, engine: TpuExtEngine) -> None:
    """Advance align_region_steps generators in lockstep, batching their
    DP requests through the engine.  Each generator yields a LIST of
    requests per round and receives the matching list of results.

    Each round's ext+cig batches launch together and are collected in
    ONE combined wave (engine.flush_begin/flush_end), with both kinds'
    host-fallback DPs running concurrently with the wave.  A two-cohort
    pipelined variant (alternating generator halves so one cohort's
    host work hides the other's wave) was measured and REJECTED on the
    200Mb workload: splitting the generators halves the per-bucket job
    counts, so ext/cig batches go out with half-empty lane dimensions —
    the padded-lane device time and extra round trips (135 -> 180) cost
    more than the hidden wave latency saved (20.8s -> 23.1s wall).
    Full-lane batches beat latency hiding on this fabric."""
    waiting = {}
    for gi, g in enumerate(gens):
        try:
            waiting[gi] = next(g)
        except StopIteration:
            pass
    while waiting:
        handles = {gi: [engine.submit(req) for req in reqs]
                   for gi, reqs in waiting.items()}
        results = engine.flush()
        nxt = {}
        for gi, hs in handles.items():
            try:
                nxt[gi] = gens[gi].send([results[h] for h in hs])
            except StopIteration:
                pass
        waiting = nxt
