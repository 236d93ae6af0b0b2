"""TPU execution engine for batched alignment DPs.

Collects DP requests from align_region_steps generators across many
regions/queries and dispatches them in shape-bucketed batches of up to
128 problems:

  "ext"    score-only extension DPs  -> kernels/nasw_pallas.ExtBatch
  "cigars" anchored gap-patching DPs -> kernels/nasw_cigar_pallas.CigarBatch
           (bit-exact tracebacks; the batch's stripe count must equal
           each problem's own ceil(al/8), so jobs bucket by exact slen)

Jobs outside the supported shape classes (or whose folded donor+io
streams would go negative, breaking the single-saturation equivalence)
fall back to the host-C striped DP, which produces identical results.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .align import DpEnv
from .kernels import nasw_cigar_pallas as ck
from .kernels import nasw_pallas as nk
from .native import DPF_CIGAR, DPF_EXT_LEFT, DPF_EXT_RIGHT
from .options import MapOpt

AL_BUCKETS = (128, 512)
NL_BUCKETS = (2112, 4224, 8448, 16896, 33792)   # multiples of ROW_CHUNK=264
MIN_TPU_NL = 1024        # smaller windows are cheaper on the host
CIG_SLENS = (1, 2, 3, 4)  # gap DPs with al <= 32 go to the TPU
CIG_NL_BUCKETS = (2048, 8192)
CIG_MIN_NL = 512


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

    def __init__(self, opt: MapOpt, interpret: bool | None = None):
        self.opt = opt
        self.env = DpEnv(opt)  # host fallback + sp/io defaults
        self.sp = self.env.sp
        self.scalars = (opt.go, opt.ge, opt.fs, opt.io, opt.xdrop,
                        opt.end_bonus, opt.ie_coef)
        self.mat = opt.mat
        self.interpret = interpret
        self.ext_jobs: list[_ExtJob] = []
        self.cig_jobs: list[_CigJob] = []
        self.requests: list[tuple] = []   # ("ext", idx) | ("cigars", [idx...])
        self.n_tpu = 0
        self.n_host = 0

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

    def _run_ext(self) -> None:
        buckets: dict[tuple, list[int]] = {}
        host_jobs: list[int] = []
        for i, job in enumerate(self.ext_jobs):
            if job.result is not None:
                continue
            nl, al = len(job.nsq), len(job.asq)
            if (nl < MIN_TPU_NL or al > AL_BUCKETS[-1] or nl > NL_BUCKETS[-1]
                    or self.opt.ie_coef > 8.0):  # int8 logpen stream limit
                host_jobs.append(i)   # runs after launch, overlapped
                continue
            al_b = next(b for b in AL_BUCKETS if al <= b)
            nl_b = next(b for b in NL_BUCKETS if nl <= b)
            buckets.setdefault((al_b, nl_b), []).append(i)
        # two-phase dispatch: launch every batch (async device queue +
        # pipelined transfers), then collect — the device works on batch
        # k while the host preps/ships batch k+1.  Jobs without an
        # external splice track ship only raw nt4 windows (device-side
        # prep, ~4.5x less transfer); --spsc jobs keep host prep.
        from . import tables
        from .sysutil import profiler
        T = tables.get_tables()
        pending = []
        for (al_b, nl_b), idxs in buckets.items():
            for c0 in range(0, len(idxs), nk.B_LANES):
                chunk = idxs[c0:c0 + nk.B_LANES]
                raw_idx = [i for i in chunk if self.ext_jobs[i].ss is None]
                old_idx = [i for i in chunk if self.ext_jobs[i].ss is not None]
                if raw_idx:
                    batch = nk.RawExtBatch(
                        al_b, nl_b, self.mat, self.scalars, sp=self.sp,
                        trans_code=tables._default_code)
                    for i in raw_idx:
                        job = self.ext_jobs[i]
                        nt4 = T.nt4[job.nsq]
                        aas = T.aa20[job.asq]
                        if job.ext_left:
                            nt4 = nt4[::-1]
                            aas = aas[::-1]
                        batch.add_raw(nt4, aas, io=job.io,
                                      ext_left=job.ext_left)
                    pending.append((raw_idx, batch,
                                    batch.launch(self.interpret)))
                    self.n_tpu += len(raw_idx)
                    profiler.add_tpu_dp(batch.nl * batch.al * batch.n,
                                        batch.n)
                if old_idx:
                    batch = nk.ExtBatch(al_b, nl_b, self.mat, self.scalars)
                    for i in old_idx:
                        job = self.ext_jobs[i]
                        nas, aas, d, a = self._prep(job, job.ext_left, job.io)
                        batch.add(nas, aas, d, a, io=job.io)
                    pending.append((old_idx, batch,
                                    batch.launch(self.interpret)))
                    self.n_tpu += len(old_idx)
                    profiler.add_tpu_dp(batch.nl * batch.al * batch.n,
                                        batch.n)
        # host-engine fallbacks run between launch and collect so they
        # overlap the device's work on the queued batches
        for i in host_jobs:
            job = self.ext_jobs[i]
            sc, ntl, aal, _ = self.env.dp(
                job.nsq, job.asq,
                DPF_EXT_LEFT if job.ext_left else DPF_EXT_RIGHT,
                ss=job.ss, io=job.io)
            job.result = (sc, ntl, aal)
            self.n_host += 1
        for chunk, batch, handles in pending:
            for i, r in zip(chunk, batch.collect(handles)):
                self.ext_jobs[i].result = r

    def _run_cig(self) -> None:
        buckets: dict[tuple, list[int]] = {}
        host_jobs: list[int] = []
        for i, job in enumerate(self.cig_jobs):
            if job.result is not None:
                continue
            nl, al = len(job.nsq), len(job.asq)
            slen = (al + 7) // 8
            if (nl < CIG_MIN_NL or slen not in CIG_SLENS
                    or nl > CIG_NL_BUCKETS[-1]):
                host_jobs.append(i)   # runs after launch, overlapped
                continue
            nl_b = next(b for b in CIG_NL_BUCKETS if nl <= b)
            buckets.setdefault((slen, nl_b), []).append(i)
        from . import tables
        from .sysutil import profiler
        T = tables.get_tables()
        pending = []
        for (slen, nl_b), idxs in buckets.items():
            for c0 in range(0, len(idxs), ck.B):
                chunk = idxs[c0:c0 + ck.B]
                raw_idx = [i for i in chunk if self.cig_jobs[i].ss is None]
                old_idx = [i for i in chunk if self.cig_jobs[i].ss is not None]
                if raw_idx:
                    # no --spsc track: donor >= 0 by construction, so the
                    # folded donor stream cannot go negative and the raw
                    # nt upload + device prep path is always valid
                    batch = ck.RawCigarBatch(
                        slen * 8, nl_b, self.mat, self.scalars, sp=self.sp,
                        trans_code=tables._default_code)
                    for i in raw_idx:
                        job = self.cig_jobs[i]
                        batch.add_raw(T.nt4[job.nsq], T.aa20[job.asq],
                                      io=self.opt.io)
                    pending.append((raw_idx, batch,
                                    batch.launch(self.interpret)))
                    self.n_tpu += len(raw_idx)
                    profiler.add_tpu_dp(batch.nl * batch.al * batch.n,
                                        batch.n)
                usable = []
                batch = ck.CigarBatch(slen * 8, nl_b, self.mat, self.scalars)
                for i in old_idx:
                    job = self.cig_jobs[i]
                    nas, aas, d, a = self._prep(job, False, self.opt.io)
                    if int(d.min()) + self.opt.io < 0:
                        # folded donor stream would go negative: the
                        # single-saturation fold no longer matches the
                        # reference's double-saturating subs; host it
                        sc, _, _, c = self.env.dp(job.nsq, job.asq,
                                                  DPF_CIGAR, ss=job.ss)
                        job.result = (sc, c)
                        self.n_host += 1
                        continue
                    batch.add(nas, aas, d, a, io=self.opt.io)
                    usable.append(i)
                if usable:
                    pending.append((usable, batch,
                                    batch.launch(self.interpret)))
                    self.n_tpu += len(usable)
                    profiler.add_tpu_dp(batch.nl * batch.al * batch.n,
                                        batch.n)
        for i in host_jobs:
            job = self.cig_jobs[i]
            sc, _, _, c = self.env.dp(job.nsq, job.asq, DPF_CIGAR, ss=job.ss)
            job.result = (sc, c)
            self.n_host += 1
        for usable, batch, handles in pending:
            for i, r in zip(usable, batch.collect(handles)):
                self.cig_jobs[i].result = r

    def flush(self) -> list:
        self._run_ext()
        self._run_cig()
        out = []
        for kind, ref in self.requests:
            if kind == "ext":
                out.append(self.ext_jobs[ref].result)
            else:
                out.append([self.cig_jobs[i].result for i in ref])
        self.ext_jobs = []
        self.cig_jobs = []
        self.requests = []
        return out


def pump_align_generators(gens: list, engine: TpuExtEngine) -> None:
    """Advance align_region_steps generators in lockstep, batching their
    DP requests through the engine.  Each generator yields a LIST of
    requests per round and receives the matching list of results."""
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
