"""TPU execution engine for batched extension DPs.

Collects extension-DP requests (from align_region_steps generators
across many regions/queries), buckets them by padded (protein, window)
shape class, and runs each bucket through the Pallas kernel 128 problems
at a time.  Jobs outside the supported shape classes fall back to the
host-C striped DP, which produces identical results.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import native, tables
from .align import DpEnv
from .kernels import nasw_pallas as nk
from .native import DPF_EXT_LEFT, DPF_EXT_RIGHT
from .options import MapOpt

AL_BUCKETS = (128, 512)
NL_BUCKETS = (2048, 8192, 32768)
MIN_TPU_NL = 1024  # smaller windows are cheaper on the host


@dataclass
class _Job:
    nsq: np.ndarray
    asq: np.ndarray
    ss: np.ndarray | None
    io: int
    ext_left: bool
    result: tuple | None = None


class TpuExtEngine:
    """Batches extension DPs onto the Pallas kernel."""

    def __init__(self, opt: MapOpt, interpret: bool | None = None):
        self.opt = opt
        self.sp = DpEnv(opt).sp
        self.env = DpEnv(opt)  # host fallback
        self.scalars = (opt.go, opt.ge, opt.fs, opt.io, opt.xdrop,
                        opt.end_bonus, opt.ie_coef)
        self.mat = opt.mat
        self.interpret = interpret
        self.jobs: list[_Job] = []
        self.n_tpu = 0
        self.n_host = 0

    def submit(self, nsq, asq, ss, io, ext_left) -> int:
        self.jobs.append(_Job(nsq, asq, ss, io, ext_left))
        return len(self.jobs) - 1

    def _bucket(self, job: _Job):
        nl, al = len(job.nsq), len(job.asq)
        if nl < MIN_TPU_NL or al > AL_BUCKETS[-1] or nl > NL_BUCKETS[-1]:
            return None
        al_b = next(b for b in AL_BUCKETS if al <= b)
        nl_b = next(b for b in NL_BUCKETS if nl <= b)
        return (al_b, nl_b)

    def flush(self) -> list[tuple]:
        buckets: dict[tuple, list[int]] = {}
        for i, job in enumerate(self.jobs):
            bk = self._bucket(job)
            if bk is None:
                sc, ntl, aal, _ = self.env.dp(
                    job.nsq, job.asq,
                    DPF_EXT_LEFT if job.ext_left else DPF_EXT_RIGHT,
                    ss=job.ss, io=job.io)
                job.result = (sc, ntl, aal)
                self.n_host += 1
            else:
                buckets.setdefault(bk, []).append(i)
        for (al_b, nl_b), idxs in buckets.items():
            for c0 in range(0, len(idxs), nk.B_LANES):
                chunk = idxs[c0:c0 + nk.B_LANES]
                batch = nk.ExtBatch(al_b, nl_b, self.mat, self.scalars)
                for i in chunk:
                    job = self.jobs[i]
                    nas, aas, donor, acceptor = nk.prep_problem(
                        job.nsq, job.asq, sp=self.sp,
                        sp_null_bonus=self.opt.sp_null_bonus, io=job.io,
                        ext_left=job.ext_left, ss=job.ss)
                    batch.add(nas, aas, donor, acceptor, io=job.io)
                res = batch.run(interpret=self.interpret)
                for i, r in zip(chunk, res):
                    self.jobs[i].result = r
                self.n_tpu += len(chunk)
        out = [j.result for j in self.jobs]
        self.jobs = []
        return out


def pump_align_generators(gens: list, engine: TpuExtEngine) -> None:
    """Advance align_region_steps generators in lockstep, batching their
    extension requests through the engine."""
    waiting = {}
    for gi, g in enumerate(gens):
        try:
            waiting[gi] = next(g)
        except StopIteration:
            pass
    while waiting:
        handles = {gi: engine.submit(*req[1:]) for gi, req in waiting.items()}
        results = engine.flush()
        nxt = {}
        for gi, h in handles.items():
            try:
                nxt[gi] = gens[gi].send(results[h])
            except StopIteration:
                pass
        waiting = nxt
