"""Timers, peak-RSS and stderr logging (sys.c:93-127 parity).

Messages follow the reference's ``[M::func@wall*cpu] ...`` stderr format
at verbosity >= 3; mp_verbose semantics: >=1 errors, >=2 warnings,
>=3 info.
"""

from __future__ import annotations

import resource
import sys
import time

verbose = 3

_t0 = time.monotonic()
_c0 = time.process_time()


def realtime() -> float:
    return time.monotonic() - _t0


def cputime() -> float:
    return time.process_time() - _c0


def peakrss_gb() -> float:
    ru = resource.getrusage(resource.RUSAGE_SELF)
    children = resource.getrusage(resource.RUSAGE_CHILDREN)
    return max(ru.ru_maxrss, children.ru_maxrss) / 1024.0 / 1024.0


def percent_cpu() -> float:
    rt = realtime()
    return cputime() / rt if rt > 0 else 0.0


def log(func: str, fmt: str, *args, level: int = 3) -> None:
    if verbose >= level:
        msg = fmt % args if args else fmt
        sys.stderr.write(f"[M::{func}@{realtime():.3f}*{percent_cpu():.2f}] {msg}\n")


def warn(fmt: str, *args) -> None:
    if verbose >= 2:
        msg = fmt % args if args else fmt
        sys.stderr.write(f"[WARNING]\033[1;31m {msg}\033[0m\n")


def error(fmt: str, *args) -> None:
    if verbose >= 1:
        msg = fmt % args if args else fmt
        sys.stderr.write(f"[ERROR]\033[1;31m {msg}\033[0m\n")


class Profiler:
    """Per-stage wall-time + DP-cell observability (SURVEY §5.1: the
    reference only has the [M::...] stage lines; the TPU build adds
    structured stage timers and a GCUPS counter derived from DP cell
    counts).  Enabled by --profile; near-zero cost when disabled."""

    def __init__(self) -> None:
        self.enabled = False
        self.stages: dict[str, float] = {}
        self.cells_host = 0       # DP cells evaluated by the host C kernel
        self.cells_tpu = 0        # DP cells evaluated by the Pallas kernels
        self.cells_tpu_ext = 0    # split: extension kernel cells
        self.cells_tpu_cig = 0    # split: CIGAR kernel cells
        self.cells_tpu_cig_small = 0  # of those: small class (al<=32)
        self.n_dp_host = 0
        self.n_dp_tpu = 0
        # device-interaction accounting (always on, two adds per batch):
        # wall time the driving thread spent blocked inside device
        # launches/collects/fetches, and how many such round trips ran —
        # the basis for the co-located throughput projection on
        # relay-attached machines (bench.py)
        self.device_blocked_s = 0.0
        self.device_round_trips = 0
        # wall the driver thread ACTUALLY stalled on the device: collect
        # waves run on a background thread overlapped with host work, so
        # only the residual join wait counts here (device_blocked_s keeps
        # the full wave seconds for the chip-time split)
        self.device_exposed_s = 0.0
        # per-wave durations of OVERLAPPED collect waves + the count of
        # engine flush rounds: the relay floor analysis (bench/bigbench)
        # needs the wave-cost distribution and the minimum number of
        # serialized waves the pipeline could possibly issue
        self.wave_samples: list = []
        self.flush_rounds = 0
        self._open: dict[str, float] = {}

    def start(self, stage: str) -> None:
        if self.enabled:
            self._open[stage] = time.monotonic()

    def stop(self, stage: str) -> None:
        if self.enabled and stage in self._open:
            self.stages[stage] = (self.stages.get(stage, 0.0)
                                  + time.monotonic() - self._open.pop(stage))

    # cell counting is always on (two integer adds per DP call): the
    # host/device cell split is a first-class product metric (what
    # fraction of DP work lands on the chip), reported by map_file on
    # --tpu runs and by bench.py

    def add_host_dp(self, nl: int, al: int) -> None:
        self.cells_host += nl * al
        self.n_dp_host += 1

    def add_tpu_dp(self, cells: int, n: int, kind: str = "ext") -> None:
        self.cells_tpu += cells
        self.n_dp_tpu += n
        if kind.startswith("cig"):
            self.cells_tpu_cig += cells
            if kind == "cig_small":
                self.cells_tpu_cig_small += cells
        else:
            self.cells_tpu_ext += cells

    def add_device_block(self, dt: float, trips: int = 1,
                         exposed: float | None = None) -> None:
        """dt: seconds inside the device op (wave seconds).  exposed:
        seconds the driving thread actually stalled — defaults to dt
        for synchronous ops; overlapped waves pass 0.0 at issue time
        and the join side adds its residual wait separately."""
        self.device_blocked_s += dt
        self.device_round_trips += trips
        self.device_exposed_s += dt if exposed is None else exposed
        if exposed == 0.0 and dt > 0.0 and len(self.wave_samples) < 100_000:
            self.wave_samples.append(dt)

    def device_fraction(self) -> float:
        """Fraction of DP cells evaluated on the device (padded batch
        cells counted as device work; 0.0 when no DP ran)."""
        tot = self.cells_host + self.cells_tpu
        return self.cells_tpu / tot if tot else 0.0

    def report(self) -> None:
        if not self.enabled:
            return
        for stage, dt in sorted(self.stages.items()):
            sys.stderr.write(f"[P::{stage}] {dt:.3f} s\n")
        wall = self.stages.get("map") or realtime()
        if self.cells_host:
            sys.stderr.write(
                f"[P::dp_host] {self.n_dp_host} DPs, "
                f"{self.cells_host / 1e9:.3f} Gcells, "
                f"{self.cells_host / 1e9 / wall:.3f} GCUPS over the map stage\n")
        if self.cells_tpu:
            sys.stderr.write(
                f"[P::dp_tpu] {self.n_dp_tpu} DPs, "
                f"{self.cells_tpu / 1e9:.3f} Gcells (padded batches)\n")
        self._report_kernel_caches()

    @staticmethod
    def _report_kernel_caches() -> None:
        """Compile-cache telemetry: one line per populated kernel cache
        (shape-bucket keys only — scoring scalars are runtime inputs,
        so option sweeps do not recompile).  Evictions (misses beyond
        maxsize) signal a workload whose shape classes thrash the
        cache."""
        import sys as _s
        mods = []
        for name in ("nasw_pallas", "nasw_cigar_pallas"):
            m = _s.modules.get(f"miniprot_tpu.kernels.{name}")
            if m is not None:
                mods.append(m)
        for m in mods:
            for attr in dir(m):
                fn = getattr(m, attr, None)
                info = getattr(fn, "cache_info", None)
                if attr.startswith("_compiled") and info is not None:
                    ci = info()
                    if ci.misses or ci.hits:
                        sys.stderr.write(
                            f"[P::kernels] {attr}: {ci.misses} compiles, "
                            f"{ci.hits} hits, {ci.currsize}/{ci.maxsize} "
                            f"cached\n")


profiler = Profiler()


def disable_numpy_thp() -> None:
    """Stop numpy from madvising MADV_HUGEPAGE on >=4MB allocations.

    On hosts where THP defrag is synchronous (virtualized/fragmented
    machines) those faults run 100x+ slower (measured 2us ->
    230-335us/page here), dominating index build and batch I/O, and
    genome-scale arrays gain nothing from THP in this access profile.
    Called from the tool entry points (CLI, server, bench) — NOT at
    package import, so embedding applications keep their own policy.
    Respects an explicit NUMPY_MADVISE_HUGEPAGE from the user."""
    import os
    if "NUMPY_MADVISE_HUGEPAGE" in os.environ:
        return
    os.environ["NUMPY_MADVISE_HUGEPAGE"] = "0"   # forks / subprocesses
    try:  # runtime setter: numpy may already be imported (e.g. by jax)
        import numpy as np
        np._core.multiarray._set_madvise_hugepage(False)
    except (ImportError, AttributeError):
        try:
            np.core.multiarray._set_madvise_hugepage(False)  # numpy 1.x
        except Exception:
            pass


def ensure_responsive_backend(timeout: float | None = None,
                              retries: int = 1, retry_wait: float = 0.0) -> str:
    """Make sure jax backend init cannot wedge this process.

    Returns "tpu" (live accelerator backend), "cpu" (no accelerator,
    backend init healthy), or "wedged" (the relay probe hung and this
    process was demoted to CPU-only jax).

    On relay-attached machines the site hook registers the relay
    platform in EVERY python process (jax.config jax_platforms is
    force-set at startup, so JAX_PLATFORMS=cpu in the env does not
    help), and a degraded relay then blocks the first jax.devices() /
    jit of ANY process forever.  This helper probes backend init in a
    throwaway SUBPROCESS under a timeout; if the probe wedges, the
    current process is demoted: jax_platforms is forced to "cpu"
    before any backend exists here (so the relay backend is never
    initialized in-process), and the relay env triggers are removed
    from os.environ so child processes start with plain CPU jax.

    Call this at process entry (test session start, bench, driver
    entry) BEFORE the first jax backend touch.  No-op when the relay
    site hook is absent.  MINIPROT_TPU_PROBE_TIMEOUT overrides the
    default 90 s."""
    import os
    import subprocess
    import sys
    import time
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return "cpu"  # no relay hook; nothing can wedge
    if timeout is None:
        timeout = float(os.environ.get("MINIPROT_TPU_PROBE_TIMEOUT", "90"))
    for attempt in range(max(1, retries)):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print(jax.default_backend())"],
                capture_output=True, text=True, timeout=timeout)
            if r.returncode == 0:
                be = r.stdout.strip().splitlines()[-1]
                return "tpu" if be in ("tpu", "axon") else "cpu"
        except subprocess.TimeoutExpired:
            pass
        if attempt + 1 < retries and retry_wait > 0:
            time.sleep(retry_wait)
    # demote this process (and its children) to CPU-only jax
    warn("accelerator backend probe wedged; demoting this process to "
         "CPU-only jax")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)   # children: no relay hook
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")  # undo the site hook's set
    except Exception:
        pass
    try:  # the shared in-process probe must agree with the demotion
        from . import kernels
        kernels._probe_result = False
    except Exception:
        pass
    return "wedged"
