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
        sys.stderr.write(f"[WARNING] {msg}\n")


def error(fmt: str, *args) -> None:
    if verbose >= 1:
        msg = fmt % args if args else fmt
        sys.stderr.write(f"[ERROR] {msg}\n")
