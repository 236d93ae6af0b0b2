"""Build the native host runtime (libmpnative.so) on demand.

The library is rebuilt automatically whenever the source is newer than
the shared object.  FP contraction is disabled so the float32 arithmetic
in chain gap costs matches the reference build (-std=c99 implies
-ffp-contract=off there; we pin it explicitly).
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "mpnative.c")
SO = os.path.join(_DIR, "libmpnative.so")

CFLAGS = ["-O3", "-std=c11", "-ffp-contract=off", "-fPIC", "-shared",
          "-fvisibility=hidden", "-Wall"]


def ensure_built() -> str:
    if (not os.path.exists(SO)
            or os.path.getmtime(SO) < os.path.getmtime(SRC)):
        cc = os.environ.get("CC", "cc")
        cmd = [cc, *CFLAGS, SRC, "-o", SO, "-lm"]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return SO
