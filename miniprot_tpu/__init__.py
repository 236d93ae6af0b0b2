"""miniprot_tpu — a TPU-native protein-to-genome aligner.

A from-scratch reimplementation of the capabilities of lh3/miniprot
(splice- and frameshift-aware protein-to-genome alignment) designed for
TPU hardware: JAX/XLA/Pallas for the compute path (six-frame translation,
k-mer sketching, splice-aware dynamic programming) and a small native C
runtime for the exact host fallback (striped DP, chaining, radix sort)
that pins byte-for-byte output equivalence with the reference tool.

Public API (mirrors the reference C API, miniprot.h:158-286):
    Index.build(fasta, IdxOpt())        -> genome index
    Index.load(path) / index.dump(path) -> .mpi-compatible index I/O
    map_query(index, name, seq, MapOpt()) -> list[Region]
    write_output(...)                   -> PAF/GFF3/GTF emitters
"""

__version__ = "0.1.0"
MP_VERSION = "0.18-r281"  # reference parity version (miniprot.h:6)

import os as _os

# numpy madvises MADV_HUGEPAGE on every >=4MB allocation; on hosts where
# THP defrag is synchronous (virtualized/fragmented machines) that makes
# first-touch faults 100x+ slower (measured 2us -> 230-335us/page here),
# which dominates index build and batch I/O.  Genome-scale arrays gain
# nothing from THP in this access profile, so turn it off unless the
# user explicitly opted in via NUMPY_MADVISE_HUGEPAGE.
if "NUMPY_MADVISE_HUGEPAGE" not in _os.environ:
    _os.environ["NUMPY_MADVISE_HUGEPAGE"] = "0"   # forks / subprocesses
    try:  # runtime setter: numpy may already be imported (e.g. by jax)
        import numpy as _np
        _np._core.multiarray._set_madvise_hugepage(False)
    except (ImportError, AttributeError):
        try:
            _np.core.multiarray._set_madvise_hugepage(False)  # numpy 1.x
        except Exception:
            pass

from .options import IdxOpt, MapOpt  # noqa: F401
