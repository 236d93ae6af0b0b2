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

from .options import IdxOpt, MapOpt  # noqa: F401
