"""Minimal API consumer (the reference example.c equivalent).

Usage: python examples/api_demo.py genome.fa[.gz]|index.mpi proteins.faa[.gz]
"""

import os
import sys

import numpy as np

try:
    import miniprot_tpu  # noqa: F401  (installed package)
except ModuleNotFoundError:  # running from a source checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miniprot_tpu.bseq import read_fastx
from miniprot_tpu.index import Index
from miniprot_tpu.mapper import map_query
from miniprot_tpu.options import IdxOpt, MapOpt


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__.strip(), file=sys.stderr)
        return 1
    idx = Index.load(sys.argv[1], IdxOpt())
    opt = MapOpt()
    for rec in read_fastx(sys.argv[2]):
        regs = map_query(idx, np.frombuffer(rec.seq, np.uint8), opt)
        for r in regs:
            ctg = idx.nt.ctg[r.vid >> 1]
            print(rec.name, len(rec.seq), r.qs, r.qe, "+-"[r.vid & 1],
                  ctg.name, r.vs, r.ve, r.p.dp_max if r.p else r.chn_sc,
                  sep="\t")
    return 0


if __name__ == "__main__":
    sys.exit(main())
