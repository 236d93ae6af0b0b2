"""Deterministic synthetic benchmark/test workloads.

Generates a random genome with implanted multi-exon genes (GT..AG
introns) and a matching mutated protein set.  Used by bench.py and the
fuzz tests; no external data needed (this environment has no network
access to real genomes).
"""

from __future__ import annotations

import numpy as np

from . import tables

AA20 = "ARNDCQEGHILKMFPSTWYV"


def _aa2codons():
    T = tables.get_tables(1)
    m: dict[str, list[str]] = {}
    for c in range(64):
        aa = tables.AA_I2C[T.codon[c]]
        m.setdefault(aa, []).append("ACGT"[c >> 4] + "ACGT"[(c >> 2) & 3] + "ACGT"[c & 3])
    return m


_COMP = str.maketrans("ACGT", "TGCA")


def make_workload(path_fa: str, path_faa: str, *, genome_len: int = 2_000_000,
                  n_genes: int = 100, seed: int = 42, n_ctg: int = 2,
                  max_exons: int = 8, max_intron: int = 20000,
                  mut_rate: float = 0.05, line_len: int = 60,
                  rev_frac: float = 0.0, fs_frac: float = 0.0):
    """Write a synthetic genome FASTA + protein FASTA pair.

    rev_frac of the genes are implanted on the reverse strand (the gene
    region is reverse-complemented in place after writing).  fs_frac of
    the genes get a 1-2bp indel inside an exon body (a genomic
    frameshift), exercising the F/G CIGAR ops end-to-end."""
    rng = np.random.default_rng(seed)
    aa2c = _aa2codons()
    per_ctg = genome_len // n_ctg
    genes_per_ctg = n_genes // n_ctg
    prots = []
    with open(path_fa, "w") as f:
        for ci in range(n_ctg):
            g = rng.choice(list("ACGT"), per_ctg)
            cursor = 1000
            for gi in range(genes_per_ctg):
                plen = int(rng.integers(100, 700))
                prot = "".join(rng.choice(list(AA20), plen))
                n_ex = int(rng.integers(1, max_exons + 1))
                cuts = sorted(rng.choice(np.arange(1, plen), n_ex - 1,
                                         replace=False).tolist()) if n_ex > 1 else []
                bounds = [0] + cuts + [plen]
                need = plen * 3 + n_ex * max_intron + 2000
                if cursor + need >= per_ctg:
                    break
                pos = cursor
                exon_spans = []
                for e in range(n_ex):
                    ex_start = pos
                    for ch in prot[bounds[e]:bounds[e + 1]]:
                        cod = aa2c[ch][int(rng.integers(len(aa2c[ch])))]
                        g[pos:pos + 3] = list(cod)
                        pos += 3
                    exon_spans.append((ex_start, pos))
                    if e < n_ex - 1:
                        ilen = int(rng.integers(80, max_intron))
                        g[pos], g[pos + 1] = "G", "T"
                        g[pos + ilen - 2], g[pos + ilen - 1] = "A", "G"
                        pos += ilen
                wide = [sp for sp in exon_spans if sp[1] - sp[0] > 60]
                if fs_frac > 0 and rng.random() < fs_frac and wide \
                        and pos + 2 < per_ctg:
                    # genomic frameshift: 1-2bp indel inside an exon body
                    es, ee = wide[int(rng.integers(len(wide)))]
                    off = int(rng.integers(es + 20, ee - 20))
                    k = int(rng.integers(1, 3))
                    if rng.random() < 0.5:  # deletion
                        g[off:pos - k] = g[off + k:pos].copy()
                        pos -= k
                    else:                   # insertion
                        g[off + k:pos + k] = g[off:pos].copy()
                        g[off:off + k] = rng.choice(list("ACGT"), k)
                        pos += k
                if rng.random() < rev_frac:
                    # flip the whole gene locus to the reverse strand
                    seg = "".join(g[cursor:pos])
                    g[cursor:pos] = list(seg.translate(_COMP)[::-1])
                cursor = pos + int(rng.integers(500, 3000))
                p = list(prot)
                for _ in range(int(plen * mut_rate)):
                    p[int(rng.integers(plen))] = AA20[int(rng.integers(20))]
                if rng.random() < 0.2:
                    k = int(rng.integers(1, plen - 1))
                    if rng.random() < 0.5:
                        del p[k]
                    else:
                        p.insert(k, AA20[int(rng.integers(20))])
                prots.append((f"prot_c{ci}_{gi}", "".join(p)))
            f.write(f">ctg{ci}\n")
            s = "".join(g)
            for i in range(0, per_ctg, line_len):
                f.write(s[i:i + line_len] + "\n")
    with open(path_faa, "w") as f:
        for name, p in prots:
            f.write(f">{name}\n{p}\n")
    return len(prots)
