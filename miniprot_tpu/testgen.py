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


_NT = np.frombuffer(b"ACGT", np.uint8)
_AA = np.frombuffer(AA20.encode(), np.uint8)


def _codon_tables():
    """(table, cnt): table[a, k] = the k-th synonymous codon (3 nt codes)
    of AA20 letter a; cnt[a] = number of synonyms."""
    aa2c = _aa2codons()
    nt_i = {c: i for i, c in enumerate("ACGT")}
    table = np.zeros((20, 8, 3), np.uint8)
    cnt = np.zeros(20, np.int64)
    for a, ch in enumerate(AA20):
        for k, cod in enumerate(aa2c[ch]):
            table[a, k] = [nt_i[c] for c in cod]
        cnt[a] = len(aa2c[ch])
    return table, cnt


def _write_fasta_seq(f, ascii_arr: np.ndarray, line_len: int) -> None:
    """Write one sequence wrapped at line_len (vectorized newline insert)."""
    n = len(ascii_arr)
    full = n // line_len * line_len
    if full:
        block = ascii_arr[:full].reshape(-1, line_len)
        out = np.empty((block.shape[0], line_len + 1), np.uint8)
        out[:, :line_len] = block
        out[:, line_len] = 0x0A
        f.write(out.tobytes())
    if n > full:
        f.write(ascii_arr[full:].tobytes() + b"\n")


def make_workload(path_fa: str, path_faa: str, *, genome_len: int = 2_000_000,
                  n_genes: int = 100, seed: int = 42, n_ctg: int = 2,
                  max_exons: int = 8, max_intron: int = 20000,
                  mut_rate: float = 0.05, line_len: int = 60,
                  rev_frac: float = 0.0, fs_frac: float = 0.0,
                  pseudo_frac: float = 0.0, pseudo_mut: float = 0.01):
    """Write a synthetic genome FASTA + protein FASTA pair.

    rev_frac of the genes are implanted on the reverse strand (the gene
    region is reverse-complemented in place after writing).  fs_frac of
    the genes get a 1-2bp indel inside an exon body (a genomic
    frameshift), exercising the F/G CIGAR ops end-to-end.

    pseudo_frac of the multi-exon genes additionally get a PROCESSED
    PSEUDOGENE: the gene's intronless coding sequence (exons
    concatenated, pseudo_mut per-base substitutions, random strand)
    implanted downstream on the same contig.  This is the workload class
    that exercises the anti-pseudogene machinery — dp_max ranking
    (intron costs excluded from the ranking score, align.c:102-119) and
    the multi-exon primary preference (mp_select_multi_exon,
    hit.c:238-250).  pseudo_mut=0 plants a perfect retrocopy, forcing
    the near-tie the multi-exon preference exists to break.

    Vectorized over uint8 nt codes end-to-end so whole-genome workloads
    (hundreds of Mb) generate in seconds; the bench's 200Mb x 2000
    workload depends on this."""
    rng = np.random.default_rng(seed)
    cod_tab, cod_cnt = _codon_tables()
    per_ctg = genome_len // n_ctg
    genes_per_ctg = n_genes // n_ctg
    prots = []
    with open(path_fa, "wb") as f:
        for ci in range(n_ctg):
            g = rng.integers(0, 4, per_ctg, dtype=np.uint8)
            cursor = 1000
            for gi in range(genes_per_ctg):
                plen = int(rng.integers(100, 700))
                prot = rng.integers(0, 20, plen).astype(np.uint8)
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
                    codes = prot[bounds[e]:bounds[e + 1]]
                    syn = (rng.random(len(codes)) * cod_cnt[codes]).astype(np.int64)
                    g[pos:pos + 3 * len(codes)] = cod_tab[codes, syn].reshape(-1)
                    pos += 3 * len(codes)
                    exon_spans.append((ex_start, pos))
                    if e < n_ex - 1:
                        ilen = int(rng.integers(80, max_intron))
                        g[pos], g[pos + 1] = 2, 3                  # GT
                        g[pos + ilen - 2], g[pos + ilen - 1] = 0, 2  # AG
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
                        g[off:off + k] = rng.integers(0, 4, k, dtype=np.uint8)
                        pos += k
                cds = None
                if pseudo_frac > 0 and n_ex > 1 \
                        and rng.random() < pseudo_frac:
                    # capture the intronless coding sequence before the
                    # strand flip (a retrocopy inserts independently)
                    cds = np.concatenate([g[es:ee] for es, ee in exon_spans])
                if rng.random() < rev_frac:
                    # flip the whole gene locus to the reverse strand
                    g[cursor:pos] = (3 - g[cursor:pos])[::-1]
                cursor = pos + int(rng.integers(500, 3000))
                if cds is not None and cursor + len(cds) + 3000 < per_ctg:
                    if pseudo_mut > 0:
                        mp = rng.random(len(cds)) < pseudo_mut
                        cds = cds.copy()
                        cds[mp] = rng.integers(0, 4, int(mp.sum()),
                                               dtype=np.uint8)
                    if rng.random() < 0.5:
                        cds = (3 - cds)[::-1]
                    g[cursor:cursor + len(cds)] = cds
                    cursor += len(cds) + int(rng.integers(500, 3000))
                p = prot.copy()
                mut = rng.integers(0, plen, int(plen * mut_rate))
                p[mut] = rng.integers(0, 20, len(mut)).astype(np.uint8)
                if rng.random() < 0.2:
                    k = int(rng.integers(1, plen - 1))
                    if rng.random() < 0.5:
                        p = np.delete(p, k)
                    else:
                        p = np.insert(p, k, rng.integers(0, 20))
                prots.append((f"prot_c{ci}_{gi}", p))
            f.write(f">ctg{ci}\n".encode())
            _write_fasta_seq(f, _NT[g], line_len)
    with open(path_faa, "wb") as f:
        for name, p in prots:
            f.write(f">{name}\n".encode() + _AA[p].tobytes() + b"\n")
    return len(prots)
