"""K-mer sketching ("modimers") over proteins and six-frame genome ORFs.

NumPy-vectorized equivalents of the reference sketchers (sketch.c):

- sketch_prot: rolling reduced-alphabet k-mer over a protein, keeping
  k-mers whose invertible 32-bit hash has its low mod_bit bits zero.
- sketch_nt4: per-strand three-frame ORF scan (the caller iterates the
  two strands, giving six frames) emitting modimers of ORFs of at least
  min_aa_len codons, binned into 2^bbit-bp blocks.

Output entries are u64 = (hash >> mod_bit) << 32 | payload where payload
is the query aa position (protein) or the global block id (genome).
The genome variant's output order is undefined (the caller sorts and
dedups), which is what makes it a clean JAX/TPU pipeline: translate via
gather, segment via boolean runs, hash vectorized, sort on device.
"""

from __future__ import annotations

import numpy as np

from . import tables
from .options import BITS_PER_AA


def hash32_mask(key: np.ndarray, mask: int) -> np.ndarray:
    """Invertible integer hash (sketch.c:7-16), vectorized uint32."""
    key = key.astype(np.uint32)
    m = np.uint32(mask)
    key = (key + ~(key << np.uint32(15))) & m
    key ^= key >> np.uint32(10)
    key = (key + (key << np.uint32(3))) & m
    key ^= key >> np.uint32(6)
    key = (key + ~(key << np.uint32(11))) & m
    key ^= key >> np.uint32(16)
    return key


def _rolling_kmers(codes: np.ndarray, ok: np.ndarray, kmer: int):
    """All k-length windows of `codes` packed 4 bits/symbol, plus a mask of
    windows whose symbols are all `ok`.  Window w covers codes[w:w+kmer]."""
    n = len(codes)
    nw = n - kmer + 1
    if nw <= 0:
        return np.empty(0, np.uint32), np.empty(0, bool)
    x = np.zeros(nw, np.uint32)
    valid = np.ones(nw, bool)
    for t in range(kmer):
        x |= codes[t:nw + t].astype(np.uint32) << np.uint32(BITS_PER_AA * (kmer - 1 - t))
        valid &= ok[t:nw + t]
    return x, valid


def sketch_prot(seq: bytes | np.ndarray, kmer: int, mod_bit: int) -> np.ndarray:
    """Protein modimers: u64 = (hash>>mod_bit)<<32 | endpos
    (mp_sketch_prot, sketch.c:18-38).  Entries in query-position order."""
    if not isinstance(seq, np.ndarray):
        seq = np.frombuffer(seq, dtype=np.uint8)
    aa13 = tables.get_tables(1).aa13  # reduced alphabet is code-independent
    r = aa13[seq]
    x, valid = _rolling_kmers(r, r < 14, kmer)
    if len(x) == 0:
        return np.empty(0, np.uint64)
    mask_k = (1 << (kmer * BITS_PER_AA)) - 1
    y = hash32_mask(x, mask_k)
    keep = valid & ((y & np.uint32((1 << mod_bit) - 1)) == 0)
    idx = np.flatnonzero(keep)
    return (y[idx].astype(np.uint64) >> np.uint64(mod_bit)) << np.uint64(32) \
        | (idx + (kmer - 1)).astype(np.uint64)


def sketch_nt4(seq: np.ndarray, min_aa_len: int, kmer: int, mod_bit: int,
               bbit: int, boff: int, trans_code: int = 1) -> np.ndarray:
    """Genome-strand modimers over 3-frame ORFs (mp_sketch_nt4 +
    mp_sketch_clean_orf, sketch.c:40-100).

    seq: nt4 codes of one contig strand.  Returns the (hash,block) u64
    multiset (unordered; caller sorts + dedups).
    """
    T = tables.get_tables(trans_code)
    n = len(seq)
    if n < 3:
        return np.empty(0, np.uint64)
    # codon ending at i (i >= 2) and its validity/sense
    c = (seq[:-2].astype(np.uint16) << 4) | (seq[1:-1].astype(np.uint16) << 2) | seq[2:]
    ambi = seq >= 4
    valid = ~(ambi[:-2] | ambi[1:-1] | ambi[2:])
    aa = np.where(valid, T.codon[np.where(valid, c, 0).astype(np.uint8)], 255)
    sense = valid & (aa < 20)  # in-frame, translatable, non-stop
    rc = T.codon13[np.where(valid, c, 0).astype(np.uint8)]
    mask_k = (1 << (kmer * BITS_PER_AA)) - 1
    out = []
    for p_start in (0, 1, 2):  # codon end positions 2,3,4 mod 3
        s = sense[p_start::3]
        rcs = rc[p_start::3]
        ns = len(s)
        if ns == 0:
            continue
        # run-length structure over codon slots
        prev = np.concatenate([[False], s[:-1]])
        starts = s & ~prev
        run_id = np.cumsum(starts) - 1
        # run start slot per slot, run length per run
        start_slots = np.flatnonzero(starts)
        if len(start_slots) == 0:
            continue
        ends = s & ~np.concatenate([s[1:], [False]])
        end_slots = np.flatnonzero(ends)
        run_len = end_slots - start_slots + 1
        # k-mer windows within slots: window w = slots [w, w+kmer)
        x, _ = _rolling_kmers(rcs, np.ones(ns, bool), kmer)
        nw = len(x)
        if nw == 0:
            continue
        w = np.arange(nw)
        last = w + kmer - 1  # slot of the k-mer's last codon
        ok = s[last] & (run_id[last] >= 0)
        ok &= start_slots[np.maximum(run_id[last], 0)] <= w  # window inside one run
        ok &= run_len[np.maximum(run_id[last], 0)] >= min_aa_len
        idx = np.flatnonzero(ok)
        if len(idx) == 0:
            continue
        y = hash32_mask(x[idx], mask_k)
        keep = (y & np.uint32((1 << mod_bit) - 1)) == 0
        idx, y = idx[keep], y[keep]
        # codon end position of window's last codon: p_start + 2 + 3*last_slot
        pos = (p_start + 2 + 3 * (idx + kmer - 1)).astype(np.uint64)
        blk = (pos >> np.uint64(bbit)) + np.uint64(boff)
        out.append((y.astype(np.uint64) >> np.uint64(mod_bit)) << np.uint64(32) | blk)
    if not out:
        return np.empty(0, np.uint64)
    return np.concatenate(out)
