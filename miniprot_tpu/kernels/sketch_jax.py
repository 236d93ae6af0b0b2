"""JAX on-device six-frame ORF modimer sketching.

jit-compiled equivalent of sketch.sketch_nt4 (reference sketch.c:40-100):
translation via gathers, ORF segmentation via cummax run-length tricks
(no data-dependent shapes), the invertible hash vectorized, and the
modimer filter as a mask.  The device returns fixed-shape (values, keep)
arrays; the host compacts and merges them into the bucket index.

Used by Index.build when a TPU backend is present (and by the sharded
index build in parallel/dist.py, where each "g" shard sketches its
contig range locally).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import tables
from ..options import BITS_PER_AA


def _hash32(key, mask):
    key = (key + ~(key << jnp.uint32(15))) & mask
    key = key ^ (key >> jnp.uint32(10))
    key = (key + (key << jnp.uint32(3))) & mask
    key = key ^ (key >> jnp.uint32(6))
    key = (key + ~(key << jnp.uint32(11))) & mask
    key = key ^ (key >> jnp.uint32(16))
    return key


def _run_lengths(s):
    """For a boolean array: length of the True-run ending at t, and the
    total length of the run containing t."""
    n = s.shape[0]
    t_idx = jnp.arange(n)
    last_false = jax.lax.cummax(jnp.where(~s, t_idx, -1))
    ending = jnp.where(s, t_idx - last_false, 0)
    # suffix run length via the same trick on the reversed array
    sr = s[::-1]
    last_false_r = jax.lax.cummax(jnp.where(~sr, t_idx, -1))
    starting = jnp.where(sr, t_idx - last_false_r, 0)[::-1]
    total = jnp.where(s, ending + starting - 1, 0)
    return ending, total


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def sketch_frames(seq: jnp.ndarray, min_aa_len: int, kmer: int, mod_bit: int,
                  trans_code: int):
    """Compute modimer (hash, endpos) candidates for one strand.

    seq: (N,) uint8 nt4 codes (padded with 4s).  Returns (vals, keep):
    (hash>>mod_bit, endpos, keep) as uint32 arrays (x64 is disabled on
    this backend; the host combines them into u64 entries).
    """
    T = tables.get_tables(trans_code)
    codon_tab = jnp.asarray(T.codon)
    codon13_tab = jnp.asarray(T.codon13)
    n = seq.shape[0]
    mask_k = jnp.uint32((1 << (kmer * BITS_PER_AA)) - 1)

    s = seq.astype(jnp.int32)
    valid = (s[:-2] < 4) & (s[1:-1] < 4) & (s[2:] < 4)
    cod = jnp.where(valid, (s[:-2] << 4) | (s[1:-1] << 2) | s[2:], 0)
    aa = jnp.where(valid, codon_tab[cod], 255)
    sense = valid & (aa < 20)
    rc = codon13_tab[cod].astype(jnp.uint32)

    outs = []
    keeps = []
    for p_start in (0, 1, 2):
        ss = sense[p_start::3]
        rcs = rc[p_start::3]
        ns = ss.shape[0]
        if ns < kmer:
            continue
        ending, total = _run_lengths(ss)
        # rolling k-mer over slots
        nw = ns - kmer + 1
        x = jnp.zeros(nw, jnp.uint32)
        for t in range(kmer):
            x = x | (rcs[t:nw + t] << jnp.uint32(BITS_PER_AA * (kmer - 1 - t)))
        last = jnp.arange(nw) + (kmer - 1)
        ok = (ending[last] >= kmer) & (total[last] >= min_aa_len)
        y = _hash32(x, mask_k)
        keep = ok & ((y & jnp.uint32((1 << mod_bit) - 1)) == 0)
        pos = (p_start + 2 + 3 * last).astype(jnp.uint32)
        outs.append((y >> jnp.uint32(mod_bit), pos))
        keeps.append(keep)
    hs = jnp.concatenate([o[0] for o in outs])
    ps = jnp.concatenate([o[1] for o in outs])
    return hs, ps, jnp.concatenate(keeps)


def sketch_nt4_device(seq_codes: np.ndarray, min_aa_len: int, kmer: int,
                      mod_bit: int, bbit: int, boff: int,
                      trans_code: int = 1, chunk: int = 1 << 22) -> np.ndarray:
    """Drop-in device-backed replacement for sketch.sketch_nt4.

    Processes the whole strand in one jit call (padded to a multiple of
    8 so shape classes are shared across similarly-sized contigs).  ORF
    state spans arbitrary distances, so chunking would need full-ORF
    overlap; whole-strand calls keep the semantics trivially exact.
    """
    n = len(seq_codes)
    if n < 3:
        return np.empty(0, np.uint64)
    # pad to geometric (1.5x) size buckets so a many-contig genome
    # compiles O(log n) kernel shapes instead of one per contig length;
    # trailing 4s never emit (codons with ambiguous bases break ORFs)
    total = 4096
    while total < n + 2:
        total = -(-(total + (total >> 1)) // 8) * 8
    seq = np.concatenate([seq_codes, np.full(total - n, 4, np.uint8)])
    hs, ps, keep = sketch_frames(jnp.asarray(seq), min_aa_len, kmer, mod_bit,
                                 trans_code)
    keep = np.asarray(keep)
    hs = np.asarray(hs)[keep].astype(np.uint64)
    pos = np.asarray(ps)[keep].astype(np.uint64)
    in_range = pos < n  # padding region never emits (all 4s) but be safe
    hs, pos = hs[in_range], pos[in_range]
    blk = (pos >> np.uint64(bbit)) + np.uint64(boff)
    return (hs << np.uint64(32)) | blk
