"""Pallas TPU kernel: anchor chaining (device mode).

Scores the minimap2-style chaining DP (chain.c:112-209) on TPU:

  f[i] = max(kmer, max_{j in window} f[j] + sc(i, j))

Layout: 8 queries across sublanes, anchors across lanes in 128-aligned
blocks.  The anchor loop is sequential (f[j] must be final before i
reads it); each step scores the current anchor of all 8 queries against
a 256-anchor window (the current and previous lane blocks) in one
(8, 256) vector op set.  The predecessor argmax is emitted per anchor;
the host backtracks chains from (f, p).

This is the *device* chaining mode: it drops the reference's max_skip /
max_iter / rescue pruning heuristics (inherently sequential) in favor of
an exhaustive 256-anchor window, which typically yields equal or better
chain scores but is NOT byte-identical to the reference; the native C
chainer (exact) remains the default.  See docs/DESIGN.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 8          # queries per batch (sublanes)
BLK = 128       # anchors per lane block
NEG = -(1 << 29)


def _chain_kernel(n_blocks, max_dist_x, max_dist_y, bw, kmer, bbit, is_spliced,
                  coef_log,
                  ax_ref, ay_ref, nv_ref, f_ref, p_ref, fwin, xwin, ywin):
    """ax/ay: (n_blocks*BLK, QB) anchor target/query positions, transposed
    to (QB, N) blocks in VMEM; f/p outputs (QB, N)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (QB, 2 * BLK), 1)

    def block_body(b, _):
        # window tiles: previous and current blocks
        off = pl.multiple_of(b * BLK, BLK)
        prev = pl.multiple_of(jnp.maximum(b - 1, 0) * BLK, BLK)
        xwin[:, :BLK] = ax_ref[:, pl.ds(prev, BLK)]
        xwin[:, BLK:] = ax_ref[:, pl.ds(off, BLK)]
        ywin[:, :BLK] = ay_ref[:, pl.ds(prev, BLK)]
        ywin[:, BLK:] = ay_ref[:, pl.ds(off, BLK)]
        fwin[:, :BLK] = jnp.where(b > 0, f_ref[:, pl.ds(prev, BLK)], NEG)

        def step(k, _):
            i = off + k
            onehot = lane == (BLK + k)
            xw = xwin[:, :]
            yw = ywin[:, :]
            fw = fwin[:, :]
            # current anchor's coordinates, broadcast from the one-hot lane
            xi = jnp.max(jnp.where(onehot, xw, NEG), axis=1, keepdims=True)
            yi = jnp.max(jnp.where(onehot, yw, NEG), axis=1, keepdims=True)
            nv = nv_ref[:, :]  # (QB, 1) anchor counts
            # transition scores sc(i, j) for the whole window
            dq = yi - yw
            dq3 = dq * 3
            dx = xi - xw
            if bbit > 0:
                bs = 1 << bbit
                dr3 = dx << bbit
                below = dq3 < dr3 - bs
                above = dq3 > dr3 + bs
                dd = jnp.where(below, dr3 - bs - dq3,
                               jnp.where(above, dq3 - (dr3 + bs), 0))
                dd_signed = jnp.where(below, -dd, jnp.where(above, dd, 0))
                sc = jnp.minimum(kmer, dq)
                sc = sc + jnp.where((dx == 0) & (dd == 0), 2, 0)  # block bonus
                bad = (dx << bbit) > max_dist_x
            else:
                dr3 = dx
                dd = jnp.abs(dr3 - dq3)
                dd_signed = dq3 - dr3
                dr = dr3 // 3
                q = dr3 - dr * 3
                dg = jnp.minimum(dr, dq)
                sc = jnp.where((kmer <= dq) & (kmer * 3 <= dr3), kmer,
                               jnp.minimum(dg, kmer) - jnp.where(q != 0, 1, 0))
                bad = (dr3 == 0) | (dx > max_dist_x)
            bad = bad | (dq <= 0) | (dq3 > max_dist_x) | (dq > max_dist_y)
            bad = bad | (dd > bw)
            # gap penalty: lin + log (float32; device mode, not bit-parity)
            ddf = dd.astype(jnp.float32)
            lin = ddf * jnp.float32(0.33334)
            logp = jnp.where(dd >= 2,
                             coef_log * (jnp.log2(jnp.maximum(ddf + 1, 2.0)) - 1.0) + 1.0,
                             ddf)
            if is_spliced:
                pen = jnp.where(dd_signed < 0, jnp.minimum(lin, logp), lin + logp)
            else:
                pen = lin + logp
            sc = sc - pen.astype(jnp.int32)
            cand = jnp.where(bad | (lane >= BLK + k) | onehot, NEG, fw + sc)
            cand = jnp.where(lane + prev - 0 >= 0, cand, NEG)
            best = jnp.max(cand, axis=1, keepdims=True)
            bestj = jnp.max(jnp.where(cand == best, lane, -1), axis=1,
                            keepdims=True)
            take = (best > kmer) & (i < nv)
            fi = jnp.where(take, best, kmer)
            pi = jnp.where(take, bestj + prev, -1)  # lane idx is window-relative: prev + lane
            # write back into the window and outputs at the one-hot lane
            fwin[:, :] = jnp.where(onehot, fi, fwin[:, :])
            f_ref[:, pl.ds(off, BLK)] = jnp.where(
                lane[:, :BLK] == k, fi, f_ref[:, pl.ds(off, BLK)])
            p_ref[:, pl.ds(off, BLK)] = jnp.where(
                lane[:, :BLK] == k, pi, p_ref[:, pl.ds(off, BLK)])
            return 0

        jax.lax.fori_loop(0, BLK, step, 0)
        return 0

    f_ref[:, :] = jnp.full_like(f_ref, kmer)
    p_ref[:, :] = jnp.full_like(p_ref, -1)
    jax.lax.fori_loop(0, n_blocks, block_body, 0)


@functools.lru_cache(maxsize=32)
def _compiled_chain(n_blocks, max_dist_x, max_dist_y, bw, kmer, bbit,
                    is_spliced, coef_log, interpret):
    n = n_blocks * BLK
    kernel = functools.partial(_chain_kernel, n_blocks, max_dist_x, max_dist_y,
                               bw, kmer, bbit, is_spliced, coef_log)
    call = pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((QB, n), jnp.int32),
            jax.ShapeDtypeStruct((QB, n), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((QB, 2 * BLK), jnp.int32),
            pltpu.VMEM((QB, 2 * BLK), jnp.int32),
            pltpu.VMEM((QB, 2 * BLK), jnp.int32),
        ],
        interpret=interpret,
    )
    return jax.jit(call)


def chain_scores_device(anchors: list[np.ndarray], *, max_dist_x, max_dist_y,
                        bw, kmer, bbit, is_spliced, chn_coef_log,
                        interpret=None):
    """Compute (f, p) chaining arrays for up to 8 queries on the TPU.

    anchors: list of sorted u64 (pos<<32|qpos) arrays, one per query.
    Returns [(f_i, p_i)] per query.  Device mode (window=256, no pruning
    heuristics): chain scores >= the reference's for in-window chains.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert len(anchors) <= QB
    nmax = max((len(a) for a in anchors), default=1)
    n_blocks = max(1, -(-nmax // BLK))
    n = n_blocks * BLK
    ax = np.zeros((QB, n), np.int32)
    ay = np.full((QB, n), np.int32(1 << 30), np.int32)
    nv = np.zeros((QB, 1), np.int32)
    for qi, a in enumerate(anchors):
        ax[qi, :len(a)] = (a >> np.uint64(32)).astype(np.int64).astype(np.int32)
        ay[qi, :len(a)] = (a & np.uint64(0xFFFFFFFF)).astype(np.int32)
        nv[qi, 0] = len(a)
    if bbit > 0:
        mdx = max(max_dist_x, bw)
    else:
        mdx = max(max_dist_x, bw)
    mdy = max_dist_y if is_spliced else max(max_dist_y, bw)
    call = _compiled_chain(n_blocks, mdx, mdy, bw, kmer, bbit,
                           bool(is_spliced), float(chn_coef_log), interpret)
    f, p = call(jnp.asarray(ax), jnp.asarray(ay), jnp.asarray(nv))
    f = np.asarray(f)
    p = np.asarray(p)
    return [(f[qi, :len(a)].copy(), p[qi, :len(a)].copy())
            for qi, a in enumerate(anchors)]


def backtrack_chains(a: np.ndarray, f: np.ndarray, p: np.ndarray,
                     min_cnt: int, min_sc: int):
    """Greedy peak-first chain extraction from (f, p) (device mode)."""
    order = np.argsort(-f, kind="stable")
    used = np.zeros(len(a), bool)
    chains = []
    for i0 in order:
        if used[i0] or f[i0] < max(min_sc, 1):
            continue
        path = []
        i = int(i0)
        while i >= 0 and not used[i]:
            path.append(i)
            used[i] = True
            i = int(p[i])
        if len(path) >= min_cnt:
            chains.append((int(f[i0]), a[np.array(path[::-1])]))
    return chains
