"""Distributed mapping over a TPU mesh.

The reference tool is shared-memory pthreads only (kthread.c); its two
constructs map to TPU-native parallelism as:

  kt_for over queries        -> data-parallel query sharding ("q" mesh axis)
  (no analog: index too big) -> genome index sharded by block ranges
                                ("g" mesh axis), the tensor-parallel analog

A mapping step on a 2-D Mesh(g, q):

  1. queries are sharded along "q" and replicated along "g";
     the k-mer bucket table (ki/kb) is sharded along "g" by hash range
     and replicated along "q".
  2. each (g, q) shard looks up its local hash range for its local
     queries -> per-shard candidate seed counts/anchors.
  3. candidates are merged across "g" with psum/all_gather (ICI
     collectives) so every query's full candidate set lands on one
     device.
  4. the batched splice-aware DP (Pallas kernel) runs data-parallel
     along "q".
  5. results gather to host 0 for ordered emission.

Sharding the bucket table by *hash range* keeps lookups local (a query
k-mer's bucket lives on exactly one "g" shard) and the per-shard tables
memory-balanced (hashes are uniform); the all_gather payload is only the
per-query candidate lists, which ride ICI.

This module provides the sharded lookup/anchor-gather steps of that
plan (exercised against real index data on a virtual mesh in
tests/test_dist.py) and the tiny dry-run used to validate compilation
on an N-device mesh.  Whole-file multi-host mapping ships through
parallel/runner.py (query-sharded data parallelism with an ordered
process-0 merge), which is the configuration that matters while a
genome index fits one host's memory; the hash-range-sharded lookup here
is the building block for genomes that do not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_g: int, n_q: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if len(devices) < n_g * n_q:
            # the default platform may be a single relay-attached chip
            # while xla_force_host_platform_device_count provides a
            # larger virtual CPU mesh — prefer whichever fits
            try:
                cpu = jax.devices("cpu")
                if len(cpu) >= n_g * n_q:
                    devices = cpu
            except RuntimeError:
                pass
    devices = np.asarray(devices)
    assert devices.size >= n_g * n_q, (
        f"need {n_g * n_q} devices for a {n_g}x{n_q} mesh, "
        f"have {devices.size}")
    return Mesh(devices[: n_g * n_q].reshape(n_g, n_q), ("g", "q"))


def shard_index_tables(mesh: Mesh, ki: np.ndarray, kb: np.ndarray):
    """Split the bucket table by hash range along the "g" axis.

    Returns per-device (ki_local, kb_local, hash_base) host arrays; kb
    slices are padded to a common length so they form one sharded array.
    """
    n_g = mesh.shape["g"]
    n_bucket = len(ki)
    per = n_bucket // n_g
    ki_ext = np.concatenate([ki, [len(kb)]]).astype(np.int64)
    slices = []
    max_len = 0
    for g in range(n_g):
        lo, hi = g * per, (g + 1) * per if g < n_g - 1 else n_bucket
        st, en = int(ki_ext[lo]), int(ki_ext[hi])
        slices.append((ki_ext[lo:hi + 1] - st, kb[st:en]))
        max_len = max(max_len, en - st)
    ki_l = np.stack([np.pad(s[0][:per], (0, 1), constant_values=len(s[1]))
                     for s in slices])
    kb_l = np.stack([np.pad(s[1], (0, max_len - len(s[1]))) for s in slices])
    return ki_l, kb_l


def sharded_seed_count_step(mesh: Mesh):
    """Build the jitted sharded lookup+merge step.

    Input:  hashes (n_q_shard-per-device queries x K k-mers), sharded on "q";
            ki_l/kb_l sharded on "g".
    Output: per-query candidate counts merged across "g" (psum) and the
            global max count (full reduction) - the communication skeleton
            of the distributed mapper.
    """
    from jax import shard_map

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("q", None), P("g", None), P("g", None)),
        out_specs=P("q", None),
    )
    def step(hashes, ki_l, kb_l):
        # hashes: (Bq, K) global hash ids; this shard owns a hash range
        ki = ki_l[0]          # (per+1,) local bucket offsets
        n_local = ki.shape[0] - 1
        base = jax.lax.axis_index("g") * n_local
        local = hashes - base
        in_range = (local >= 0) & (local < n_local)
        idx = jnp.clip(local, 0, n_local - 1)
        cnt = jnp.where(in_range, ki[idx + 1] - ki[idx], 0)
        # merge candidate counts across the index shards (ICI psum)
        return jax.lax.psum(cnt, "g")

    return jax.jit(step)


def batched_dp_sharded(mesh: Mesh, dp_call):
    """Wrap a batched DP callable so its problem batch is sharded on the
    full mesh (both axes used as data parallelism for the DP stage)."""
    from jax import shard_map

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(("g", "q")), P(("g", "q")), P(("g", "q"))),
        out_specs=P(("g", "q")),
    )
    def step(prof, nas, nl):
        return dp_call(prof, nas, nl)

    return jax.jit(step)


def dryrun(n_devices: int) -> None:
    """Compile + run one tiny sharded mapping step on an n-device mesh.

    Exercises: 2-D mesh, "q"-sharded queries, "g"-sharded index tables,
    psum merge across "g", and a toy data-parallel DP over both axes.
    """
    devs = jax.devices()[:n_devices]
    n_g = 1
    for f in (2, 3, 5, 7):
        while n_devices % (n_g * f) == 0 and n_g * f <= max(1, n_devices // 2):
            n_g *= f
        break
    n_q = n_devices // n_g
    mesh = make_mesh(n_g, n_q, devs)

    # toy index: 1024 buckets, ~4 entries each
    rng = np.random.default_rng(0)
    n_bucket = 1024
    counts = rng.integers(0, 8, n_bucket)
    ki = np.zeros(n_bucket, np.int64)
    np.cumsum(counts[:-1], out=ki[1:])
    kb = rng.integers(0, 10**6, int(counts.sum())).astype(np.uint32)
    ki_l, kb_l = shard_index_tables(mesh, ki, kb)

    n_q_total = 8 * n_q
    hashes = rng.integers(0, n_bucket, (n_q_total, 16)).astype(np.int64)

    step = sharded_seed_count_step(mesh)
    with mesh:
        h = jax.device_put(hashes, NamedSharding(mesh, P("q", None)))
        kil = jax.device_put(ki_l, NamedSharding(mesh, P("g", None)))
        kbl = jax.device_put(kb_l, NamedSharding(mesh, P("g", None)))
        out = step(h, kil, kbl)
        out.block_until_ready()
    # cross-check against a host lookup
    ki_ext = np.concatenate([ki, [len(kb)]])
    expect = (ki_ext[hashes + 1] - ki_ext[hashes]).astype(out.dtype)
    np.testing.assert_array_equal(np.asarray(out), expect)


def sharded_anchor_gather_step(mesh: Mesh, a_cap: int):
    """Jitted sharded anchor gather, pass 2 of the two-pass plan: each
    "g" shard COMPACTS all hits of its locally-owned (query, seed) pairs
    into a flat per-query buffer of a_cap slots (slot -> seed resolved
    with a cumsum + searchsorted), then an all_gather over "g" lands
    every query's full candidate set on its "q" shard.  This is step 2+3
    of the distributed mapping plan (docs/DESIGN.md §2) with real index
    data and NO per-seed occurrence cap: a_cap bounds a query's TOTAL
    hits on one shard, which pass 1 (sharded_seed_count_step) lets the
    host size exactly, so the default max_occ=20000 configuration
    (options.c:44) runs unmodified.

    keep: (Bq, K) int8 mask of seeds that survive the per-query max_occ
    rule (occ <= max_occ, map.c:163-177) — computed on the host from
    pass 1's counts via the boxplot rule (map.c:126-141).

    Returns (blocks, seed_of, tot), each with a leading per-"g" axis:
      blocks  (Bq, n_g, a_cap) uint32 block ids, compacted per shard
      seed_of (Bq, n_g, a_cap) int32 seed index of each slot (-1 = pad)
      tot     (Bq, n_g)        int32 slots used by that shard
    """
    from jax import shard_map

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("q", None), P("q", None), P("g", None), P("g", None)),
        out_specs=(P("q", None, None), P("q", None, None), P("q", None)),
        # outputs ARE replicated over "g" (each shard holds the same
        # all_gathered assembly) but the static checker cannot infer it
        # (check_vma is the stable-API name of the old check_rep)
        check_vma=False,
    )
    def step(hashes, keep, ki_l, kb_l):
        ki = ki_l[0]
        kb = kb_l[0]
        K = hashes.shape[1]
        n_local = ki.shape[0] - 1
        base = jax.lax.axis_index("g") * n_local
        local = hashes - base
        own = (local >= 0) & (local < n_local) & (keep != 0)
        idx = jnp.clip(local, 0, n_local - 1)
        st = jnp.where(own, ki[idx], 0)
        cnt = jnp.where(own, ki[idx + 1] - ki[idx], 0)
        csum = jnp.cumsum(cnt, axis=1)              # (Bq, K) inclusive
        tot = csum[:, -1]                           # (Bq,)
        j = jnp.arange(a_cap)
        # slot j belongs to the first seed whose inclusive cumsum
        # exceeds j; within-seed rank r = j - exclusive cumsum
        s = jax.vmap(lambda cs: jnp.searchsorted(cs, j, side="right"))(
            csum).astype(jnp.int32)
        sc = jnp.clip(s, 0, K - 1)
        prev = jnp.where(
            sc > 0, jnp.take_along_axis(csum, jnp.maximum(sc - 1, 0).astype(
                jnp.int32), axis=1), 0)
        r = j[None, :] - prev
        pos = jnp.take_along_axis(st, sc, axis=1) + r
        validj = j[None, :] < tot[:, None]
        blocks = jnp.where(validj, kb[jnp.clip(pos, 0, kb.shape[0] - 1)], 0)
        seed_of = jnp.where(validj, sc, -1)
        # assemble the full candidate set on the "q" shard (ICI
        # all_gather over the index axis); outputs are identical across
        # "g" afterwards, satisfying the replicated out_specs
        blocks = jnp.moveaxis(jax.lax.all_gather(blocks, "g"), 0, 1)
        seed_of = jnp.moveaxis(jax.lax.all_gather(seed_of, "g"), 0, 1)
        tot = jnp.moveaxis(
            jax.lax.all_gather(tot.astype(jnp.int32), "g"), 0, 1)
        return blocks, seed_of, tot

    return jax.jit(step)


# ---------------------------------------------------------------------------
# Integrated mesh mapping: device seed->anchor gather feeding the exact
# host chain/refine/align rounds.
# ---------------------------------------------------------------------------


def _boxplot_max_occ(occ: np.ndarray, cap: int) -> int:
    """mp_cal_max_occ (map.c:126-141) from an occupancy vector."""
    from .. import native
    n = len(occ)
    if n < 8:
        return cap
    cnt = occ.astype(np.uint64).copy()
    native.sort_u64(cnt)
    q25 = int(cnt[int(n * 0.25 + 0.499)])
    q75 = int(cnt[int(n * 0.75 + 0.499)])
    return min(int(q75 + (q75 - q25) * 1.5 + 10.0), cap)


def _pow2_at_least(n: int, lo: int = 64) -> int:
    v = lo
    while v < n:
        v <<= 1
    return v


def mesh_map_queries(mesh: Mesh, mi, seqs, opt, *, env=None, engine=None,
                     chunk_elems: int = 1 << 25) -> list:
    """Map a batch of proteins with the seed->anchor stage on the device
    mesh (index hash-sharded on "g", queries data-parallel on "q",
    candidates assembled by all_gather over "g") and the exact
    chain/refine rounds on the host.  Byte-identical to per-query
    map_query at ANY max_occ (including the default 20000, options.c:44):
    pass 1 psums exact per-seed occupancies, the host applies the
    reference's boxplot max_occ rule, and pass 2 gathers every hit of
    every kept seed with no per-seed cap.

    engine: a device.TpuExtEngine — the alignment round's DPs then batch
    onto the Pallas kernels (sharded gather + device DP + ordered emit in
    one flow); None runs the host DP engine.

    chunk_elems bounds the pass-2 buffer (NQ_chunk * n_g * a_cap) so one
    pathological batch cannot OOM a device.

    seqs: list of np.uint8 protein arrays.  Returns per-query region
    lists in input order.
    """
    from .. import native
    from ..align import DpEnv
    from ..mapper import map_query
    from ..sketch import sketch_prot

    n_g = mesh.shape["g"]
    n_q = mesh.shape["q"]
    io = mi.opt
    env = env or DpEnv(opt)

    # host sketch (cheap); hashes padded to a rectangle for the device
    sds = []
    for seq in seqs:
        sd = sketch_prot(seq, io.kmer, io.mod_bit)
        native.sort_u64(sd)
        sds.append(sd)
    K = _pow2_at_least(max((len(s) for s in sds), default=1) or 1, 16)
    NQ = max(len(seqs), 1)
    NQ_pad = -(-NQ // n_q) * n_q
    hashes = np.zeros((NQ_pad, K), np.int64)
    nseed = np.zeros(NQ_pad, np.int64)
    for qi, sd in enumerate(sds):
        hashes[qi, :len(sd)] = (sd >> np.uint64(32)).astype(np.int64)
        nseed[qi] = len(sd)

    ki = np.asarray(mi.ki, np.int64)   # per-bucket start offsets
    kb = np.asarray(mi.kb, np.uint32)
    ki_l, kb_l = shard_index_tables(mesh, ki, kb)
    n_bucket = len(ki)
    per = n_bucket // n_g

    # ---- pass 1: exact per-(query, seed) occupancies (psum over "g")
    count_step = sharded_seed_count_step(mesh)
    with mesh:
        h_dev = jax.device_put(hashes, NamedSharding(mesh, P("q", None)))
        kil = jax.device_put(ki_l, NamedSharding(mesh, P("g", None)))
        kbl = jax.device_put(kb_l, NamedSharding(mesh, P("g", None)))
        cnt = np.asarray(count_step(h_dev, kil, kbl))

    # host: boxplot max_occ per query -> keep mask; exact per-(q, shard)
    # totals size the pass-2 buffer
    keep = np.zeros((NQ_pad, K), np.int8)
    for qi, sd in enumerate(sds):
        ns = int(nseed[qi])
        if ns == 0:
            continue
        occ = cnt[qi, :ns]
        max_occ = _boxplot_max_occ(occ, opt.max_occ) if ns >= 8 \
            else opt.max_occ
        keep[qi, :ns] = occ <= max_occ
    g_of = np.minimum(hashes // max(per, 1), n_g - 1)
    kept_cnt = np.where(keep != 0, cnt, 0)
    shard_tot = np.zeros((NQ_pad, n_g), np.int64)
    for g in range(n_g):
        shard_tot[:, g] = np.where(g_of == g, kept_cnt, 0).sum(axis=1)
    a_cap = _pow2_at_least(int(shard_tot.max()) or 1)

    # ---- pass 2: compacted variable gather, chunked over queries
    nq_budget = max(chunk_elems // max(n_g * a_cap, 1), 1)
    nq_chunk = max(min(nq_budget, NQ_pad) // n_q * n_q, n_q)
    gather_step = sharded_anchor_gather_step(mesh, a_cap)
    anchors_per_q: list[np.ndarray] = []
    with mesh:
        for q0 in range(0, NQ_pad, nq_chunk):
            hc = hashes[q0:q0 + nq_chunk]
            kc = keep[q0:q0 + nq_chunk]
            if len(hc) < nq_chunk:   # ragged tail still fills the mesh
                pad = nq_chunk - len(hc)
                hc = np.pad(hc, ((0, pad), (0, 0)))
                kc = np.pad(kc, ((0, pad), (0, 0)))
            h_dev = jax.device_put(hc, NamedSharding(mesh, P("q", None)))
            k_dev = jax.device_put(kc, NamedSharding(mesh, P("q", None)))
            blocks, seed_of, tot = gather_step(h_dev, k_dev, kil, kbl)
            blocks = np.asarray(blocks)
            seed_of = np.asarray(seed_of)
            tot = np.asarray(tot)
            for qc in range(min(nq_chunk, NQ - q0)):
                qi = q0 + qc
                assert (tot[qc] <= a_cap).all(), "pass-2 cap undersized"
                sd = sds[qi]
                qpos = (sd & np.uint64(0xFFFFFFFF)).astype(np.uint64)
                parts = []
                for g in range(n_g):
                    t = int(tot[qc, g])
                    if t == 0:
                        continue
                    bl = blocks[qc, g, :t].astype(np.uint64)
                    sl = seed_of[qc, g, :t]
                    parts.append((bl << np.uint64(32)) | qpos[sl])
                anchors_per_q.append(
                    np.concatenate(parts) if parts
                    else np.empty(0, np.uint64))

    if engine is None:
        return [map_query(mi, seq, opt, env=env, anchors=a)
                for seq, a in zip(seqs, anchors_per_q)]

    # device-DP composition: seed/chain/refine on host from the mesh
    # anchors, then the alignment round batched onto the Pallas kernels
    from ..align import align_region_steps
    from ..device import pump_align_generators
    from ..mapper import finish_align, pre_align

    per_query = []
    gens = []
    for seq, a in zip(seqs, anchors_per_q):
        regs, ext = pre_align(mi, seq, opt, anchors=a)
        per_query.append((seq, regs))
        for r, (el, er) in zip(regs, ext):
            gens.append(align_region_steps(env, opt, mi, len(seq), seq, r,
                                           el, er))
    pump_align_generators(gens, engine)
    return [finish_align(mi, opt, regs) for _, regs in per_query]
