"""Distributed-layer tests on a virtual CPU mesh (subprocess: the axon
TPU backend is pinned in-process, so CPU-device tests must re-exec)."""
import os
import subprocess
import sys

import pytest

SCRIPT = r"""
import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P
import sys
sys.path.insert(0, %(repo)r)
from miniprot_tpu.parallel import dist
from miniprot_tpu.index import Index
from miniprot_tpu.options import IdxOpt
from miniprot_tpu.sketch import sketch_prot
from miniprot_tpu import native

idx = Index.build(%(genome)r, IdxOpt())
mesh = dist.make_mesh(4, 2)
ki_l, kb_l = dist.shard_index_tables(mesh, idx.ki, idx.kb)

# real query seeds from the DPP3 protein, PLUS the index's hottest
# bucket (occupancy beyond any toy per-seed cap: the two-pass gather
# must fetch every hit of a kept seed, no truncation)
from miniprot_tpu.bseq import read_fastx
rec = next(read_fastx(%(query)r))
sd = sketch_prot(rec.seq, idx.opt.kmer, idx.opt.mod_bit)
native.sort_u64(sd)
hashes = (sd >> np.uint64(32)).astype(np.int64)
ki_ext = np.concatenate([np.asarray(idx.ki, np.int64), [len(idx.kb)]])
occ_all = ki_ext[1:] - ki_ext[:-1]
hot = int(np.argmax(occ_all))
hot_occ = int(occ_all[hot])
assert hot_occ > 8, "DPP3 index unexpectedly flat"

K = 32
hq = np.zeros((8, K), np.int64)
hq[0, :min(K, len(hashes))] = hashes[:K]
hq[1, 0] = hot
keep = np.ones((8, K), np.int8)
keep[2] = 0                    # a fully-masked query gathers nothing

count_step = dist.sharded_seed_count_step(mesh)
a_cap = dist._pow2_at_least(hot_occ)
step = dist.sharded_anchor_gather_step(mesh, a_cap)
with mesh:
    h = jax.device_put(hq, NamedSharding(mesh, P("q", None)))
    kp = jax.device_put(keep, NamedSharding(mesh, P("q", None)))
    kil = jax.device_put(ki_l, NamedSharding(mesh, P("g", None)))
    kbl = jax.device_put(kb_l, NamedSharding(mesh, P("g", None)))
    cnt = np.asarray(count_step(h, kil, kbl))
    blocks, seed_of, tot = step(h, kp, kil, kbl)
blocks = np.asarray(blocks); seed_of = np.asarray(seed_of)
tot = np.asarray(tot)

# pass 1: exact occupancies
for s in range(min(K, len(hashes))):
    assert cnt[0, s] == occ_all[hashes[s]], (s, cnt[0, s])
assert cnt[1, 0] == hot_occ

def gathered(qi):
    per_seed = {}
    for g in range(blocks.shape[1]):
        t = int(tot[qi, g])
        for b, s in zip(blocks[qi, g, :t], seed_of[qi, g, :t]):
            per_seed.setdefault(int(s), []).append(int(b))
    return per_seed

# pass 2: every kept seed's hits are complete (multiset vs host bucket)
ps = gathered(0)
for s in range(min(K, len(hashes))):
    expect = sorted(idx.bucket(int(hashes[s])).tolist())
    got = sorted(ps.get(s, []))
    assert got == expect, (s, len(got), len(expect))
# the hot seed gathers ALL its hits — no per-seed cap
ps1 = gathered(1)
assert sorted(ps1.get(0, [])) == sorted(idx.bucket(hot).tolist())
assert len(ps1[0]) == hot_occ
# masked query gathers nothing
assert tot[2].sum() == 0
print("SHARDED-LOOKUP-OK")
"""


def test_sharded_anchor_gather_matches_host(dpp3_files):
    genome, query = dpp3_files
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = SCRIPT % {"repo": "/root/repo", "genome": genome, "query": query}
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "SHARDED-LOOKUP-OK" in out.stdout, out.stderr[-2000:]


def test_dryrun_multichip_virtual_mesh():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = ("import sys; sys.path.insert(0, '/root/repo');"
            "import __graft_entry__ as g; g.dryrun_multichip(8);"
            "g.dryrun_multichip(3); print('DRYRUN-OK')")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "DRYRUN-OK" in out.stdout, out.stderr[-2000:]


MESH_MAP_SCRIPT = r"""
import io
import numpy as np
import sys
sys.path.insert(0, %(repo)r)
from miniprot_tpu.bseq import read_fastx
from miniprot_tpu.index import Index
from miniprot_tpu.options import IdxOpt, MapOpt
from miniprot_tpu.parallel import dist
from miniprot_tpu.pipeline import _emit_query
from miniprot_tpu.mapper import map_query
from miniprot_tpu.testgen import make_workload

fa, faa = %(fa)r, %(faa)r
make_workload(fa, faa, genome_len=400_000, n_genes=10, seed=17, n_ctg=2,
              max_intron=4000, rev_frac=0.5)
mi = Index.build(fa, IdxOpt())
opt = MapOpt()      # DEFAULT max_occ=20000: no candidate-cap override
recs = list(read_fastx(faa))
seqs = [np.frombuffer(r.seq, np.uint8) for r in recs]

mesh = dist.make_mesh(2, 4)
# a tiny chunk budget forces the chunked pass-2 path to run >1 chunk
mesh_regs = dist.mesh_map_queries(mesh, mi, seqs, opt, chunk_elems=1 << 14)


def emit(all_regs):
    buf = io.StringIO()
    idc = [0]
    for rec, seq, regs in zip(recs, seqs, all_regs):
        _emit_query(mi, opt, rec.name, seq, regs, idc, buf)
    return buf.getvalue()


local_regs = [map_query(mi, s, opt) for s in seqs]
a, b = emit(mesh_regs), emit(local_regs)
assert a == b, (len(a), len(b))
assert a.count("\n") >= 10   # the workload really mapped
print("MESH-MAP-OK")
"""


def test_mesh_map_queries_matches_local(tmp_path):
    """Integrated mesh mapping (device seed->anchor two-pass gather on a
    2x4 virtual mesh + host chain/refine/align) is byte-identical to the
    plain single-device pipeline on a real synthetic workload, at the
    DEFAULT max_occ and with the chunked pass-2 path engaged."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    code = MESH_MAP_SCRIPT % {"repo": "/root/repo",
                              "fa": str(tmp_path / "g.fa"),
                              "faa": str(tmp_path / "q.faa")}
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "MESH-MAP-OK" in out.stdout, out.stderr[-3000:]
