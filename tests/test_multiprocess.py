"""True multi-process distributed test: 2 coordinated jax processes
(jax.distributed over localhost, the DCN-coordination analog), each with
4 virtual CPU devices, form one global 2x4 Mesh("g", "q") and run the
sharded anchor-gather step.  Each process validates the shards it can
address against a host-side bucket lookup.

This exercises the cross-process path the single-process virtual-mesh
tests cannot: global array construction from per-process shards and
collectives (psum over "g") spanning process boundaries.
"""
import os
import socket
import subprocess
import sys

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import numpy as np
import jax
jax.distributed.initialize(coordinator_address=sys.argv[2],
                           num_processes=2, process_id=int(sys.argv[1]))
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
sys.path.insert(0, %(repo)r)
from miniprot_tpu.parallel import dist

assert len(jax.devices()) == 8, jax.devices()
mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("g", "q"))

# deterministic synthetic bucket table, identical in both processes
rng = np.random.default_rng(7)
n_bucket = 512
counts = rng.integers(0, 6, n_bucket)
ki = np.zeros(n_bucket, np.int64)
np.cumsum(counts[:-1], out=ki[1:])
kb = rng.integers(1, 10**6, int(counts.sum())).astype(np.uint32)
ki_l, kb_l = dist.shard_index_tables(mesh, ki, kb)
NQ, K = 8, 16
hashes = rng.integers(0, n_bucket, (NQ, K)).astype(np.int64)
keep = np.ones((NQ, K), np.int8)

def gshard(arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh, lambda i: arr[i])

ki_ext = np.concatenate([ki, [len(kb)]])
occ = ki_ext[hashes + 1] - ki_ext[hashes]
a_cap = dist._pow2_at_least(int(occ.sum(axis=1).max()))
step = dist.sharded_anchor_gather_step(mesh, a_cap)
with mesh:
    h = gshard(hashes, P("q", None))
    kp = gshard(keep, P("q", None))
    kil = gshard(ki_l, P("g", None))
    kbl = gshard(kb_l, P("g", None))
    blocks, seed_of, tot = step(h, kp, kil, kbl)
    jax.block_until_ready((blocks, seed_of, tot))

# host-side expectation: the FULL bucket of every seed (no cap)
def expect(hash_):
    return kb[ki_ext[hash_]:ki_ext[hash_ + 1]]

# validate every shard this process can address
for shard in blocks.addressable_shards:
    q0 = shard.index[0].start or 0
    data = np.asarray(shard.data)          # (nq_local, n_g, a_cap)
    sdata = np.asarray(seed_of.addressable_shards[
        [s.index for s in seed_of.addressable_shards].index(shard.index)].data)
    tdata = np.asarray(tot.addressable_shards[
        [s.index[:2] for s in tot.addressable_shards].index(
            shard.index[:2])].data)
    for qi in range(data.shape[0]):
        per_seed = {}
        for g in range(data.shape[1]):
            t = int(tdata[qi, g])
            for b, s in zip(data[qi, g, :t], sdata[qi, g, :t]):
                per_seed.setdefault(int(s), []).append(int(b))
        for s in range(K):
            e = expect(int(hashes[q0 + qi, s]))
            got = per_seed.get(s, [])
            assert sorted(got) == sorted(e.tolist()), (q0 + qi, s)
print("MP-OK-" + sys.argv[1], flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_sharded_anchor_gather():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    coord = f"127.0.0.1:{_free_port()}"
    code = WORKER % {"repo": "/root/repo"}
    procs = [subprocess.Popen([sys.executable, "-c", code, str(i), coord],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc {i}: {err[-2000:]}"
        assert f"MP-OK-{i}" in out, (out, err[-2000:])


MAP_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
NP = int(sys.argv[3])
jax.distributed.initialize(coordinator_address=sys.argv[2],
                           num_processes=NP, process_id=int(sys.argv[1]))
sys.path.insert(0, %(repo)r)
from miniprot_tpu.index import Index
from miniprot_tpu.options import IdxOpt, MapOpt
from miniprot_tpu.parallel.runner import map_file_multihost

pid = int(sys.argv[1])
mi = Index.build(%(fa)r, IdxOpt())
opt = MapOpt()
opt.flag |= %(flag)d
with open(%(out)r, "w") if pid == 0 else open(os.devnull, "w") as out:
    map_file_multihost(mi, %(faa)r, opt, pid, NP, %(spool)r, out)
print("MAP-OK-" + str(pid), flush=True)
"""


import pytest


@pytest.mark.parametrize("n_proc,mode", [(2, "paf"), (4, "paf"),
                                         (2, "gff"), (4, "gff"),
                                         (4, "gtf")])
def test_multi_process_mapping_matches_single(tmp_path, n_proc, mode):
    """Data-parallel mapping across coordinated processes with the
    streaming k-way spool merge on proc 0 must be byte-identical to the
    single-process pipeline.  PAF mode exercises the PARALLEL emit
    (shards format their own text, proc 0 only concatenates); GFF/GTF
    exercise the two-phase deferred-id emit (shards format with
    sentinel ids, proc 0 splices in the global id base — the output-
    order MP%06d ids must come out exactly as a serial run assigns
    them)."""
    from miniprot_tpu.testgen import make_workload
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import F_GFF, F_GTF, IdxOpt, MapOpt
    from miniprot_tpu.pipeline import map_file
    import io as _io

    flag = {"paf": 0, "gff": F_GFF, "gtf": F_GTF}[mode]
    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=600_000, n_genes=12, seed=3, n_ctg=2,
                  max_intron=5000, rev_frac=0.3)
    # single-process golden
    mi = Index.build(fa, IdxOpt())
    buf = _io.StringIO()
    opt = MapOpt()
    opt.flag |= flag
    map_file(mi, faa, opt, 1, out=buf)
    golden = buf.getvalue()

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out_path = str(tmp_path / "mp.paf")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    coord = f"127.0.0.1:{_free_port()}"
    code = MAP_WORKER % {"repo": "/root/repo", "fa": fa, "faa": faa,
                         "out": out_path, "spool": spool, "flag": flag}
    procs = [subprocess.Popen([sys.executable, "-c", code, str(i), coord,
                               str(n_proc)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(n_proc)]
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0 and f"MAP-OK-{i}" in out, (out, err[-2000:])
    with open(out_path) as f:
        assert f.read() == golden


def test_eight_process_gff_two_phase_emit(tmp_path):
    """8 coordinated processes, GFF mode, on a tandem-heavy workload
    producing a multi-thousand-record stream: the two-phase deferred-id
    emit (shards format with sentinel ids, proc 0 splices the running
    MP%06d base) must be byte-identical to a single-process run at a
    record volume where any id-splice off-by-one would surface."""
    from miniprot_tpu.testgen import make_workload
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import F_GFF, IdxOpt, MapOpt
    from miniprot_tpu.pipeline import map_file
    import io as _io

    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=4_000_000, n_genes=210, seed=11,
                  n_ctg=3, max_intron=4000, rev_frac=0.3, tandem_frac=0.7)
    mi = Index.build(fa, IdxOpt())
    buf = _io.StringIO()
    opt = MapOpt()
    opt.flag |= F_GFF
    map_file(mi, faa, opt, 1, out=buf)
    golden = buf.getvalue()
    n_records = sum(1 for ln in golden.splitlines()
                    if ln and not ln.startswith("##"))
    assert n_records >= 2000, n_records   # the stream must be heavy

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    out_path = str(tmp_path / "mp.gff")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    coord = f"127.0.0.1:{_free_port()}"
    code = MAP_WORKER % {"repo": "/root/repo", "fa": fa, "faa": faa,
                         "out": out_path, "spool": spool, "flag": F_GFF}
    procs = [subprocess.Popen([sys.executable, "-c", code, str(i), coord,
                               "8"],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for i in range(8)]
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0 and f"MAP-OK-{i}" in out, (out, err[-2000:])
    with open(out_path) as f:
        assert f.read() == golden


def test_cli_shards_match_single(tmp_path):
    """The CLI --shards/--shard-id/--spool-dir flags (independent
    processes over a shared spool dir, no jax.distributed) produce
    byte-identical output to a plain single-process CLI run, and an
    existing spool is honored as a checkpoint (rerun skips mapping)."""
    from miniprot_tpu.testgen import make_workload

    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=400_000, n_genes=8, seed=11, n_ctg=2,
                  max_intron=4000, rev_frac=0.4)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # plain CPU children
    single = subprocess.run(
        [sys.executable, "-m", "miniprot_tpu.cli", "--no-tpu", "-t1", fa, faa],
        env=env, capture_output=True, text=True, timeout=600, check=True)

    spool = str(tmp_path / "spool")
    out_path = str(tmp_path / "sharded.paf")
    n = 3
    procs = [subprocess.Popen(
        [sys.executable, "-m", "miniprot_tpu.cli", "--no-tpu", "-t1",
         "--shards", str(n), "--shard-id", str(i), "--spool-dir", spool,
         *(["-o", out_path] if i == 0 else []), fa, faa],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(n)]
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err
    got = open(out_path).read()
    assert got == single.stdout
    assert got.count("\n") >= 8

    # checkpoint semantics: shard 1's spool exists, rerun must skip its
    # mapping (and the emitter must still produce identical output)
    os.remove(out_path)
    r = subprocess.run(
        [sys.executable, "-m", "miniprot_tpu.cli", "--no-tpu", "-t1",
         "--shards", str(n), "--shard-id", "0", "--spool-dir", spool,
         "-o", out_path, fa, faa],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    assert open(out_path).read() == single.stdout


def test_shard_engine_spool_matches_host(tmp_path, monkeypatch):
    """map_shard(use_tpu=True) routes the shard's alignment DPs through
    the batching engine (interpret mode on CPU) and spools Region
    records identical to the host-engine shard."""
    import pickle
    import numpy as np
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.parallel.runner import map_shard, spool_path
    from miniprot_tpu.testgen import make_workload
    import miniprot_tpu.pipeline as pl

    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=24_000, n_genes=1, seed=9, n_ctg=1,
                  max_intron=900, max_exons=3, rev_frac=0.0)
    mi = Index.build(fa, IdxOpt())
    opt = MapOpt()
    opt.max_ext = 1100   # keep interpret-mode ext rectangles small
    # Deterministic CPU run: force the CPU jax backend in-process (the
    # relay site hook force-selects its platform via jax.config, and a
    # degraded relay would wedge backend init), disable the batch
    # watchdog (an abandoned watchdog thread aborts interpreter
    # teardown), and let the engine construct in interpret mode.
    import jax
    jax.config.update("jax_platforms", "cpu")
    monkeypatch.setenv("MINIPROT_TPU_BATCH_TIMEOUT", "0")
    monkeypatch.setattr(pl, "_probe_backend_guarded", lambda: None)

    def load(pid_dir):
        # PAF mode spools (qi, formatted_text) — the parallel-emit path;
        # comparing the final text is the strongest equality
        recs = []
        with open(spool_path(pid_dir, 0), "rb") as f:
            while True:
                try:
                    recs.append(pickle.load(f))
                except EOFError:
                    break
        return recs

    d1, d2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    os.makedirs(d1), os.makedirs(d2)
    n1 = map_shard(mi, faa, opt, 0, 1, d1, use_tpu=False)
    n2 = map_shard(mi, faa, opt, 0, 1, d2, use_tpu=True)
    assert n1 == n2 == 1
    assert load(d1) == load(d2)
