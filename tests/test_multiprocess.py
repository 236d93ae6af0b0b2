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
NQ, K, CAP = 8, 16, 8
hashes = rng.integers(0, n_bucket, (NQ, K)).astype(np.int64)

def gshard(arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh, lambda i: arr[i])

step = dist.sharded_anchor_step(mesh, CAP)
with mesh:
    h = gshard(hashes, P("q", None))
    kil = gshard(ki_l, P("g", None))
    kbl = gshard(kb_l, P("g", None))
    hits, valid = step(h, kil, kbl)
    jax.block_until_ready((hits, valid))

# host-side expectation
ki_ext = np.concatenate([ki, [len(kb)]])
def expect(hash_):
    return kb[ki_ext[hash_]:ki_ext[hash_ + 1]][:CAP]

# validate every shard this process can address
for shard in hits.addressable_shards:
    q0 = shard.index[0].start or 0
    data = np.asarray(shard.data)
    for qi in range(data.shape[0]):
        for s in range(K):
            e = expect(int(hashes[q0 + qi, s]))
            got = data[qi, s][data[qi, s] > 0]
            assert sorted(got.tolist()) == sorted(e.tolist()), (q0 + qi, s)
print("MP-OK", sys.argv[1], flush=True)
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
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append((p.returncode, out))
    for i, (rc, out) in enumerate(outs):
        assert rc == 0, f"proc {i}: {out[-2000:]}"
        assert f"MP-OK {i}" in out, out[-2000:]
