"""Simulated scaling-efficiency measurement for the mesh mapping path.

Real multi-chip hardware is not reachable from this container (one
relay-attached chip), so this combines:

  1. MEASURED single-device costs on a real synthetic workload:
     per-query host mapping time (chain/refine/align + emit) and the
     per-query candidate-merge payload of the sharded seed->anchor step
     (the only cross-shard communication in the mapping plan).
  2. The v5e interconnect model (ICI ~45 GB/s per link within a slice,
     DCN ~25 GB/s per host across slices) to project the collective
     cost at 2..16 shards.

Efficiency(n) = T1 / (n * Tn) with
  Tn = T_compute/n + T_comm(n) + T_emit_serial/n_emit
where T_comm(n) = payload * (n-1)/n / BW (psum ring over "g").

Also executes the integrated mesh batch on virtual CPU meshes of
1..8 devices (JAX_PLATFORMS=cpu) asserting byte-identical output at
every size — the correctness half of the scaling story.

Run:  python tools/scaling_sim.py
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
import time

# jax is partially imported at interpreter start in this image, so env
# changes made here are too late — re-exec with a cleaned environment
if os.environ.get("_MPX_SCALING_CHILD") != "1":
    import subprocess
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)      # detach the relay TPU
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    env["_MPX_SCALING_CHILD"] = "1"
    raise SystemExit(subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env).returncode)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    from miniprot_tpu.bseq import read_fastx
    from miniprot_tpu.index import Index
    from miniprot_tpu.mapper import map_query
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.parallel import dist
    from miniprot_tpu.pipeline import _emit_query
    from miniprot_tpu.sketch import sketch_prot
    from miniprot_tpu.testgen import make_workload
    from miniprot_tpu import native

    with tempfile.TemporaryDirectory() as td:
        fa, faa = td + "/g.fa", td + "/q.faa"
        make_workload(fa, faa, genome_len=2_000_000, n_genes=40, seed=11,
                      n_ctg=4, max_intron=10_000, rev_frac=0.5)
        mi = Index.build(fa, IdxOpt())
        opt = MapOpt()
        opt.max_occ = 64
        recs = list(read_fastx(faa))
        seqs = [np.frombuffer(r.seq, np.uint8) for r in recs]

        # measured per-query host compute (the data-parallel part)
        t0 = time.perf_counter()
        local = [map_query(mi, s, opt) for s in seqs]
        t_compute = (time.perf_counter() - t0) / len(seqs)

        # measured per-query emit cost (serial on host 0)
        buf = io.StringIO()
        idc = [0]
        t0 = time.perf_counter()
        for rec, seq, regs in zip(recs, seqs, local):
            _emit_query(mi, opt, rec.name, seq, regs, idc, buf)
        t_emit = (time.perf_counter() - t0) / len(seqs)
        golden = buf.getvalue()

        # candidate-merge payload per query: K seeds x CAP slots
        CAP = 64
        K = max(len(sketch_prot(s, mi.opt.kmer, mi.opt.mod_bit))
                for s in seqs)
        payload = K * CAP * (4 + 4) + K * 8   # hits + valid + cnt, bytes

        # correctness at every mesh size that fits 8 virtual devices
        for n in (1, 2, 4, 8):
            n_g = 2 if n % 2 == 0 else 1
            mesh = dist.make_mesh(n_g, n // n_g)
            regs = dist.mesh_map_queries(mesh, mi, seqs, opt, cap=CAP)
            buf = io.StringIO()
            idc = [0]
            for rec, seq, rr in zip(recs, seqs, regs):
                _emit_query(mi, opt, rec.name, seq, rr, idc, buf)
            assert buf.getvalue() == golden, f"mesh size {n} diverged"
        print(f"mesh sizes 1/2/4/8: byte-identical output "
              f"({len(golden.splitlines())} records)")

        print(f"measured: t_compute={t_compute*1e3:.2f} ms/query, "
              f"t_emit={t_emit*1e3:.3f} ms/query, "
              f"merge payload={payload/1024:.1f} KiB/query")
        for bw_name, bw in (("ICI 45 GB/s", 45e9), ("DCN 25 GB/s", 25e9)):
            print(f"projected scaling efficiency over {bw_name}:")
            for n in (2, 4, 8, 16):
                t_comm = payload * (n - 1) / n / bw
                tn = t_compute / n + t_comm + t_emit
                eff = t_compute / (n * tn)
                print(f"  n={n:2d}: {100*eff:.1f}%"
                      f"  (comm {t_comm*1e6:.1f} us/query)")


if __name__ == "__main__":
    main()
