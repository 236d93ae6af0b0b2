"""Simulated scaling-efficiency measurement for the mesh mapping path.

Real multi-chip hardware is not reachable from this container (one
relay-attached chip), so this combines:

  1. MEASURED single-device costs on a real synthetic workload at a
     REALISTIC query count (2,000 proteins, 50Mb genome): per-query host
     mapping time, per-query serial emit time, and the per-query
     candidate payload of the two-pass sharded seed->anchor gather (the
     only cross-shard communication in the mapping plan).
  2. The v5e interconnect model (ICI ~45 GB/s per link within a slice,
     DCN ~25 GB/s per host across slices) to project the collective
     cost at 2..64 shards.

Model (no-overlap, conservative):
  T1      = t_compute + t_emit                      (per query)
  Tn      = t_compute/n + t_comm(n) + t_emit        (emit serial, host 0)
  eff(n)  = T1 / (n * Tn)
with t_comm(n) = pass-1 ring psum of K seed counts + pass-2 all_gather
of the kept candidate buffers: payload * (n-1)/n / BW.

A second table projects the DEVICE-DP composition (mesh gather + Pallas
alignment DPs): the host term shrinks by the measured host-DP share and
a data-parallel device-kernel term (cells/query at the measured kernel
rates) is added.

Also executes the integrated mesh batch on virtual CPU meshes of
1..8 devices (JAX_PLATFORMS=cpu) asserting byte-identical output at
every size — the correctness half of the scaling story.

Run:  python tools/scaling_sim.py [--n-genes 2000] [--genome-mb 50]
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
        [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
        env=env).returncode)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# measured device-kernel rates on the attached v5e (BENCH_r03 inputs;
# see bigbench/README): extension kernel GCUPS, CIGAR kernel GCUPS, and
# the per-query device cell counts from the 200Mb x 2000 --tpu run
EXT_GCUPS = 35.7
CIG_GCUPS = 1.0
CELLS_EXT_PER_Q = 12.22e9 / 2000
CELLS_CIG_PER_Q = 4.03e9 / 2000
HOST_DP_SHARE = 0.16   # measured: host-path DP time / host map time


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-genes", type=int, default=2000)
    ap.add_argument("--genome-mb", type=int, default=50)
    ap.add_argument("--correctness-queries", type=int, default=200)
    args = ap.parse_args()

    from miniprot_tpu import native
    from miniprot_tpu.bseq import read_fastx
    from miniprot_tpu.index import Index
    from miniprot_tpu.mapper import map_query, seed_anchors
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.parallel import dist
    from miniprot_tpu.pipeline import _emit_query
    from miniprot_tpu.sketch import sketch_prot
    from miniprot_tpu.sysutil import disable_numpy_thp
    disable_numpy_thp()

    with tempfile.TemporaryDirectory() as td:
        fa, faa = td + "/g.fa", td + "/q.faa"
        make_kw = dict(genome_len=args.genome_mb * 1_000_000,
                       n_genes=args.n_genes, seed=11, n_ctg=4,
                       max_intron=10_000, rev_frac=0.5)
        from miniprot_tpu.testgen import make_workload
        n_q = make_workload(fa, faa, **make_kw)
        mi = Index.build(fa, IdxOpt())
        opt = MapOpt()                       # DEFAULT options
        recs = list(read_fastx(faa))
        seqs = [np.frombuffer(r.seq, np.uint8) for r in recs]
        print(f"workload: {n_q} proteins x {args.genome_mb}Mb genome")

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

        # two-pass gather payload per query, MEASURED from the real
        # anchor sets: pass 1 = K seed counts (int64, ring-psum), pass 2
        # = kept candidates all_gathered (uint32 block + int32 seed_of)
        n_anchor = np.mean([len(seed_anchors(mi, s, opt)) for s in seqs])
        K = max(len(sketch_prot(s, mi.opt.kmer, mi.opt.mod_bit))
                for s in seqs)
        payload1 = K * 8
        payload2 = n_anchor * 8
        print(f"measured: t_compute={t_compute*1e3:.2f} ms/query, "
              f"t_emit={t_emit*1e3:.3f} ms/query, "
              f"K={K} seeds, {n_anchor:.0f} anchors/query "
              f"(pass2 payload {payload2/1024:.1f} KiB/query)")

        # correctness at every mesh size that fits 8 virtual devices
        nc = min(args.correctness_queries, len(seqs))
        sub_golden = None
        for n in (1, 2, 4, 8):
            n_g = 2 if n % 2 == 0 else 1
            mesh = dist.make_mesh(n_g, n // n_g)
            regs = dist.mesh_map_queries(mesh, mi, seqs[:nc], opt)
            buf = io.StringIO()
            idc = [0]
            for rec, seq, rr in zip(recs[:nc], seqs[:nc], regs):
                _emit_query(mi, opt, rec.name, seq, rr, idc, buf)
            if sub_golden is None:
                buf2 = io.StringIO()
                idc2 = [0]
                for rec, seq, rr in zip(recs[:nc], seqs[:nc], local[:nc]):
                    _emit_query(mi, opt, rec.name, seq, rr, idc2, buf2)
                sub_golden = buf2.getvalue()
            assert buf.getvalue() == sub_golden, f"mesh size {n} diverged"
        print(f"mesh sizes 1/2/4/8: byte-identical output on {nc} queries "
              f"at DEFAULT max_occ ({len(sub_golden.splitlines())} records)")

        # measured proc-0 concat cost for the parallel (PAF) emit: the
        # shards pre-format their text, proc 0 only writes bytes
        t0 = time.perf_counter()
        sink = io.StringIO()
        sink.write(golden)
        t_concat = (time.perf_counter() - t0) / len(seqs)

        # GFF two-phase emit (runner._DeferredId): shards format with
        # sentinel ids (cost scales 1/n), proc 0 splices the global id
        # base into each record — measure both halves on real output
        from miniprot_tpu.options import F_GFF
        from miniprot_tpu.parallel.runner import _DeferredId, _rewrite_ids
        opt_gff = MapOpt()
        opt_gff.flag |= F_GFF
        texts = []
        t0 = time.perf_counter()
        for rec, seq, regs in zip(recs, seqs, local):
            b = io.StringIO()
            idc = [_DeferredId(0)]
            _emit_query(mi, opt_gff, rec.name, seq, regs, idc, b)
            texts.append((b.getvalue(), idc[0].local))
        t_emit_gff = (time.perf_counter() - t0) / len(seqs)
        t0 = time.perf_counter()
        base = 0
        for tx, ne in texts:
            sink.write(_rewrite_ids(tx, base))
            base += ne
        t_splice = (time.perf_counter() - t0) / len(seqs)
        print(f"GFF two-phase emit: format {t_emit_gff*1e3:.3f} ms/query "
              f"(shard-side), id-splice {t_splice*1e3:.4f} ms/query "
              f"(proc 0)")

        # host-engine and device-DP-composed projections, x serial
        # (GFF: output-order ids) vs parallel (PAF: shard-side
        # formatting, runner.emit_is_parallel) emit
        t_dp_dev = (CELLS_EXT_PER_Q / EXT_GCUPS
                    + CELLS_CIG_PER_Q / CIG_GCUPS) / 1e9
        t_host_dev = t_compute * (1.0 - HOST_DP_SHARE)
        for bw_name, bw in (("ICI 45 GB/s", 45e9), ("DCN 25 GB/s", 25e9)):
            print(f"projected scaling efficiency over {bw_name} "
                  f"(host-DP | device-DP; legacy-serial GFF / parallel "
                  f"PAF / two-phase GFF emit):")
            brk = {}
            for n in (2, 4, 8, 16, 32, 64):
                t_comm = (payload1 + payload2) * (n - 1) / n / bw
                effs = {}
                for dp_name, t_par in (("h", t_compute),
                                       ("d", t_host_dev + t_dp_dev)):
                    # (emit variant, T1 emit term, Tn proc-0 emit term)
                    for em_name, t1_em, t_ser in (
                            ("ser", t_emit_gff, t_emit_gff),
                            ("par", t_emit, t_emit / n + t_concat),
                            ("gff", t_emit_gff,
                             t_emit_gff / n + t_splice)):
                        tn = t_par / n + t_comm + t_ser
                        eff = (t_par + t1_em) / (n * tn)
                        effs[dp_name + em_name] = eff
                        if eff < 0.80 and (dp_name, em_name) not in brk:
                            brk[(dp_name, em_name)] = n
                print(f"  n={n:2d}: {100*effs['hser']:5.1f}/"
                      f"{100*effs['hpar']:5.1f}/{100*effs['hgff']:5.1f}% | "
                      f"{100*effs['dser']:5.1f}/{100*effs['dpar']:5.1f}/"
                      f"{100*effs['dgff']:5.1f}%"
                      f"  (comm {t_comm*1e6:.1f} us/query)")
            print(f"  80% breaks at: host-DP {brk.get(('h','ser'),'>64')}"
                  f" (legacy-serial) / {brk.get(('h','par'),'>64')} (PAF) / "
                  f"{brk.get(('h','gff'),'>64')} (two-phase GFF); "
                  f"device-DP {brk.get(('d','ser'),'>64')} (legacy-serial) / "
                  f"{brk.get(('d','par'),'>64')} (PAF) / "
                  f"{brk.get(('d','gff'),'>64')} (two-phase GFF)")


if __name__ == "__main__":
    main()
