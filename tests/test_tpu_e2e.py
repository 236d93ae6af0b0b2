"""End-to-end tests of the TPU alignment engine.

These FAIL (not skip) when a live TPU backend silently falls back to the
host engine — the auto-routing contract is that a live chip runs the
alignment-round DPs.  On machines without a TPU backend they skip.
"""
import contextlib
import io
import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _on_tpu():
    from miniprot_tpu.kernels import on_tpu_backend
    return on_tpu_backend()


pytestmark = pytest.mark.skipif(not _on_tpu(), reason="needs a TPU backend")


@pytest.fixture(scope="module")
def dpp3_index(dpp3_files):
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import IdxOpt
    genome, _ = dpp3_files
    return Index.build(genome, IdxOpt())


def _map(mi, faa, use_tpu, **opt_kw):
    from miniprot_tpu.options import MapOpt
    from miniprot_tpu.pipeline import map_file
    opt = MapOpt()
    for k, v in opt_kw.items():
        setattr(opt, k, v)
    buf = io.StringIO()
    stats: dict = {}
    map_file(mi, faa, opt, n_threads=1, out=buf, use_tpu=use_tpu,
             stats=stats)
    return buf.getvalue(), stats


def test_tpu_golden_dpp3(dpp3_index, dpp3_files):
    """TPU path reproduces the golden DPP3 PAF byte-for-byte AND really
    uses the device (a silent host fallback fails this test)."""
    _, faa = dpp3_files
    out, stats = _map(dpp3_index, faa, use_tpu=True)
    assert out == (GOLDEN / "golden_dpp3.paf").read_text()
    assert stats.get("n_tpu", 0) > 0, \
        "TPU backend live but no DP batch ran on device"


def test_tpu_synthetic_parity_and_coverage(tmp_path):
    """Synthetic multi-gene workload: TPU output is byte-identical to
    the host engine and >=90%% of DP cells run on device."""
    from miniprot_tpu.index import Index
    from miniprot_tpu.options import IdxOpt
    from miniprot_tpu.testgen import make_workload
    from miniprot_tpu.sysutil import profiler
    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=800_000, n_genes=12, seed=424,
                  n_ctg=2, max_intron=8000, rev_frac=0.5)
    mi = Index.build(fa, IdxOpt())
    host_out, _ = _map(mi, faa, use_tpu=False)
    profiler.cells_host = profiler.cells_tpu = 0
    profiler.n_dp_host = profiler.n_dp_tpu = 0
    tpu_out, stats = _map(mi, faa, use_tpu=True)
    assert tpu_out == host_out
    assert stats.get("n_tpu", 0) > 0
    assert stats["device_fraction"] >= 0.90, stats


def test_mesh_gather_plus_device_dp(tmp_path):
    """SURVEY §2.3's full distributed flow in ONE path: index-sharded
    seed->anchor gather on a multi-device mesh (virtual 8-CPU here; the
    collectives are the same on ICI), the alignment round's DPs batched
    on the real TPU chip, ordered emit — byte-identical to the plain
    host pipeline, at the DEFAULT max_occ."""
    import jax

    from miniprot_tpu.bseq import read_fastx
    from miniprot_tpu.device import TpuExtEngine
    from miniprot_tpu.index import Index
    from miniprot_tpu.mapper import map_query
    from miniprot_tpu.options import IdxOpt, MapOpt
    from miniprot_tpu.parallel import dist
    from miniprot_tpu.pipeline import _emit_query
    from miniprot_tpu.testgen import make_workload

    fa, faa = str(tmp_path / "g.fa"), str(tmp_path / "q.faa")
    make_workload(fa, faa, genome_len=600_000, n_genes=8, seed=31,
                  n_ctg=2, max_intron=8000, rev_frac=0.5)
    mi = Index.build(fa, IdxOpt())
    opt = MapOpt()
    recs = list(read_fastx(faa))
    seqs = [np.frombuffer(r.seq, np.uint8) for r in recs]

    cpu = jax.devices("cpu")
    if len(cpu) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (conftest flags)")
    mesh = dist.make_mesh(2, 4, devices=cpu)
    engine = TpuExtEngine(opt)
    mesh_regs = dist.mesh_map_queries(mesh, mi, seqs, opt, engine=engine)

    def emit(all_regs):
        buf = io.StringIO()
        idc = [0]
        for rec, seq, regs in zip(recs, seqs, all_regs):
            _emit_query(mi, opt, rec.name, seq, regs, idc, buf)
        return buf.getvalue()

    got = emit(mesh_regs)
    want = emit([map_query(mi, s, opt) for s in seqs])
    assert got == want, "mesh+device-DP flow diverged from host pipeline"
    assert engine.n_tpu > 0, "alignment DPs did not reach the device"
    assert got.count("\n") >= 8
