"""Tests of the persistent device daemon (miniprot_tpu/daemon.py).

The daemon holds warm compiled kernels across CLI runs; clients ship
pickled batch objects over a unix socket and get decoded results back.
On CPU these tests run the daemon with interpret-mode kernels — the
protocol, wave-collect, error propagation, and engine integration are
identical to the live-chip path.
"""

import os
import pathlib
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def daemon_proc(tmp_path_factory):
    """A daemon subprocess on a private socket, CPU backend."""
    sock = str(tmp_path_factory.mktemp("dsock") / "d.sock")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the relay site hook force-selects the TPU platform in every
    # process it triggers in; drop its trigger so the daemon under test
    # runs genuine CPU jax (deterministic, no relay)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = (str(REPO) + ":" + str(REPO / "tests")
                         + ":" + env.get("PYTHONPATH", ""))
    proc = subprocess.Popen(
        [sys.executable, "-m", "miniprot_tpu.daemon", "--socket", sock],
        env=env, cwd=str(REPO),
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, text=True)
    deadline = time.monotonic() + 60
    while not os.path.exists(sock):
        if proc.poll() is not None:
            raise RuntimeError(f"daemon died: {proc.stderr.read()}")
        if time.monotonic() > deadline:
            proc.kill()
            raise TimeoutError("daemon socket never appeared")
        time.sleep(0.1)
    yield sock, proc
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def _client(sock):
    from miniprot_tpu.daemon import DaemonClient
    c = DaemonClient.maybe_connect(sock)
    assert c is not None, "daemon not reachable"
    return c


def test_ping_and_protocol_roundtrip(daemon_proc):
    sock, _ = daemon_proc
    c = _client(sock)
    info = c.ping()
    assert info["pid"] > 0 and info["platform"] == "cpu"
    from daemon_fixtures import FakeBatch
    b1 = FakeBatch([1, 2, 3])
    b2 = FakeBatch([10, 20])
    i1, i2 = c.launch(b1), c.launch(b2)
    # one wave collect, order preserved
    r1, r2 = c.collect([i1, i2])
    assert r1 == [3, 5, 7] and r2 == [21, 41]
    c.close()


def test_launch_many_groups_and_falls_back(daemon_proc):
    """launch_many ships a group in one RPC; against a daemon that
    predates the op (simulated by an 'unknown op' error) the client
    falls back to per-batch launches transparently."""
    sock, _ = daemon_proc
    c = _client(sock)
    from daemon_fixtures import FakeBatch
    bids = c.launch_many([FakeBatch([1, 2]), FakeBatch([5])])
    r1, r2 = c.collect(bids)
    assert r1 == [3, 5] and r2 == [11]
    # old-daemon fallback: first _rpc (the launch_many) raises like the
    # server's unknown-op reply; the retry path must go per-batch
    orig = c._rpc
    calls = []

    def flaky(msg, collect_chan=False):
        calls.append(msg[0])
        if msg[0] == "launch_many":
            raise RuntimeError("daemon error: unknown op 'launch_many'")
        return orig(msg, collect_chan)

    c._rpc = flaky
    bids = c.launch_many([FakeBatch([7]), FakeBatch([8, 9])])
    c._rpc = orig
    assert calls == ["launch_many", "launch", "launch"]
    r1, r2 = c.collect(bids)
    assert r1 == [15] and r2 == [17, 19]
    c.close()


def test_error_propagates_and_daemon_survives(daemon_proc):
    sock, proc = daemon_proc
    c = _client(sock)
    from daemon_fixtures import BoomBatch
    # launch is async (returns at enqueue); the launch error surfaces
    # at collect, and the daemon keeps serving afterwards
    bid = c.launch(BoomBatch())
    with pytest.raises(RuntimeError, match="boom-batch"):
        c.collect([bid])
    assert c.ping()["pid"] == proc.pid
    c.close()


def test_real_cigar_batch_through_daemon(daemon_proc):
    """A real RawCigarBatch survives the wire (including slim_for_wire
    dropping its unused nas/D/A tracks) and the daemon-side kernel run
    + decode is bit-identical to the host DP oracle.

    The comparison target is the native host DP (not a local interpret
    run: in a relay-attached test process even interpret-mode jnp ops
    execute through the relay, minutes per batch)."""
    sock, _ = daemon_proc
    from miniprot_tpu import tables
    from miniprot_tpu.align import DpEnv
    from miniprot_tpu.kernels import nasw_cigar_pallas as ck
    from miniprot_tpu.native import DPF_CIGAR
    from miniprot_tpu.options import MapOpt

    opt = MapOpt()
    env = DpEnv(opt)
    scalars = (opt.go, opt.ge, opt.fs, opt.io, opt.xdrop,
               opt.end_bonus, opt.ie_coef)
    rng = np.random.default_rng(7)
    T = tables.get_tables()
    nt = np.frombuffer(b"ACGT", np.uint8)
    aa_pool = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    # aa <= 24 -> the smallest stripe class (slen 4): interpret-mode
    # kernel cost in the CPU daemon stays test-sized
    jobs = [(nt[rng.integers(0, 4, 1100 + 37 * k)],
             rng.choice(aa_pool, 20 + k).astype(np.uint8))
            for k in range(2)]
    b = ck.RawCigarBatch(32, 2048, opt.mat, scalars, sp=env.sp,
                         trans_code=tables._default_code)
    for ns, aa in jobs:
        b.add_raw(T.nt4[ns], T.aa20[aa], io=opt.io)
    c = _client(sock)
    bid = c.launch(b)
    (remote,) = c.collect([bid])
    assert len(remote) == 2
    for (ns, aa), (rs, rc) in zip(jobs, remote):
        hsc, _, _, hcig = env.dp(ns, aa, DPF_CIGAR)
        assert rs == hsc
        np.testing.assert_array_equal(rc, hcig)
    c.close()


def test_stacked_batch_through_daemon(daemon_proc):
    """The stacked small-class batch (Raw4ScanCigarBatch) survives the
    wire and the daemon-side run + run-walk decode matches the host DP,
    including problems landing in sub-blocks beyond the first."""
    sock, _ = daemon_proc
    from miniprot_tpu import tables
    from miniprot_tpu.align import DpEnv
    from miniprot_tpu.kernels import nasw_cigar_scan as csk
    from miniprot_tpu.native import DPF_CIGAR
    from miniprot_tpu.options import MapOpt

    opt = MapOpt()
    env = DpEnv(opt)
    scalars = (opt.go, opt.ge, opt.fs, opt.io, opt.xdrop,
               opt.end_bonus, opt.ie_coef)
    rng = np.random.default_rng(8)
    T = tables.get_tables()
    nt = np.frombuffer(b"ACGT", np.uint8)
    aa_pool = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    b = csk.Raw4ScanCigarBatch(32, 512, opt.mat, scalars, sp=env.sp,
                               trans_code=tables._default_code)
    jobs = []
    # n=130 puts two problems into sub-block 1 (lane column sharing)
    for k in range(130):
        ns = nt[rng.integers(0, 4, 120 + 2 * k)]
        aa = rng.choice(aa_pool, 6 + (k % 20)).astype(np.uint8)
        jobs.append((ns, aa))
        b.add_raw(T.nt4[ns], T.aa20[aa], io=opt.io)
    c = _client(sock)
    (remote,) = c.collect(c.launch_many([b]))
    assert len(remote) == 130
    for (ns, aa), (rs, rc) in zip(jobs, remote):
        hsc, _, _, hcig = env.dp(ns, aa, DPF_CIGAR)
        assert rs == hsc
        np.testing.assert_array_equal(rc, hcig)
    c.close()


def test_engine_uses_daemon_for_cigar_jobs(daemon_proc, monkeypatch):
    """TpuExtEngine with a reachable daemon ships its device batches
    there and matches the host DP bit-for-bit."""
    sock, _ = daemon_proc
    monkeypatch.setenv("MINIPROT_TPU_DAEMON", "1")
    monkeypatch.setenv("MINIPROT_TPU_DAEMON_SOCK", sock)
    from miniprot_tpu.device import TpuExtEngine
    from miniprot_tpu.native import DPF_CIGAR
    from miniprot_tpu.options import MapOpt

    opt = MapOpt()
    engine = TpuExtEngine(opt)
    assert engine.client is not None, "engine did not attach to the daemon"
    rng = np.random.default_rng(21)
    nt = np.frombuffer(b"ACGT", np.uint8)
    aa_pool = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    # aa <= 24: smallest stripe class, so the CPU daemon's interpret
    # run stays fast (covers the same engine plumbing as bigger shapes)
    jobs = [(nt[rng.integers(0, 4, 900 + 100 * k)],
             rng.choice(aa_pool, 18 + 2 * k).astype(np.uint8))
            for k in range(3)]
    engine.submit(("cigars", [(ns, aa, None) for ns, aa in jobs]))
    (results,) = engine.flush()
    assert engine.n_tpu == 3 and not engine.broken
    for (ns, aa), (sc, cig) in zip(jobs, results):
        hsc, _, _, hcig = engine.env.dp(ns, aa, DPF_CIGAR)
        assert sc == hsc
        np.testing.assert_array_equal(cig, hcig)


def test_engine_wave_collects_in_one_rpc(daemon_proc, monkeypatch):
    """Two pending batches (different shape buckets) must come back in
    ONE daemon collect RPC — the wave-fetch optimization through the
    daemon path."""
    sock, _ = daemon_proc
    monkeypatch.setenv("MINIPROT_TPU_DAEMON", "1")
    monkeypatch.setenv("MINIPROT_TPU_DAEMON_SOCK", sock)
    from miniprot_tpu.device import TpuExtEngine
    from miniprot_tpu.native import DPF_CIGAR
    from miniprot_tpu.options import MapOpt

    engine = TpuExtEngine(MapOpt())
    assert engine.client is not None
    rng = np.random.default_rng(33)
    nt = np.frombuffer(b"ACGT", np.uint8)
    aa_pool = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
    # one job in the nl<=2048 bucket, one in the 4096 bucket -> two
    # batches pending at flush
    jobs = [(nt[rng.integers(0, 4, 1000)],
             rng.choice(aa_pool, 20).astype(np.uint8)),
            (nt[rng.integers(0, 4, 3000)],
             rng.choice(aa_pool, 21).astype(np.uint8))]
    ops0 = engine.client.ping()["collect_ops"]
    engine.submit(("cigars", [(ns, aa, None) for ns, aa in jobs]))
    (results,) = engine.flush()
    assert engine.n_tpu == 2 and not engine.broken
    assert engine.client.ping()["collect_ops"] == ops0 + 1, \
        "two pending batches should collect in one wave RPC"
    for (ns, aa), (sc, cig) in zip(jobs, results):
        hsc, _, _, hcig = engine.env.dp(ns, aa, DPF_CIGAR)
        assert sc == hsc
        np.testing.assert_array_equal(cig, hcig)


def test_engine_falls_back_without_daemon(monkeypatch, tmp_path):
    """Dead socket: maybe_connect yields None and the engine behaves
    exactly as before (direct path)."""
    monkeypatch.setenv("MINIPROT_TPU_DAEMON", "1")
    monkeypatch.setenv("MINIPROT_TPU_DAEMON_SOCK", str(tmp_path / "no.sock"))
    from miniprot_tpu.device import TpuExtEngine
    from miniprot_tpu.options import MapOpt
    assert TpuExtEngine(MapOpt()).client is None


def test_engine_daemon_death_degrades_to_host(daemon_proc, monkeypatch,
                                              tmp_path):
    """A daemon that dies mid-run must not corrupt output: the engine
    marks itself broken and the host engine recomputes the jobs."""
    sock = str(tmp_path / "dying.sock")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the relay site hook force-selects the TPU platform in every
    # process it triggers in; drop its trigger so the daemon under test
    # runs genuine CPU jax (deterministic, no relay)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = (str(REPO) + ":" + str(REPO / "tests")
                         + ":" + env.get("PYTHONPATH", ""))
    proc = subprocess.Popen(
        [sys.executable, "-m", "miniprot_tpu.daemon", "--socket", sock],
        env=env, cwd=str(REPO),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.monotonic() + 60
        while not os.path.exists(sock):
            assert proc.poll() is None, "daemon died at startup"
            assert time.monotonic() < deadline
            time.sleep(0.1)
        monkeypatch.setenv("MINIPROT_TPU_DAEMON", "1")
        monkeypatch.setenv("MINIPROT_TPU_DAEMON_SOCK", sock)
        from miniprot_tpu.device import TpuExtEngine
        from miniprot_tpu.native import DPF_CIGAR
        from miniprot_tpu.options import MapOpt
        opt = MapOpt()
        engine = TpuExtEngine(opt)
        assert engine.client is not None
        proc.kill()
        proc.wait(timeout=10)
        rng = np.random.default_rng(5)
        nt = np.frombuffer(b"ACGT", np.uint8)
        aa_pool = np.frombuffer(b"ARNDCQEGHILKMFPSTWYV", np.uint8)
        ns = nt[rng.integers(0, 4, 1000)]
        aa = rng.choice(aa_pool, 60).astype(np.uint8)
        engine.submit(("cigars", [(ns, aa, None)]))
        (results,) = engine.flush()
        assert engine.broken and engine.n_host == 1
        hsc, _, _, hcig = engine.env.dp(ns, aa, DPF_CIGAR)
        assert results[0][0] == hsc
        np.testing.assert_array_equal(results[0][1], hcig)
    finally:
        if proc.poll() is None:
            proc.kill()


def test_launchers_rpc_grows_pool(daemon_proc):
    """The runtime launcher-pool RPC: grows to the requested size,
    never shrinks, and the daemon keeps serving afterwards."""
    sock, _ = daemon_proc
    c = _client(sock)
    try:
        assert c.set_launchers(3) == 3
        assert c.set_launchers(2) == 3      # never shrinks
        assert c.set_launchers(4) == 4
        from daemon_fixtures import FakeBatch
        bid = c.launch(FakeBatch([5]))
        assert c.collect([bid]) == [[11]]   # still serving
    finally:
        c.close()


def test_bench_rpc_bad_kind_is_an_error(daemon_proc):
    """An unknown bench kind surfaces as a daemon error, and the
    connection + daemon survive it."""
    import pytest as _pytest
    sock, _ = daemon_proc
    c = _client(sock)
    try:
        with _pytest.raises(RuntimeError, match="unknown bench kind"):
            c.bench("nonsense")
        assert c.ping()["platform"]         # connection still usable
    finally:
        c.close()
