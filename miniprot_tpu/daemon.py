"""Persistent device daemon: warm kernels across CLI runs.

Problem this solves: on relay-attached backends (axon) the FIRST
execution of each Pallas kernel shape in a process pays a remote
Mosaic compile measured in minutes — per process, every run, because
the XLA persistent cache covers only the host-side XLA compile (which
is fast and does hit cross-process), not the relay-side kernel load.
A fresh `--tpu` CLI run therefore spends minutes compiling, trips the
engine's launch watchdog, and demotes to the host engine: in a 10-run
soak only 2 runs engaged the device.

Fix: one long-lived daemon owns the JAX backend and the warm compiled
kernels.  CLI runs ship their ready-to-launch batch objects — pure
numpy + Python scalars, cheap to pickle — over a unix socket.  The
daemon launches them, holds the device handles, and on collect fetches
a whole wave of batches in ONE device round trip (mirroring the
engine's one-fetch `_prefetch`), decodes on its side, and returns only
the small per-job result tuples.  The client process never initializes
a JAX backend at all.

Two processes sharing the axon chip was verified safe (daemon and
direct runs can coexist), so the daemon is a pure accelerator: if the
socket is absent or anything fails, the engine falls back to its
direct device path or the host engine — output is identical either way
(same batch objects, same kernels, same decode).

Protocol (8-byte big-endian length prefix + pickle, SOCK_STREAM):
  ("ping",)                -> ("ok", info_dict)
  ("launch", batch)        -> ("ok", bid)          returns at enqueue:
                              the daemon's launcher thread does the
                              device upload off the client's path
  ("launch_many", [batch..]) -> ("ok", [bid...])   grouped launches:
                              one round trip for a whole flush's
                              batches (single-core RPC overhead is the
                              launch path's real cost; see the client)
  ("collect", [bid, ...])  -> ("ok", [results...]) one fetch wave;
                              launch errors surface here
  ("warm", opt_dict|None)  -> ("ok", n_shapes)     precompile hot shapes
  ("bench", kind)          -> ("ok", dict)         run a kernel GCUPS
                              measurement (benchmarks.py) daemon-side,
                              where the compiled kernels are warm —
                              bench.py attaches here so the round
                              record does not pay cold relay compiles
  ("shutdown",)            -> ("ok", None), then the daemon exits
Any failure returns ("err", repr(e)); the client raises and the engine
treats it like a direct device failure (host fallback, run completes).

Run it:  python -m miniprot_tpu.daemon [--socket P] [--warm] [--idle-exit S]
"""

from __future__ import annotations

import os
import pickle
import socket
import struct
import sys
import threading
import time

_HDR = struct.Struct(">Q")
# big enough for the largest batch on the wire (a full cigar batch with
# its traceback-free inputs is ~10-60MB); a corrupt length header must
# not trigger a giant allocation
_MAX_MSG = 1 << 31


def default_sock_path() -> str:
    env = os.environ.get("MINIPROT_TPU_DAEMON_SOCK")
    if env:
        return env
    return f"/tmp/miniprot_tpu_daemon-{os.getuid()}.sock"


def _send(conn: socket.socket, obj) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    conn.sendall(_HDR.pack(len(data)) + data)


def _recv(conn: socket.socket):
    hdr = _recv_exact(conn, _HDR.size)
    if hdr is None:
        return None
    (n,) = _HDR.unpack(hdr)
    if n > _MAX_MSG:
        raise ValueError(f"oversized message ({n} bytes)")
    data = _recv_exact(conn, n)
    if data is None:
        raise ConnectionError("peer closed mid-message")
    return pickle.loads(data)


def _recv_exact(conn: socket.socket, n: int) -> bytes | None:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(min(n - len(buf), 1 << 20))
        if not chunk:
            if buf:  # peer died mid-message: an error, not a clean close
                raise ConnectionError(
                    f"peer closed after {len(buf)}/{n} bytes")
            return None
        buf.extend(chunk)
    return bytes(buf)


def slim_for_wire(batch) -> None:
    """Drop arrays a raw-path batch never reads after construction.

    RawCigarBatch inherits CigarBatch's nas/D/A allocations but its
    launch path rebuilds those tracks on device from `nt`; shipping
    ~40MB of zeros per batch would dominate the socket transfer."""
    if type(batch).__name__ in ("RawCigarBatch", "RawScanCigarBatch"):
        batch.nas = batch.D = batch.A = None
    if type(batch).__name__ == "RawScanCigarBatch":
        batch.qpad = batch.endsel = None   # derived on device from alv


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class DaemonClient:
    """Client half: TWO persistent connections, sequential RPCs on each.

    Collects ride their own connection: a collect wave blocks daemon-
    side until its batches finish on the device; launches issued while
    a wave is in the air (engine.flush_begin starts its combined wave
    before the host fallbacks run, and callers may overlap further
    work) must not serialize behind the collect's blocking read on a
    shared connection.  Within each connection the engine's ops stay
    sequential (each runs under its own watchdog thread, and after any
    timeout the engine marks itself broken and never issues another
    op), so a reply abandoned mid-read can never interleave with a
    later request on that connection."""

    def __init__(self, path: str, conn: socket.socket, info: dict,
                 conn_collect: socket.socket | None = None):
        self.path = path
        self.conn = conn
        self.conn_collect = conn_collect or conn
        self.info = info
        self._lock = threading.Lock()
        self._lock_collect = (threading.Lock() if conn_collect is not None
                              else self._lock)

    @staticmethod
    def _open(path: str, timeout: float):
        conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        conn.settimeout(timeout)
        conn.connect(path)
        _send(conn, ("ping",))
        status, _info = _recv(conn)
        if status != "ok":
            conn.close()
            raise ConnectionError("daemon ping failed")
        conn.settimeout(None)  # per-op deadlines come from the
        return conn, _info     # engine's watchdog threads

    @classmethod
    def maybe_connect(cls, path: str | None = None,
                      timeout: float = 3.0,
                      probe_only: bool = False) -> "DaemonClient | None":
        """Connect + ping, or None (missing socket, dead daemon...).

        probe_only skips the second (collect) connection for callers
        that only need reachability/info and close immediately."""
        path = path or default_sock_path()
        if not os.path.exists(path):
            return None
        try:
            conn, info = cls._open(path, timeout)
        except Exception:
            return None
        conn2 = None
        if not probe_only:
            try:
                conn2, _ = cls._open(path, timeout)
            except Exception:
                conn2 = None   # old daemon or races: degrade to one conn
        return cls(path, conn, info, conn_collect=conn2)

    def _rpc(self, msg, collect_chan: bool = False):
        conn = self.conn_collect if collect_chan else self.conn
        lock = self._lock_collect if collect_chan else self._lock
        with lock:
            _send(conn, msg)
            reply = _recv(conn)
        if reply is None:
            raise ConnectionError("daemon closed the connection")
        status, val = reply
        if status != "ok":
            raise RuntimeError(f"daemon error: {val}")
        return val

    def launch(self, batch) -> int:
        slim_for_wire(batch)
        return self._rpc(("launch", batch))

    def launch_many(self, batches) -> list:
        """One RPC for a whole group of launches: on a single-core host
        the per-RPC reply wait + process switches dominate MB-scale
        launch costs (measured ~11.5ms/launch uncontended, ~42ms under
        e2e contention, vs 0.5ms of pickle), so grouping K launches
        saves ~(K-1) round trips.  Falls back to per-batch launches on
        daemons predating the op."""
        batches = list(batches)
        for b in batches:
            slim_for_wire(b)
        try:
            return self._rpc(("launch_many", batches))
        except RuntimeError as e:
            if "unknown op" not in str(e):
                raise
            return [self._rpc(("launch", b)) for b in batches]

    def collect(self, bids: list) -> list:
        return self._rpc(("collect", list(bids)), collect_chan=True)

    def ping(self) -> dict:
        return self._rpc(("ping",))

    def bench(self, kind: str) -> dict:
        return self._rpc(("bench", kind))

    def set_launchers(self, n: int) -> int:
        """Grow the daemon's launcher pool (upload concurrency)."""
        return self._rpc(("launchers", int(n)))

    def shutdown(self) -> None:
        self._rpc(("shutdown",))

    def close(self) -> None:
        for c in (self.conn, self.conn_collect):
            try:
                c.close()
            except Exception:
                pass


# ---------------------------------------------------------------------------
# server
# ---------------------------------------------------------------------------


class _Entry:
    """One launched batch: handles appear when the launcher thread is
    done with it (device uploads run daemon-side, off the client's
    critical path)."""

    __slots__ = ("batch", "handles", "err", "ev", "t")

    def __init__(self, batch):
        self.batch = batch
        self.handles = None
        self.err: Exception | None = None
        self.ev = threading.Event()
        self.t = time.monotonic()


class _Server:
    def __init__(self, sock_path: str, idle_exit: float = 0.0):
        self.sock_path = sock_path
        self.idle_exit = idle_exit
        self.batches: dict[int, _Entry] = {}
        self.next_bid = 1
        self.lock = threading.Lock()
        self.last_op = time.monotonic()
        self.stop = threading.Event()
        self.n_launched = 0
        self.n_collected = 0
        self.n_collect_ops = 0   # RPCs, not batches: waves count once
        # device busy accounting: seconds this daemon spent inside
        # launches (uploads+dispatch) and collects (device_get+decode);
        # uptime-normalized by the client for a chip duty-cycle figure
        self.launch_busy_s = 0.0
        self.collect_busy_s = 0.0
        self.t_start = time.monotonic()
        import queue
        self.launch_q: queue.Queue = queue.Queue()
        # >1 launcher overlaps relay uploads of independent batches;
        # correctness is unaffected (entries are independent, collect
        # waits on each entry's event)
        self.n_launchers = 0
        self._add_launchers(max(1, int(os.environ.get(
            "MINIPROT_TPU_DAEMON_LAUNCHERS", "1"))))

    def _add_launchers(self, target: int) -> int:
        """Grow the launcher pool to `target` threads (never shrinks —
        launchers block on the queue and cost nothing idle).  >1
        launcher overlaps relay uploads of independent batches;
        correctness is unaffected (entries are independent, collect
        waits on each entry's event).  Runtime-adjustable over the
        "launchers" RPC so an A/B sweep can reuse one warm daemon."""
        while self.n_launchers < target:
            threading.Thread(target=self._launcher, daemon=True,
                             name=f"daemon-launcher-{self.n_launchers}"
                             ).start()
            self.n_launchers += 1
        return self.n_launchers

    # -- ops --

    def op_ping(self):
        import jax
        return {
            "pid": os.getpid(),
            "platform": jax.default_backend(),
            "launched": self.n_launched,
            "collected": self.n_collected,
            "collect_ops": self.n_collect_ops,
            "pending": len(self.batches),
            "launch_busy_s": round(self.launch_busy_s, 3),
            "collect_busy_s": round(self.collect_busy_s, 3),
            "uptime_s": round(time.monotonic() - self.t_start, 3),
        }

    def _launcher(self) -> None:
        """Single thread doing all device launches, FIFO.  The client's
        launch RPC returns as soon as the batch crosses the socket, so
        its host work (fallback DPs, next batch's prep) overlaps the
        relay uploads here; any launch error surfaces at collect."""
        while True:
            e = self.launch_q.get()
            t0 = time.monotonic()
            try:
                e.handles = e.batch.launch(None)  # daemon backend decides
            except Exception as ex:
                e.err = ex
            with self.lock:   # thread-seconds across all launchers
                self.launch_busy_s += time.monotonic() - t0
            e.ev.set()

    def op_launch(self, batch) -> int:
        e = _Entry(batch)
        with self.lock:
            bid = self.next_bid
            self.next_bid += 1
            self.batches[bid] = e
            self.n_launched += 1
        self.launch_q.put(e)
        return bid

    def op_collect(self, bids: list) -> list:
        import jax
        t_op = time.monotonic()
        with self.lock:
            entries = [self.batches.pop(b) for b in bids]
        deadline = time.monotonic() + float(
            os.environ.get("MINIPROT_TPU_DAEMON_TIMEOUT", "600"))
        for e in entries:
            if not e.ev.wait(timeout=max(0.0, deadline - time.monotonic())):
                raise TimeoutError("daemon launch still running at the "
                                   "collect deadline")
            if e.err is not None:
                raise e.err
        # one device_get across the whole wave (the engine's one-fetch
        # optimization, device.py _prefetch): K batches, ONE round trip
        tags, tails = [], []
        for e in entries:
            h = e.handles
            if isinstance(h, tuple) and isinstance(h[0], str):
                tags.append(h[0])
                tails.append(tuple(h[1:]))
            else:
                tags.append(None)
                tails.append(h)
        fetched = jax.device_get(tails)
        out = []
        for e, tag, f in zip(entries, tags, fetched):
            out.append(e.batch.collect(f if tag is None else (tag, *f)))
        self.n_collected += len(bids)
        self.n_collect_ops += 1
        self.collect_busy_s += time.monotonic() - t_op
        return out

    def op_warm(self, opt_dict) -> int:
        return warm_kernels(opt_dict)

    def op_bench(self, kind: str) -> dict:
        from . import benchmarks
        return benchmarks.run_bench_op(kind)

    def op_launchers(self, n: int) -> int:
        with self.lock:
            return self._add_launchers(int(n))

    # -- plumbing --

    def _gc(self) -> None:
        """Drop launched-but-never-collected batches (client died)."""
        now = time.monotonic()
        with self.lock:
            dead = [b for b, e in self.batches.items()
                    if now - e.t > 900 and e.ev.is_set()]
            for b in dead:
                del self.batches[b]

    def handle_conn(self, conn: socket.socket) -> None:
        try:
            while not self.stop.is_set():
                try:
                    msg = _recv(conn)
                except Exception:
                    break
                if msg is None:
                    break
                self.last_op = time.monotonic()
                op, args = msg[0], msg[1:]
                try:
                    if op == "ping":
                        _send(conn, ("ok", self.op_ping()))
                    elif op == "launch":
                        _send(conn, ("ok", self.op_launch(*args)))
                    elif op == "launch_many":
                        _send(conn, ("ok", [self.op_launch(b)
                                            for b in args[0]]))
                    elif op == "collect":
                        _send(conn, ("ok", self.op_collect(*args)))
                    elif op == "warm":
                        _send(conn, ("ok", self.op_warm(
                            args[0] if args else None)))
                    elif op == "bench":
                        _send(conn, ("ok", self.op_bench(*args)))
                    elif op == "launchers":
                        _send(conn, ("ok", self.op_launchers(*args)))
                    elif op == "shutdown":
                        _send(conn, ("ok", None))
                        self.stop.set()
                        break
                    else:
                        _send(conn, ("err", f"unknown op {op!r}"))
                except Exception as e:  # op failed; connection stays up
                    try:
                        _send(conn, ("err", repr(e)))
                    except Exception:
                        break
        finally:
            try:
                conn.close()
            except Exception:
                pass

    def serve(self) -> None:
        if os.path.exists(self.sock_path):
            os.unlink(self.sock_path)
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(self.sock_path)
        os.chmod(self.sock_path, 0o600)
        srv.listen(16)
        srv.settimeout(1.0)
        sys.stderr.write(f"[daemon] serving on {self.sock_path} "
                         f"(pid {os.getpid()})\n")
        try:
            while not self.stop.is_set():
                self._gc()
                if (self.idle_exit > 0
                        and time.monotonic() - self.last_op > self.idle_exit
                        and not self.batches):
                    sys.stderr.write("[daemon] idle-exit\n")
                    break
                try:
                    conn, _ = srv.accept()
                except socket.timeout:
                    continue
                threading.Thread(target=self.handle_conn, args=(conn,),
                                 daemon=True).start()
        finally:
            srv.close()
            try:
                os.unlink(self.sock_path)
            except OSError:
                pass


def warm_kernels(opt_dict: dict | None = None,
                 shapes: str = "hot") -> int:
    """Precompile the kernels a default-options run will hit.

    "hot"  — the shape classes the 200Mb production workload actually
             uses (measured split: ext (128, 2112..8448), cigar
             (128 al, 2048..8192 nl)); minutes of relay compile.
    "all"  — every ext x cigar bucket; potentially hours through a slow
             relay.  Compiles run here, in the daemon, once.
    Returns the number of shapes compiled."""
    import numpy as np

    from . import tables
    from .align import DpEnv
    from .kernels import nasw_cigar_pallas as ck
    from .kernels import nasw_pallas as nk
    from .options import MapOpt

    opt = MapOpt(**opt_dict) if opt_dict else MapOpt()
    env = DpEnv(opt)
    scalars = (opt.go, opt.ge, opt.fs, opt.io, opt.xdrop,
               opt.end_bonus, opt.ie_coef)
    rng = np.random.default_rng(0)
    from . import device as dev
    if shapes == "all":
        ext_shapes = [(a, n) for a in dev.AL_BUCKETS for n in dev.NL_BUCKETS]
        cig_shapes = [(s, n) for s in dev.CIG_SLEN_CLASSES
                      for n in dev.CIG_NL_BUCKETS
                      if s * 8 * n * ck.B * 2 <= dev.CIG_TB_CAP]
    else:
        ext_shapes = [(128, n) for n in (2112, 4224, 8448)]
        cig_shapes = [(4, 2048), (16, 2048), (16, 4096), (16, 8192)]
    n = 0

    def _try(fn, label: str, retries: int = 2) -> bool:
        # a transient relay failure (remote_compile connection drop,
        # observed live) must cost one shape's retry, not the daemon:
        # a partially-warm daemon still beats no daemon
        for attempt in range(retries + 1):
            try:
                fn()
                sys.stderr.write(f"[daemon] warm {label}\n")
                return True
            except Exception as e:
                sys.stderr.write(f"[daemon] warm {label} failed "
                                 f"(attempt {attempt + 1}): {e!r}\n")
                time.sleep(5 * (attempt + 1))
        return False

    for al_b, nl_b in ext_shapes:
        def warm_ext(al_b=al_b, nl_b=nl_b):
            b = nk.RawExtBatch(al_b, nl_b, opt.mat, scalars, sp=env.sp,
                               trans_code=tables._default_code)
            b.add_raw(rng.integers(0, 4, size=nl_b).astype(np.int8),
                      rng.integers(0, 20,
                                   size=min(al_b, 100)).astype(np.int8),
                      io=opt.io)
            b.collect(b.launch(None))
        n += _try(warm_ext, f"ext {al_b}x{nl_b}")
    for sc, nl_b in cig_shapes:
        # each power-of-two rows_used <= the bucket is its own compile
        # key (a job's rows_used rounds up to the pow2 covering its real
        # nl); "hot" warms only the bucket-top variant, "all" every one
        rows_variants = [nl_b]
        if shapes == "all":
            rows_variants = [r for r in (2048, 4096, 8192, 16384,
                                         32768, 65536) if r <= nl_b]
        # warm the impl the engine will actually route to (the scan
        # kernel by default; the striped kernel additionally under
        # "all" — it still serves go==0 jobs and MINIPROT_TPU_CIG_IMPL)
        from .kernels import nasw_cigar_scan as csk
        classes = [csk.Raw4ScanCigarBatch if sc <= 4
                   else csk.RawScanCigarBatch]
        if shapes == "all":
            classes.append(ck.RawCigarBatch)
        for rv in rows_variants:
            for cig_cls in classes:
                def warm_cig(sc=sc, nl_b=nl_b, rv=rv, cig_cls=cig_cls):
                    b = cig_cls(sc * 8, nl_b, opt.mat, scalars,
                                sp=env.sp,
                                trans_code=tables._default_code)
                    b.add_raw(rng.integers(0, 4, size=rv - 8).astype(np.int8),
                              rng.integers(0, 20,
                                           size=min(sc * 8, 64)).astype(np.int8),
                              io=opt.io)
                    b.collect(b.launch(None))
                n += _try(warm_cig,
                          f"cig[{cig_cls.__name__}] {sc * 8}x{nl_b} rows<={rv}")
    return n


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(
        prog="miniprot_tpu.daemon",
        description="persistent TPU kernel daemon (warm compiles across "
                    "CLI runs)")
    p.add_argument("--socket", default=None, help="unix socket path")
    p.add_argument("--warm", nargs="?", const="hot", default=None,
                   choices=("hot", "all"),
                   help="precompile kernel shapes before serving")
    p.add_argument("--idle-exit", type=float, default=0.0,
                   help="exit after S seconds with no requests (0=never)")
    p.add_argument("--stop", action="store_true",
                   help="shut down a running daemon and exit")
    args = p.parse_args(argv)
    path = args.socket or default_sock_path()
    if args.stop:
        c = DaemonClient.maybe_connect(path)
        if c is None:
            sys.stderr.write("[daemon] not running\n")
            return 1
        c.shutdown()
        sys.stderr.write("[daemon] stopped\n")
        return 0
    from .kernels import probe_backend_guarded
    if not probe_backend_guarded():
        sys.stderr.write("[daemon] WARNING: no TPU backend; kernels will "
                         "run in interpret mode (tests only)\n")
    srv = _Server(path, idle_exit=args.idle_exit)
    if args.warm:
        t0 = time.monotonic()
        try:
            n = warm_kernels(shapes=args.warm)
        except Exception as e:   # serve anyway: cold > dead
            sys.stderr.write(f"[daemon] warm aborted: {e!r}\n")
            n = 0
        sys.stderr.write(f"[daemon] warmed {n} shapes in "
                         f"{time.monotonic() - t0:.0f}s\n")
    srv.serve()
    return 0


if __name__ == "__main__":
    sys.exit(main())
