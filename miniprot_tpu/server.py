"""Persistent mapping server: load the index once, serve many requests.

The reference tool is strictly batch (index load dominates short runs:
a .mpi restore of a mammalian genome costs seconds to minutes, and the
first TPU kernel compile tens of seconds).  For deployment/serving this
module keeps the index, the scoring tables and every compiled kernel
warm in one process and maps protein batches on demand.

Protocol (dependency-free, netcat-compatible): one TCP connection per
request.  The client sends FASTA/FASTQ bytes (gzip allowed) and
half-closes the write side; the server responds with the configured
output format (PAF by default, --gff etc. fixed at server start) and
closes.  Requests are served sequentially — queries inside a request
are already batched/parallelized by the normal pipeline, and a single
accelerator serializes DP batches anyway.

    # server
    python -m miniprot_tpu.server --listen 127.0.0.1:8765 ref.mpi [--gff] [--tpu]
    # client
    cat proteins.faa | nc -N 127.0.0.1 8765 > out.paf
    python -m miniprot_tpu.server --query 127.0.0.1:8765 proteins.faa > out.paf

Output bytes are identical to a fresh CLI run with the same options on
the same input (pinned by tests/test_server.py): record ids and the
mini-batch structure reset per request.
"""

from __future__ import annotations

import io
import os
import socket
import socketserver
import sys
import tempfile

from .index import Index
from .options import MapOpt
from .pipeline import map_file


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        srv = self.server
        data = self.rfile.read()
        if not data:
            return
        # spool to a temp file: reuses the gzip-sniffing batch reader
        fd, path = tempfile.mkstemp(prefix="mpserve", suffix=".faa")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
            out = io.StringIO()
            try:
                map_file(srv.mi, path, srv.opt, n_threads=srv.n_threads,
                         out=out, use_tpu=srv.use_tpu)
            except Exception as e:  # report, keep serving
                sys.stderr.write(f"[server] request failed: {e!r}\n")
                self.wfile.write(b"")
                return
            self.wfile.write(out.getvalue().encode())
        finally:
            os.unlink(path)


class MapServer(socketserver.TCPServer):
    allow_reuse_address = True

    def __init__(self, addr, mi: Index, opt: MapOpt, n_threads: int = 1,
                 use_tpu: bool = False):
        self.mi = mi
        self.opt = opt
        self.n_threads = n_threads
        self.use_tpu = use_tpu
        super().__init__(addr, _Handler)


def query(host: str, port: int, payload: bytes, timeout: float = 600.0) -> bytes:
    """Send one request; returns the server's output bytes."""
    with socket.create_connection((host, port), timeout=timeout) as s:
        s.sendall(payload)
        s.shutdown(socket.SHUT_WR)
        chunks = []
        while True:
            b = s.recv(1 << 16)
            if not b:
                break
            chunks.append(b)
    return b"".join(chunks)


def main(argv=None) -> int:
    from .cli import main as cli_main  # reuse option parsing via a shim
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "--query":
        host, port = argv[1].rsplit(":", 1)
        payload = open(argv[2], "rb").read()
        sys.stdout.buffer.write(query(host, int(port), payload))
        return 0
    if not argv or argv[0] != "--listen":
        sys.stderr.write(__doc__)
        return 1
    host, port = argv[1].rsplit(":", 1)
    # parse the remaining args exactly like the CLI, but intercept the
    # mapping call: --server-parse gives us (mi, opt, n_threads, use_tpu)
    rest = argv[2:]
    parsed = cli_main(["--server-parse", *rest])
    if not isinstance(parsed, tuple):
        return int(parsed)
    mi, opt, n_threads, use_tpu = parsed
    with MapServer((host, int(port)), mi, opt, n_threads, use_tpu) as srv:
        sys.stderr.write(f"[server] listening on {host}:{port} "
                         f"({mi.nt.l_seq} bp indexed)\n")
        srv.serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
