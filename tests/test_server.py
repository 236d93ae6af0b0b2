"""Persistent mapping server: warm-index serving, byte-identical output."""
import pathlib
import threading

import pytest

GOLDEN_PAF = (pathlib.Path(__file__).parent / "golden" /
              "golden_dpp3.paf").read_text()


@pytest.fixture(scope="module")
def dpp3_server(dpp3_files):
    from miniprot_tpu import cli, server
    genome, _ = dpp3_files
    parsed = cli.load_for_server(["--no-tpu", genome])
    assert isinstance(parsed, tuple)
    mi, opt, n_threads, use_tpu = parsed
    srv = server.MapServer(("127.0.0.1", 0), mi, opt, n_threads, use_tpu)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()
    srv.server_close()


def test_server_matches_cli(dpp3_server, dpp3_files):
    from miniprot_tpu import server
    host, port = dpp3_server
    _, query = dpp3_files
    payload = open(query, "rb").read()   # gzip payload: sniffed like files
    out = server.query(host, port, payload)
    assert out.decode() == GOLDEN_PAF


def test_server_repeat_requests_reset_state(dpp3_server, dpp3_files):
    """Record ids and batch structure reset per request, so every
    request returns the same bytes a fresh CLI run would."""
    from miniprot_tpu import server
    host, port = dpp3_server
    _, query = dpp3_files
    payload = open(query, "rb").read()
    first = server.query(host, port, payload)
    second = server.query(host, port, payload)
    assert first == second == GOLDEN_PAF.encode()


def test_server_empty_request(dpp3_server):
    from miniprot_tpu import server
    host, port = dpp3_server
    assert server.query(host, port, b"") == b""
