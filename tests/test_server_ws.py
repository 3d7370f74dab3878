"""WebSocket streaming session: handshake, frame push, input round-trip.

The reference runs its session client-side in the browser
(all-is-cubes-wasm/src/web_session.rs:43); our TPU-hosted deviation is a
server-push streaming session (apps/server.py /ws). These tests exercise
the RFC 6455 implementation with a raw stdlib socket client: upgrade
handshake, continuous meta+PNG frame pairs, input messages applied to the
live session, the echoed client timestamp (the measured-latency channel),
ping/pong, and clean close.
"""

from __future__ import annotations

import json
import socket
import struct
import time

from aic_tpu.apps.server import SessionServer, ws_accept_key, ws_encode


def _make_server():
    from aic_tpu.apps.session import Session
    from aic_tpu.content.template import build_universe
    from aic_tpu.raytrace import Viewport

    s = Session(build_universe("blank"), viewport=Viewport(32, 24))
    s.render()  # warm the trace compile outside the stream loop
    srv = SessionServer(s, port=0, stream_fps=60.0)
    srv.start()
    return s, srv


def _mask(payload: bytes, key: bytes = b"\x01\x02\x03\x04") -> bytes:
    return bytes(b ^ key[i & 3] for i, b in enumerate(payload))


def _client_frame(payload: bytes, opcode: int = 0x1) -> bytes:
    """Minimal masked client frame (payload < 126 bytes)."""
    assert len(payload) < 126
    key = b"\x01\x02\x03\x04"
    return bytes([0x80 | opcode, 0x80 | len(payload)]) + key + _mask(payload)


def _read_server_frame(f):
    head = f.read(2)
    assert len(head) == 2
    opcode = head[0] & 0x0F
    n = head[1] & 0x7F
    assert not head[1] & 0x80  # server frames are unmasked
    if n == 126:
        n = struct.unpack(">H", f.read(2))[0]
    elif n == 127:
        n = struct.unpack(">Q", f.read(8))[0]
    return opcode, f.read(n)


def _handshake(port: int) -> tuple:
    sock = socket.create_connection(("127.0.0.1", port), timeout=60)
    sock.sendall(
        b"GET /ws HTTP/1.1\r\n"
        b"Host: 127.0.0.1\r\n"
        b"Upgrade: websocket\r\n"
        b"Connection: Upgrade\r\n"
        b"Sec-WebSocket-Key: dGhlIHNhbXBsZSBub25jZQ==\r\n"
        b"Sec-WebSocket-Version: 13\r\n\r\n"
    )
    f = sock.makefile("rb")
    status = f.readline()
    assert b"101" in status, status
    headers = {}
    while True:
        line = f.readline().strip()
        if not line:
            break
        k, _, v = line.partition(b":")
        headers[k.decode().lower()] = v.strip().decode()
    return sock, f, headers


def test_ws_accept_key_rfc_vector():
    # The worked example from RFC 6455 §1.3.
    assert (
        ws_accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


def test_ws_stream_and_input_roundtrip():
    session, srv = _make_server()
    try:
        sock, f, headers = _handshake(srv.port)
        assert headers["sec-websocket-accept"] == ws_accept_key(
            "dGhlIHNhbXBsZSBub25jZQ=="
        )

        # Send input with a client timestamp; the stream must apply the
        # keys and echo the timestamp in a later frame's metadata.
        t_client = 123456789
        sock.sendall(
            _client_frame(json.dumps({"keys": ["w"], "t": t_client}).encode())
        )

        got_png = False
        echoed = None
        deadline = time.time() + 30
        while time.time() < deadline and (not got_png or echoed != t_client):
            opcode, payload = _read_server_frame(f)
            if opcode == 0x1:
                meta = json.loads(payload)
                assert "info_text" in meta and "render_ms" in meta
                if meta.get("echo_t") is not None:
                    echoed = meta["echo_t"]
            elif opcode == 0x2:
                assert payload[:8] == b"\x89PNG\r\n\x1a\n"
                got_png = True
        assert got_png
        assert echoed == t_client
        assert "w" in session.input.keys

        # Close handshake: server stops the stream.
        sock.sendall(_client_frame(b"", opcode=0x8))
        sock.close()
    finally:
        srv.shutdown()


def test_ws_ping_pong():
    _, srv = _make_server()
    try:
        sock, f, _ = _handshake(srv.port)
        sock.sendall(_client_frame(b"hello", opcode=0x9))
        deadline = time.time() + 30
        while time.time() < deadline:
            opcode, payload = _read_server_frame(f)
            if opcode == 0xA:
                assert payload == b"hello"
                break
        else:  # pragma: no cover
            raise AssertionError("no pong before deadline")
        sock.close()
    finally:
        srv.shutdown()


def test_ws_rejects_plain_get():
    import urllib.request

    _, srv = _make_server()
    try:
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/ws")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def test_ws_encode_lengths():
    # Header size transitions at 126 and 65536 (RFC 6455 §5.2).
    assert len(ws_encode(b"x" * 125)) == 2 + 125
    assert len(ws_encode(b"x" * 126)) == 4 + 126
    assert len(ws_encode(b"x" * 70000)) == 10 + 70000
