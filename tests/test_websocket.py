"""RFC 6455 wire layer + viewer websocket session tests.

The transport end-to-end test drives the real server loop
(`_Handler._ws_serve` via a live ThreadingHTTPServer) through a raw
client socket speaking masked client frames; only `_render_pose` is
stubbed (the render path itself is exercised by the render/eval
tests).  Covers: handshake accept key, frame lengths across the
125/126/64k boundaries, masking, fragmentation, ping/pong, progressive
q=0,1,2 push frames, pose coalescing input handling, export_path over
the socket, and clean close.
"""
import io
import json
import socket
import threading

import pytest

from rsn.utils import websocket as ws


# ---- framing unit tests -------------------------------------------------

def test_accept_key_rfc_example():
    # the worked example from RFC 6455 section 1.3
    assert (ws.accept_key("dGhlIHNhbXBsZSBub25jZQ==")
            == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")


@pytest.mark.parametrize("n", [0, 1, 125, 126, 127, 65535, 65536, 70000])
@pytest.mark.parametrize("mask", [False, True])
def test_frame_roundtrip_lengths(n, mask):
    payload = bytes(i % 251 for i in range(n))
    raw = ws.encode_frame(payload, ws.OP_BINARY, mask=mask)
    fin, op, got = ws.read_frame(io.BytesIO(raw))
    assert fin and op == ws.OP_BINARY
    assert got == payload


def test_masked_frame_is_obfuscated_on_the_wire():
    payload = b"A" * 64
    raw = ws.encode_frame(payload, ws.OP_TEXT, mask=True)
    assert payload not in raw  # xor-masked (os.urandom key)
    _, _, got = ws.read_frame(io.BytesIO(raw))
    assert got == payload


def test_read_message_reassembles_fragments():
    raw = (ws.encode_frame(b"hel", ws.OP_TEXT, fin=False)
           + ws.encode_frame(b"lo ", ws.OP_CONT, fin=False)
           + ws.encode_frame(b"world", ws.OP_CONT, fin=True))
    out = io.BytesIO()
    op, payload = ws.read_message(io.BytesIO(raw), out)
    assert (op, payload) == (ws.OP_TEXT, b"hello world")


def test_read_message_answers_ping_between_fragments():
    raw = (ws.encode_frame(b"ab", ws.OP_TEXT, fin=False)
           + ws.encode_frame(b"ping!", ws.OP_PING)
           + ws.encode_frame(b"cd", ws.OP_CONT, fin=True))
    out = io.BytesIO()
    op, payload = ws.read_message(io.BytesIO(raw), out)
    assert (op, payload) == (ws.OP_TEXT, b"abcd")
    fin, pop, pong = ws.read_frame(io.BytesIO(out.getvalue()))
    assert pop == ws.OP_PONG and pong == b"ping!"


def test_read_message_replies_to_close():
    raw = ws.encode_frame(b"\x03\xe8bye", ws.OP_CLOSE)
    out = io.BytesIO()
    assert ws.read_message(io.BytesIO(raw), out) is None
    fin, op, payload = ws.read_frame(io.BytesIO(out.getvalue()))
    assert op == ws.OP_CLOSE and payload == b"\x03\xe8"  # status echoed


def test_truncated_frame_raises():
    raw = ws.encode_frame(b"x" * 50, ws.OP_BINARY)[:20]
    with pytest.raises(ConnectionError):
        ws.read_frame(io.BytesIO(raw))


# ---- viewer session end-to-end -----------------------------------------

FAKE_PNG = b"\x89PNG\r\n\x1a\nfakedata"


@pytest.fixture
def viewer_server(monkeypatch, tmp_path):
    from http.server import ThreadingHTTPServer

    from rsn.cli import viewer as viewer_lib

    calls = []

    def fake_render(theta, phi, r, mode, q):
        calls.append((theta, phi, r, mode, q))
        return FAKE_PNG + f"/q{q}/{mode}".encode()

    monkeypatch.setattr(viewer_lib, "_render_pose", fake_render)
    monkeypatch.setattr(viewer_lib._State, "run_dir", str(tmp_path))
    import jax.numpy as jnp

    from rsn.data.cameras import Cameras
    monkeypatch.setattr(viewer_lib._State, "cameras", Cameras(
        camera_to_worlds=jnp.broadcast_to(jnp.eye(3, 4), (1, 3, 4)),
        fx=jnp.full((1,), 30.0), fy=jnp.full((1,), 30.0),
        cx=jnp.full((1,), 16.0), cy=jnp.full((1,), 12.0),
        width=32, height=24))
    server = ThreadingHTTPServer(("127.0.0.1", 0), viewer_lib._Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield server.server_address, calls
    finally:
        server.shutdown()
        server.server_close()


def _recv_message(sock_file, sock):
    """Client-side read of one server message (server frames unmasked)."""
    return ws.read_message(sock_file, sock.makefile("wb"))


def test_viewer_ws_session(viewer_server, tmp_path):
    (host, port), calls = viewer_server
    sock = socket.create_connection((host, port), timeout=10)
    try:
        ws.client_handshake(sock, f"{host}:{port}")
        rf = sock.makefile("rb")

        # one pose -> three progressive push frames q=0,1,2
        sock.sendall(ws.encode_frame(
            json.dumps({"type": "pose", "theta": 0.5, "phi": 0.1,
                        "r": 1.0, "mode": "rgb"}).encode(),
            ws.OP_TEXT, mask=True))
        frames = [_recv_message(rf, sock) for _ in range(3)]
        for q, (op, payload) in enumerate(frames):
            assert op == ws.OP_BINARY
            assert payload[0] == q  # quality header byte
            assert payload[1:9] == FAKE_PNG[:8]  # png magic
        assert [c[4] for c in calls] == [0, 1, 2]
        assert calls[0][:2] == (0.5, 0.1)

        # export a camera path over the socket
        poses = [{"theta": 0.0, "phi": 0.3, "r": 1.0}]
        sock.sendall(ws.encode_frame(
            json.dumps({"type": "export_path", "poses": poses}).encode(),
            ws.OP_TEXT, mask=True))
        op, payload = _recv_message(rf, sock)
        assert op == ws.OP_TEXT
        reply = json.loads(payload)
        assert reply["type"] == "path_exported"
        assert reply["num_frames"] == 1
        with open(reply["path"]) as f:
            doc = json.load(f)
        assert len(doc["frames"]) == 1

        # a second pose still renders (loop is still alive)
        sock.sendall(ws.encode_frame(
            json.dumps({"type": "pose", "theta": 1.0, "phi": 0.0,
                        "r": 2.0, "mode": "depth"}).encode(),
            ws.OP_TEXT, mask=True))
        op, payload = _recv_message(rf, sock)
        assert op == ws.OP_BINARY and payload[0] == 0
        assert payload.endswith(b"/q0/depth")

        # clean close: server echoes the close frame
        sock.sendall(ws.encode_frame(b"\x03\xe8", ws.OP_CLOSE, mask=True))
        deadline_frames = []
        while True:
            msg = ws.read_frame(rf)
            deadline_frames.append(msg)
            if msg[1] == ws.OP_CLOSE:
                break
        assert deadline_frames[-1][1] == ws.OP_CLOSE
    finally:
        sock.close()


def test_viewer_http_fallback_still_serves(viewer_server):
    """GET /render remains available for non-websocket clients."""
    import urllib.request

    (host, port), calls = viewer_server
    with urllib.request.urlopen(
            f"http://{host}:{port}/render?theta=0&phi=0.3&r=1&q=1",
            timeout=10) as rsp:
        body = rsp.read()
    assert body.startswith(FAKE_PNG[:8])
    assert calls[-1][4] == 1


def test_viewer_page_mentions_websocket(viewer_server):
    import urllib.request

    (host, port), _ = viewer_server
    with urllib.request.urlopen(f"http://{host}:{port}/", timeout=10) as rsp:
        page = rsp.read().decode()
    assert "WebSocket" in page and "/ws" in page
