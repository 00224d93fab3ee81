"""rsn-viewer — a browser viewer over websockets (the ns-viewer
equivalent).

Like the reference's inherited nerfstudio viewer
(reflect_sampling_nerf_config.py:59-60: viewer chunk 1024,
vis="viewer"), the client holds a persistent WebSocket and the server
PUSHES rendered frames: the browser streams camera poses up, the
server streams progressively-refined PNG frames down, coalescing stale
poses whenever the camera moves faster than the renderer.  The wire
layer is a dependency-free RFC 6455 implementation
(rsn/utils/websocket.py); plain HTTP GET /render remains as a fallback
transport for clients without websocket support.  The render itself
runs the same chunked `render_image` path as eval.

Streaming quality levels: interactive moves render at 1/4 resolution;
once the camera settles the same pose re-renders at 1/2 then full
resolution (progressive refinement, like the nerfstudio viewer's
"target FPS" behavior but deterministic).

Camera paths: press `p` to record the current pose, `e` to export the
recorded path — the server writes `camera_paths/path-<n>.json` under
the run dir, renderable with
  python -m rsn.cli.render --load-dir ... --mode path --camera-path <file>

Usage:
  python -m rsn.cli.viewer --load-dir outputs/.../<timestamp> [--port 7007]
"""
from __future__ import annotations

import io
import json
import os
import select
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from rsn.utils import websocket as ws_lib

_PAGE = """<!DOCTYPE html>
<html><head><title>rsn viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px monospace; }
#hud { position:fixed; top:8px; left:8px; white-space:pre; }
img { display:block; margin:0 auto; image-rendering:pixelated;
      width:min(90vw, 90vh); }
</style></head><body>
<div id="hud">drag: orbit | wheel: zoom | d: depth | p: add pose | e: export path</div>
<img id="view" src="/render?theta=0&phi=0.3&r=1.0&q=0">
<script>
let theta = 0, phi = 0.3, r = 1.0, drag = false, lx = 0, ly = 0;
let mode = "rgb", inflight = false, dirty = false, q = 0;
let path = [], ws = null, wsOk = false;
const img = document.getElementById("view");
const hud = document.getElementById("hud");
function connectWs() {
  try { ws = new WebSocket(`ws://${location.host}/ws`); }
  catch (e) { return; }
  ws.binaryType = "arraybuffer";
  ws.onopen = () => { wsOk = true; sendPose(); };
  ws.onclose = ws.onerror = () => { wsOk = false; };
  ws.onmessage = ev => {
    if (typeof ev.data === "string") {
      const d = JSON.parse(ev.data);
      if (d.type === "path_exported") {
        hud.textContent = `wrote ${d.path}`; path = [];
      }
      return;
    }
    // binary frame: [quality byte][png]; server pushes q=0,1,2
    const bytes = new Uint8Array(ev.data);
    const url = URL.createObjectURL(
      new Blob([bytes.subarray(1)], {type: "image/png"}));
    const old = img.src;
    img.onload = () => { if (old.startsWith("blob:")) URL.revokeObjectURL(old); };
    img.src = url;
  };
}
function sendPose() {
  if (wsOk) {
    ws.send(JSON.stringify({type: "pose", theta, phi, r, mode}));
  } else { q = 0; refresh(); }
}
function refresh() {   // HTTP fallback transport
  if (inflight) { dirty = true; return; }
  inflight = true;
  const src = `/render?theta=${theta}&phi=${phi}&r=${r}&mode=${mode}&q=${q}`;
  const probe = new Image();
  probe.onload = () => {
    img.src = probe.src; inflight = false;
    if (dirty) { dirty = false; q = 0; refresh(); }
    else if (q < 2) { q++; refresh(); }   // progressive refinement
  };
  probe.src = src;
}
function interact() { sendPose(); }
connectWs();
window.addEventListener("mousedown", e => { drag = true; lx = e.x; ly = e.y; });
window.addEventListener("mouseup", () => drag = false);
window.addEventListener("mousemove", e => {
  if (!drag) return;
  theta += (e.x - lx) * 0.01; phi += (e.y - ly) * 0.01;
  phi = Math.max(-1.4, Math.min(1.4, phi));
  lx = e.x; ly = e.y; interact();
});
window.addEventListener("wheel", e => {
  r *= Math.exp(e.deltaY * 0.001); r = Math.max(0.3, Math.min(3, r));
  interact();
});
window.addEventListener("keydown", e => {
  if (e.key === "d") { mode = mode === "rgb" ? "depth" : "rgb"; interact(); }
  if (e.key === "p") {
    path.push({theta: theta, phi: phi, r: r});
    hud.textContent = `path: ${path.length} pose(s) | e: export`;
  }
  if (e.key === "e" && path.length) {
    if (wsOk) {
      ws.send(JSON.stringify({type: "export_path", poses: path}));
    } else {
      fetch("/export_path", {method: "POST", body: JSON.stringify(path)})
        .then(rsp => rsp.json())
        .then(d => { hud.textContent = `wrote ${d.path}`; path = []; });
    }
  }
});
</script></body></html>"""

# progressive quality: resolution divisor per level (relative to the
# --downscale base resolution)
_QUALITY_DIVISORS = (4, 2, 1)


class _State:
    params = None
    proposal = None
    config = None
    cameras = None  # full-quality viewer cameras
    radius = 4.0
    run_dir = "."
    path_count = 0
    lock = threading.Lock()  # serializes renders (single chip)
    path_lock = threading.Lock()  # guards path_count/export files


def _scaled_cameras(cams, divisor: int):
    if divisor <= 1:
        return cams
    from rsn.data.cameras import Cameras
    return Cameras(camera_to_worlds=cams.camera_to_worlds,
                   fx=cams.fx / divisor, fy=cams.fy / divisor,
                   cx=cams.cx / divisor, cy=cams.cy / divisor,
                   width=cams.width // divisor,
                   height=cams.height // divisor)


def _pose_matrix(theta: float, phi: float, r: float) -> np.ndarray:
    from rsn.data.synthetic import _look_at_pose

    eye = np.array([np.cos(theta) * np.cos(phi),
                    np.sin(theta) * np.cos(phi),
                    np.sin(phi)], np.float32)
    eye *= _State.radius * r
    return _look_at_pose(eye)


def _render_pose(theta: float, phi: float, r: float, mode: str,
                 q: int) -> bytes:
    import jax.numpy as jnp
    from PIL import Image

    from rsn.data.cameras import Cameras
    from rsn.engine.trainer import preferred_eval_chunk, render_image
    from rsn.cli.render import apply_depth_colormap

    pose = _pose_matrix(theta, phi, r)
    divisor = _QUALITY_DIVISORS[max(0, min(q, len(_QUALITY_DIVISORS) - 1))]
    ref = _scaled_cameras(_State.cameras, divisor)
    cams = Cameras(
        camera_to_worlds=jnp.asarray(pose[None, :3, :4]),
        fx=ref.fx[:1], fy=ref.fy[:1], cx=ref.cx[:1], cy=ref.cy[:1],
        width=ref.width, height=ref.height)
    with _State.lock:  # one render at a time (single chip)
        # the viewer shows final_rgb / depth overlays only: density-only
        # coarse pass (output-aware render, VERDICT r4 #2)
        out = render_image(_State.params, cams, 0, _State.config,
                           prop_params=_State.proposal,
                           rays_per_chunk=preferred_eval_chunk(
                               _State.config),
                           product_only=True)
    mcfg = _State.config.pipeline.model
    if mode == "depth":
        img = apply_depth_colormap(out["depth_fine"],
                                   out["accumulation_fine"],
                                   mcfg.collider_near_plane,
                                   mcfg.collider_far_plane)
    else:
        from rsn.models.model import final_rgb
        img = np.clip(final_rgb(out), 0, 1)
    buf = io.BytesIO()
    Image.fromarray((img * 255).astype(np.uint8)).save(buf, "PNG")
    return buf.getvalue()


def export_camera_path(poses, run_dir: str, cameras) -> str:
    """Write a camera-path JSON (renderable by rsn.cli.render --mode
    path) from a list of {theta, phi, r} viewer poses."""
    frames = [{"camera_to_world": _pose_matrix(
        float(p["theta"]), float(p["phi"]), float(p["r"])).tolist()}
        for p in poses]
    path_dir = os.path.join(run_dir, "camera_paths")
    os.makedirs(path_dir, exist_ok=True)
    with _State.path_lock:  # concurrent exports must not share a name
        _State.path_count += 1
        count = _State.path_count
    fname = os.path.join(
        path_dir, f"path-{int(time.time())}-{count}.json")
    doc = {
        "camera_type": "perspective",
        "fx": float(cameras.fx[0]), "fy": float(cameras.fy[0]),
        "cx": float(cameras.cx[0]), "cy": float(cameras.cy[0]),
        "width": int(cameras.width), "height": int(cameras.height),
        "frames": frames,
    }
    with open(fname, "w") as f:
        json.dump(doc, f, indent=1)
    return fname


class _Handler(BaseHTTPRequestHandler):
    # websocket upgrades are an HTTP/1.1 feature (browsers reject a
    # 101 on an HTTP/1.0 status line); _reply always sets
    # Content-Length so keep-alive is safe
    protocol_version = "HTTP/1.1"

    def log_message(self, *args):
        pass

    def _reply(self, body: bytes, ctype: str, code: int = 200):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    # ---- websocket transport (RFC 6455; rsn/utils/websocket.py) ----

    def _ws_upgrade(self):
        """101 handshake, then serve push-rendered frames until close."""
        key = self.headers.get("Sec-WebSocket-Key")
        if not key:
            self._reply(b"missing Sec-WebSocket-Key", "text/plain", 400)
            return
        self.send_response(101, "Switching Protocols")
        for name, value in ws_lib.handshake_response_headers(key):
            self.send_header(name, value)
        self.end_headers()
        self.wfile.flush()
        try:
            self._ws_serve()
        except (ConnectionError, OSError):
            pass  # peer went away mid-frame; nothing to salvage
        self.close_connection = True

    def _ws_send_json(self, obj):
        self.wfile.write(ws_lib.encode_frame(
            json.dumps(obj).encode(), ws_lib.OP_TEXT))
        self.wfile.flush()

    def _ws_dispatch(self, msg):
        """Handle one client message; returns a pose dict to render, or
        None for messages answered inline (export_path)."""
        opcode, payload = msg
        if opcode != ws_lib.OP_TEXT:
            return None
        d = json.loads(payload)
        if d.get("type") == "pose":
            return d
        if d.get("type") == "export_path":
            fname = export_camera_path(d.get("poses", []), _State.run_dir,
                                       _State.cameras)
            self._ws_send_json({"type": "path_exported", "path": fname,
                                "num_frames": len(d.get("poses", []))})
        return None

    def _ws_serve(self):
        """Pose-coalescing render loop: the newest pose always wins.

        Each pose renders progressively (q=0 -> 1 -> 2), pushing a
        binary frame [quality byte][png] per level; between levels any
        queued client messages are drained and a fresh pose restarts
        refinement at q=0 — exactly the nerfstudio viewer's
        move-fast/settle-sharp behavior, server-side."""
        pending = None
        while True:
            if pending is None:
                msg = ws_lib.read_message(self.rfile, self.wfile)
                if msg is None:
                    return
                pending = self._ws_dispatch(msg)
                continue
            pose, pending = pending, None
            for q in range(len(_QUALITY_DIVISORS)):
                png = _render_pose(
                    float(pose.get("theta", 0.0)),
                    float(pose.get("phi", 0.3)),
                    float(pose.get("r", 1.0)),
                    str(pose.get("mode", "rgb")), q)
                self.wfile.write(ws_lib.encode_frame(bytes([q]) + png,
                                                     ws_lib.OP_BINARY))
                self.wfile.flush()
                # coalesce whatever arrived while rendering (socket-
                # level readiness check; a frame already sitting in the
                # rfile buffer is picked up by the next blocking read)
                while select.select([self.connection], [], [], 0)[0]:
                    msg = ws_lib.read_message(self.rfile, self.wfile)
                    if msg is None:
                        return
                    got = self._ws_dispatch(msg)
                    if got is not None:
                        pending = got
                if pending is not None:
                    break  # newer pose: restart refinement at q=0

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/ws":
            self._ws_upgrade()
        elif url.path == "/":
            self._reply(_PAGE.encode(), "text/html")
        elif url.path == "/render":
            q = parse_qs(url.query)
            body = _render_pose(
                float(q.get("theta", ["0"])[0]),
                float(q.get("phi", ["0.3"])[0]),
                float(q.get("r", ["1"])[0]),
                q.get("mode", ["rgb"])[0],
                int(q.get("q", ["0"])[0]))
            self._reply(body, "image/png")
        else:
            self._reply(b"not found", "text/plain", 404)

    def do_POST(self):
        url = urlparse(self.path)
        if url.path != "/export_path":
            self._reply(b"not found", "text/plain", 404)
            return
        n = int(self.headers.get("Content-Length", "0"))
        poses = json.loads(self.rfile.read(n) or b"[]")
        fname = export_camera_path(poses, _State.run_dir, _State.cameras)
        self._reply(json.dumps(
            {"path": fname, "num_frames": len(poses)}).encode(),
            "application/json")


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(description="interactive viewer")
    p.add_argument("--load-dir", required=True)
    p.add_argument("--port", type=int, default=7007)
    p.add_argument("--downscale", type=int, default=2,
                   help="full-quality resolution divisor (interactive "
                        "levels render at a further /4 and /2)")
    ns = p.parse_args(argv)

    from rsn.cli.run_io import load_run_full
    from rsn.data.blender import load_dataset

    params, config, step, extras = load_run_full(ns.load_dir)
    dm = config.pipeline.datamanager
    ds = load_dataset(dm.dataparser, dm.data or "", "train",
                      dm.downscale_factor, dm.scale_factor)
    cams = _scaled_cameras(ds.cameras, ns.downscale)
    _State.params = params
    _State.proposal = extras.get("proposal")
    _State.config = config
    _State.cameras = cams
    _State.run_dir = ns.load_dir
    _State.radius = float(np.linalg.norm(
        np.asarray(ds.cameras.camera_to_worlds)[:, :3, 3], axis=-1).mean())

    server = ThreadingHTTPServer(("0.0.0.0", ns.port), _Handler)
    print(f"rsn viewer (step {step}) at http://localhost:{ns.port}/",
          flush=True)

    def _warmup():
        # precompile the three progressive-quality render programs so
        # the first interaction doesn't stall on compilation (each
        # whole-image program takes tens of seconds to build on a
        # remote backend); render_image caches per (config, chunk,
        # n_chunks) so these compiles are reused for every later frame
        for q in range(len(_QUALITY_DIVISORS)):
            t0 = time.time()
            _render_pose(0.0, 0.3, 1.0, "rgb", q)
            print(f"viewer: warmed quality level {q} "
                  f"({time.time() - t0:.1f}s)", flush=True)

    threading.Thread(target=_warmup, daemon=True).start()
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
