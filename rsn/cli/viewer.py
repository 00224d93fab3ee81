"""rsn-viewer — a lightweight browser viewer (the ns-viewer equivalent).

Serves a single-page viewer over HTTP: orbit the camera with drag /
scroll; each pose change requests a fresh render from the model.  This
replaces the reference's inherited websocket viewer
(reflect_sampling_nerf_config.py:59-60: viewer chunk 1024, vis="viewer")
with a dependency-free stdlib server — the render itself runs the same
chunked `render_image` path as eval.

Usage:
  python -m rsn.cli.viewer --load-dir outputs/.../<timestamp> [--port 7007]
"""
from __future__ import annotations

import io
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>rsn viewer</title><style>
body { margin:0; background:#111; color:#ddd; font:13px monospace; }
#hud { position:fixed; top:8px; left:8px; }
img { display:block; margin:0 auto; image-rendering:pixelated;
      width:min(90vw, 90vh); }
</style></head><body>
<div id="hud">drag: orbit &middot; wheel: zoom &middot; key d: depth</div>
<img id="view" src="/render?theta=0&phi=0.3&r=1.0">
<script>
let theta = 0, phi = 0.3, r = 1.0, drag = false, lx = 0, ly = 0;
let mode = "rgb", inflight = false, dirty = false;
const img = document.getElementById("view");
function refresh() {
  if (inflight) { dirty = true; return; }
  inflight = true;
  const src = `/render?theta=${theta}&phi=${phi}&r=${r}&mode=${mode}`;
  const probe = new Image();
  probe.onload = () => { img.src = probe.src; inflight = false;
                         if (dirty) { dirty = false; refresh(); } };
  probe.src = src;
}
window.addEventListener("mousedown", e => { drag = true; lx = e.x; ly = e.y; });
window.addEventListener("mouseup", () => drag = false);
window.addEventListener("mousemove", e => {
  if (!drag) return;
  theta += (e.x - lx) * 0.01; phi += (e.y - ly) * 0.01;
  phi = Math.max(-1.4, Math.min(1.4, phi));
  lx = e.x; ly = e.y; refresh();
});
window.addEventListener("wheel", e => {
  r *= Math.exp(e.deltaY * 0.001); r = Math.max(0.3, Math.min(3, r));
  refresh();
});
window.addEventListener("keydown", e => {
  if (e.key === "d") { mode = mode === "rgb" ? "depth" : "rgb"; refresh(); }
});
</script></body></html>"""


class _State:
    params = None
    proposal = None
    config = None
    cameras = None
    radius = 4.0
    lock = threading.Lock()


def _render_pose(theta: float, phi: float, r: float, mode: str) -> bytes:
    import jax.numpy as jnp
    from PIL import Image

    from rsn.data.cameras import Cameras
    from rsn.data.synthetic import _look_at_pose
    from rsn.engine.trainer import render_image
    from rsn.cli.render import apply_depth_colormap

    eye = np.array([np.cos(theta) * np.cos(phi),
                    np.sin(theta) * np.cos(phi),
                    np.sin(phi)], np.float32)
    eye *= _State.radius * r
    pose = _look_at_pose(eye)
    ref = _State.cameras
    cams = Cameras(
        camera_to_worlds=jnp.asarray(pose[None, :3, :4]),
        fx=ref.fx[:1], fy=ref.fy[:1], cx=ref.cx[:1], cy=ref.cy[:1],
        width=ref.width, height=ref.height)
    with _State.lock:  # one render at a time (single chip)
        out = render_image(_State.params, cams, 0, _State.config,
                           prop_params=_State.proposal)
    mcfg = _State.config.pipeline.model
    if mode == "depth":
        img = apply_depth_colormap(out["depth_fine"],
                                   out["accumulation_fine"],
                                   mcfg.collider_near_plane,
                                   mcfg.collider_far_plane)
    else:
        img = np.clip(out["mid_reflect_fine"], 0, 1)
    buf = io.BytesIO()
    Image.fromarray((img * 255).astype(np.uint8)).save(buf, "PNG")
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/":
            body = _PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
        elif url.path == "/render":
            q = parse_qs(url.query)
            body = _render_pose(
                float(q.get("theta", ["0"])[0]),
                float(q.get("phi", ["0.3"])[0]),
                float(q.get("r", ["1"])[0]),
                q.get("mode", ["rgb"])[0])
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
        else:
            self.send_response(404)
            body = b"not found"
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(description="interactive viewer")
    p.add_argument("--load-dir", required=True)
    p.add_argument("--port", type=int, default=7007)
    p.add_argument("--downscale", type=int, default=4,
                   help="render resolution divisor for interactivity")
    ns = p.parse_args(argv)

    from rsn.cli.run_io import load_run_full
    from rsn.data.blender import load_dataset

    params, config, step, extras = load_run_full(ns.load_dir)
    dm = config.pipeline.datamanager
    ds = load_dataset(dm.dataparser, dm.data or "", "train",
                      dm.downscale_factor, dm.scale_factor)
    cams = ds.cameras
    if ns.downscale > 1:
        from rsn.data.cameras import Cameras
        k = ns.downscale
        cams = Cameras(camera_to_worlds=cams.camera_to_worlds,
                       fx=cams.fx / k, fy=cams.fy / k,
                       cx=cams.cx / k, cy=cams.cy / k,
                       width=cams.width // k, height=cams.height // k)
    _State.params = params
    _State.proposal = extras.get("proposal")
    _State.config = config
    _State.cameras = cams
    _State.radius = float(np.linalg.norm(
        np.asarray(ds.cameras.camera_to_worlds)[:, :3, 3], axis=-1).mean())

    server = ThreadingHTTPServer(("0.0.0.0", ns.port), _Handler)
    print(f"rsn viewer (step {step}) at http://localhost:{ns.port}/",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
