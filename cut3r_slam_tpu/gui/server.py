"""HTTP state server for the live SLAM viewer.

Replaces the reference's queue-fed Open3D process
(/root/reference/hislam2/gaussian/gui/slam_gui.py:1-711,
gui_utils.py Packet_vis2main/main2vis): rather than pushing every update
into a multiprocessing queue, the server holds a reference to the live
``SLAMSystem`` and snapshots its state ON REQUEST. Reads touch only
host-side numpy buffers (KeyframeStore) plus one device->host pull of the
Gaussian arena per /api/splats request; nothing runs when no client asks.

Endpoints
---------
/                  viewer page (WebGL2, no external assets)
/api/state         JSON: keyframe poses (7-vec [t xyz, q xyzw]), tstamps,
                   loop edges, counters
/api/splats        binary splat dump: u32 count, then per-splat
                   3f32 xyz | 3u8 rgb | u8 opacity | f32 scale  (20 B)
/api/kf_image?i=N  keyframe N's stored RGB as PNG
/api/render?w2c=16 novel view rasterized SERVER-SIDE by the repo's own
                   Gaussian rasterizer (the reference GUI's rendered-view
                   display, slam_gui.py rendering path) — w2c is 16
                   comma-separated row-major floats (CV convention:
                   +z forward, y down)
"""
from __future__ import annotations

import io
import json
import os
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

__all__ = ["ViewerServer"]

_HTML_PATH = os.path.join(os.path.dirname(__file__), "viewer.html")


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _encode_png(img_u8: np.ndarray):
    try:
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(img_u8).save(buf, format="PNG")
        return buf.getvalue()
    except ImportError:
        import cv2
        ok, png = cv2.imencode(
            ".png", cv2.cvtColor(img_u8, cv2.COLOR_RGB2BGR))
        return png.tobytes() if ok else None


def pack_splats(arena, max_splats: int = 400_000) -> bytes:
    """Serialize the alive slots of a GaussianArena into the wire format.

    One device->host transfer per field; SH degree-0 color is converted
    to sRGB-ish u8 the same way the PLY dump does (utils/viz.py).
    """
    alive = np.asarray(arena.alive)
    idx = np.flatnonzero(alive)[:max_splats]
    n = idx.size
    xyz = np.asarray(arena.xyz)[idx].astype("<f4")
    SH_C0 = 0.28209479177387814
    rgb = np.clip((np.asarray(arena.f_dc)[idx] * SH_C0 + 0.5) * 255.0,
                  0, 255).astype(np.uint8)
    opa = (np.clip(_sigmoid(np.asarray(arena.opacity_logit)[idx]), 0, 1)
           * 255).astype(np.uint8)
    scale = np.exp(np.asarray(arena.log_scales)[idx]).mean(
        axis=1).astype("<f4")
    rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3),
                             ("opa", "u1"), ("scale", "<f4")])
    rec["xyz"], rec["rgb"], rec["opa"], rec["scale"] = xyz, rgb, opa, scale
    return struct.pack("<I", n) + rec.tobytes()


class _Handler(BaseHTTPRequestHandler):
    server_version = "cut3r-viewer/1.0"

    # the ViewerServer instance is attached to the HTTPServer object
    @property
    def viewer(self) -> "ViewerServer":
        return self.server._viewer  # type: ignore[attr-defined]

    def log_message(self, fmt, *args):  # quiet by default
        if self.viewer.verbose:
            super().log_message(fmt, *args)

    def _send(self, code: int, ctype: str, body: bytes):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Cache-Control", "no-store")
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802  (http.server API)
        try:
            url = urlparse(self.path)
            if url.path in ("/", "/index.html"):
                with open(_HTML_PATH, "rb") as f:
                    self._send(200, "text/html; charset=utf-8", f.read())
            elif url.path == "/api/state":
                body = json.dumps(self.viewer.state_dict()).encode()
                self._send(200, "application/json", body)
            elif url.path == "/api/splats":
                self._send(200, "application/octet-stream",
                           self.viewer.splats_bytes())
            elif url.path == "/api/kf_image":
                q = parse_qs(url.query)
                i = int(q.get("i", ["0"])[0])
                png = self.viewer.kf_image_png(i)
                if png is None:
                    self._send(404, "text/plain", b"no such keyframe")
                else:
                    self._send(200, "image/png", png)
            elif url.path == "/api/render":
                q = parse_qs(url.query)
                vals = [float(v) for v in
                        q.get("w2c", [""])[0].split(",") if v]
                png = (self.viewer.render_pose_png(vals)
                       if len(vals) == 16 else None)
                if png is None:
                    self._send(404, "text/plain", b"no map to render")
                else:
                    self._send(200, "image/png", png)
            else:
                self._send(404, "text/plain", b"not found")
        except BrokenPipeError:
            pass
        except Exception as e:  # never take the SLAM loop down
            try:
                self._send(500, "text/plain", repr(e).encode())
            except Exception:
                pass


class ViewerServer:
    """Serve the live state of a ``SLAMSystem`` to a browser.

    Usage::

        viewer = ViewerServer(slam, port=8080)   # daemon thread
        ...
        viewer.stop()

    ``slam`` is read on request; KeyframeStore buffers are host numpy
    (atomic row writes), the Gaussian arena is an immutable jax pytree
    swapped whole, so snapshot reads are safe without locking the loop.
    """

    def __init__(self, slam, host: str = "127.0.0.1", port: int = 8080,
                 max_splats: int = 400_000, verbose: bool = False):
        self.slam = slam
        self.max_splats = max_splats
        self.verbose = verbose
        self._httpd = ThreadingHTTPServer((host, port), _Handler)
        self._httpd.daemon_threads = True
        self._httpd._viewer = self  # type: ignore[attr-defined]
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="cut3r-viewer",
            daemon=True)
        self._thread.start()

    # ----------------------------------------------------- snapshots --
    def state_dict(self) -> dict:
        slam = self.slam
        kf = slam.keyframes
        n = int(kf.count)
        st = {
            "n_kf": n,
            "tstamps": kf.tstamp[:n].tolist(),
            "poses": np.asarray(kf.pose[:n], np.float32)
            .round(6).tolist(),  # (n, 7) [t xyz, q xyzw] c2w
            "img_hw": list(getattr(slam, "img_hw", (0, 0))),
            "loop_edges": [],
            "n_alive": 0,
            "frame": int(getattr(slam, "last_t", -1)),
        }
        backend = getattr(slam, "backend", None)
        if backend is not None and getattr(backend, "closed_loop", None):
            cur = backend.closed_loop.get("idx_current", [])
            mat = backend.closed_loop.get("idx_matched", [])
            st["loop_edges"] = [[int(a), int(b)] for a, b in zip(mat, cur)]
        mapper = getattr(slam, "mapper", None)
        if mapper is not None:
            st["n_alive"] = int(np.asarray(mapper.arena.alive).sum())
        return st

    def splats_bytes(self) -> bytes:
        mapper = getattr(self.slam, "mapper", None)
        if mapper is None:
            return struct.pack("<I", 0)
        return pack_splats(mapper.arena, self.max_splats)

    def kf_image_png(self, i: int):
        kf = self.slam.keyframes
        if not (0 <= i < int(kf.count)):
            return None
        return _encode_png(np.asarray(kf.image[i]))

    def render_pose_png(self, w2c16):
        """Rasterize the live map from an arbitrary camera with the
        repo's own renderer (slam/renderer.render_view — same jit
        program the eval path uses, so no extra compiles after eval)."""
        mapper = getattr(self.slam, "mapper", None)
        if mapper is None or not all(hasattr(mapper, a) for a in
                                     ("arena", "K4", "raster_cfg")):
            return None
        import jax.numpy as jnp
        from ..slam.renderer import render_view
        w2c = jnp.asarray(np.asarray(w2c16, np.float32).reshape(4, 4))
        out = render_view(mapper.arena.params(), mapper.arena.alive,
                          w2c, mapper.K4, mapper.raster_cfg)
        img = np.clip(np.asarray(out["color"], np.float32), 0.0, 1.0)
        return _encode_png((img * 255).astype(np.uint8))

    # -------------------------------------------------------- control --
    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)
