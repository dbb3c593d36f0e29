"""Viewer server tests (counterpart of the reference's GUI process,
/root/reference/hislam2/gaussian/gui/slam_gui.py — here a pull-based HTTP
server, cut3r_slam_tpu/gui/server.py).

Uses a lightweight fake SLAM object so no jax programs compile; the wire
format and state snapshot logic are what's under test. The SLAMSystem
GUI config gate (cfg["GUI"]["active"]) is exercised in demo.py.
"""
import json
import struct
import urllib.error
import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.gui.server import ViewerServer, pack_splats


class _FakeArena:
    def __init__(self, n_alive=5, capacity=16):
        self.alive = jnp.arange(capacity) < n_alive
        self.xyz = jnp.arange(capacity * 3, dtype=jnp.float32).reshape(
            capacity, 3) * 0.1
        self.f_dc = jnp.zeros((capacity, 3))
        self.opacity_logit = jnp.zeros((capacity,))
        self.log_scales = jnp.full((capacity, 3), -2.0)


class _FakeKF:
    def __init__(self, n=3, hw=(8, 12)):
        self.count = n
        self.tstamp = np.arange(64, dtype=np.int64) * 2
        self.pose = np.tile(
            np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (64, 1))
        self.pose[:n, 0] = np.arange(n) * 0.5
        self.image = np.zeros((64, hw[0], hw[1], 3), np.uint8)
        self.image[:n] = 77


class _FakeBackend:
    closed_loop = {"idx_current": [2], "idx_matched": [0]}


class _FakeMapper:
    arena = _FakeArena()


class _FakeSLAM:
    keyframes = _FakeKF()
    backend = _FakeBackend()
    mapper = _FakeMapper()
    img_hw = (8, 12)
    last_t = 4


@pytest.fixture(scope="module")
def server():
    s = ViewerServer(_FakeSLAM(), port=0)  # ephemeral port
    yield s
    s.stop()


def _get(server, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}{path}", timeout=10) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_pack_splats_format():
    buf = pack_splats(_FakeArena(n_alive=5))
    (n,) = struct.unpack_from("<I", buf, 0)
    assert n == 5
    assert len(buf) == 4 + n * 20  # 3f32 + 3u8 + u8 + f32
    rec = np.frombuffer(buf, offset=4,
                        dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3),
                               ("opa", "u1"), ("scale", "<f4")])
    np.testing.assert_allclose(rec["xyz"][1], [0.3, 0.4, 0.5], rtol=1e-6)
    assert (rec["opa"] == 127).all()          # sigmoid(0) * 255
    np.testing.assert_allclose(rec["scale"], np.exp(-2.0), rtol=1e-6)


def test_pack_splats_cap():
    buf = pack_splats(_FakeArena(n_alive=10), max_splats=4)
    (n,) = struct.unpack_from("<I", buf, 0)
    assert n == 4


def test_index_page(server):
    status, ctype, body = _get(server, "/")
    assert status == 200 and "text/html" in ctype
    assert b"webgl2" in body.lower()


def test_state_endpoint(server):
    status, ctype, body = _get(server, "/api/state")
    assert status == 200 and "application/json" in ctype
    st = json.loads(body)
    assert st["n_kf"] == 3
    assert st["frame"] == 4
    assert st["loop_edges"] == [[0, 2]]
    assert st["n_alive"] == 5
    assert len(st["poses"]) == 3 and len(st["poses"][0]) == 7
    assert st["poses"][1][0] == pytest.approx(0.5)


def test_splats_endpoint(server):
    status, ctype, body = _get(server, "/api/splats")
    assert status == 200 and "octet-stream" in ctype
    (n,) = struct.unpack_from("<I", body, 0)
    assert n == 5 and len(body) == 4 + 5 * 20


def test_kf_image_endpoint(server):
    status, ctype, body = _get(server, "/api/kf_image?i=1")
    assert status == 200 and ctype == "image/png"
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    status, _, _ = _get_err(server, "/api/kf_image?i=99")
    assert status == 404


def _get_err(server, path):
    try:
        return _get(server, path)
    except urllib.error.HTTPError as e:
        return e.code, None, None


def test_unknown_route(server):
    status, _, _ = _get_err(server, "/nope")
    assert status == 404


def test_render_endpoint_guards(server):
    # fake mapper lacks K4/raster_cfg -> graceful 404, never a crash
    w2c = ",".join(["1", "0", "0", "0", "0", "1", "0", "0",
                    "0", "0", "1", "0", "0", "0", "0", "1"])
    status, _, _ = _get_err(server, f"/api/render?w2c={w2c}")
    assert status == 404
    status, _, _ = _get_err(server, "/api/render?w2c=1,2,3")  # malformed
    assert status == 404
