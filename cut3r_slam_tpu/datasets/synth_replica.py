"""Synthetic Replica-layout sequence writer.

The reference's Replica drivers (/root/reference/scripts/run_replica.py
:27-57, demo_s.py:117-151) run turnkey on the Replica download:
``<root>/<seq>/results/frame*.jpg`` + ``<root>/<seq>/traj.txt`` (one
flattened 4x4 c2w per frame). No dataset ships in this environment, so
this module renders the SAME layout from the procedural ray-cast scene
(datasets/synthscene.SynthScene) — a smooth low-parallax camera arc with
frame-to-frame overlap — so the eval drivers, the demo, the ATE metric
and the TSDF mesh pipeline can be exercised end-to-end in CI
(tests/test_eval_drivers.py, slow tier).

Layout written (matching the reference's Replica loaders):
  <root>/<seq>/results/frame{i:06d}.jpg    RGB
  <root>/<seq>/results/depth{i:06d}.png    uint16 depth * 6553.5
  <root>/<seq>/traj.txt                    N rows x 16 (flattened c2w)
"""
from __future__ import annotations

import os

import numpy as np

from .synthscene import SynthScene, _lookat

__all__ = ["write_replica_sequence", "REPLICA_K4"]

# calib/replica.txt — the reference's Replica pinhole (1200 x 680)
REPLICA_K4 = np.asarray([600.0, 600.0, 599.5, 339.5], np.float32)
REPLICA_HW = (680, 1200)


def _save_rgb(path: str, img: np.ndarray):
    try:
        import cv2
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    except ImportError:
        from PIL import Image
        Image.fromarray(img).save(path)


def _save_depth16(path: str, depth: np.ndarray):
    d16 = np.clip(depth * 6553.5, 0, 65535).astype(np.uint16)
    try:
        import cv2
        cv2.imwrite(path, d16)
    except ImportError:
        from PIL import Image
        Image.fromarray(d16).save(path)


def camera_arc(n: int, seed: int = 0, radius: float = 5.0,
               sweep: float = 0.9) -> np.ndarray:
    """Smooth c2w path: an arc segment at camera height looking at the
    scene center, ``sweep`` radians end-to-end — consecutive frames
    overlap heavily (the SLAM frontend's small-baseline regime), unlike
    sample_viewpoints' ring of weakly-overlapping training views."""
    rng = np.random.default_rng(seed)
    th0 = rng.uniform(0.0, 2 * np.pi)
    poses = []
    for i in range(n):
        th = th0 + sweep * i / max(n - 1, 1)
        eye = np.asarray([radius * np.cos(th), -1.6, radius * np.sin(th)],
                         np.float32)
        target = np.asarray([0.0, 0.5, 0.0], np.float32)
        poses.append(_lookat(eye, target))
    return np.stack(poses)


def write_replica_sequence(root: str, seq: str = "synth0",
                           n_frames: int = 24, hw=None, K4=None,
                           seed: int = 0, write_depth: bool = True
                           ) -> str:
    """Render + write one Replica-layout sequence; returns its directory.
    Defaults to the native Replica resolution/intrinsics so the stock
    ``calib/replica.txt`` + ``config/replica_config.yaml`` drive it
    unchanged."""
    H, W = hw if hw is not None else REPLICA_HW
    K4 = np.asarray(K4 if K4 is not None else REPLICA_K4, np.float32)
    scene = SynthScene(seed=seed)
    poses = camera_arc(n_frames, seed=seed)
    d = os.path.join(root, seq)
    res = os.path.join(d, "results")
    os.makedirs(res, exist_ok=True)
    rows = []
    for i, c2w in enumerate(poses):
        rgb, depth = scene.render(c2w, K4, H, W)
        _save_rgb(os.path.join(res, f"frame{i:06d}.jpg"), rgb)
        if write_depth:
            _save_depth16(os.path.join(res, f"depth{i:06d}.png"), depth)
        rows.append(np.asarray(c2w, np.float64).reshape(-1))
    np.savetxt(os.path.join(d, "traj.txt"), np.stack(rows))
    return d
