"""Headless visualization dumps (the verbose-artifact oracle).

Counterparts of /root/reference/hislam2/util/utils.py viz_pcd/viz_map
(:143, :176) and the Gaussian PLY snapshots (gs_backend_per_frame.py:639):
colored point-cloud / pointmap PLYs and colorized depth PNGs, written from
host numpy — the debugging workflow the reference drives with
verbose=True. (The interactive Open3D GUI of the reference is
intentionally replaced by these headless artifacts.)
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["save_pcd_ply", "save_depth_png", "save_gaussians_ply",
           "save_image"]


def save_image(path: str, arr: np.ndarray):
    """Write an image array (uint8 RGB/gray or uint16 depth) to disk,
    preferring cv2 (fast jpg/png codecs) with a PIL fallback."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import cv2
        if arr.ndim == 3 and arr.shape[-1] == 3:
            arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
        cv2.imwrite(path, arr)
    except ImportError:
        from PIL import Image
        if path.endswith(".jpg") and arr.dtype != np.uint8:
            arr = arr.astype(np.uint8)
        mode = "I;16" if arr.dtype == np.uint16 else None
        Image.fromarray(arr, mode=mode).save(path)


def save_pcd_ply(path: str, points: np.ndarray,
                 colors: Optional[np.ndarray] = None,
                 conf: Optional[np.ndarray] = None, conf_th: float = 0.0):
    """points (N, 3); colors (N, 3) in [0,1]; optional confidence filter."""
    pts = np.asarray(points).reshape(-1, 3)
    cols = (np.asarray(colors).reshape(-1, 3) if colors is not None
            else np.full_like(pts, 0.7))
    if conf is not None:
        m = np.asarray(conf).reshape(-1) > conf_th
        pts, cols = pts[m], cols[m]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        cu8 = np.clip(cols * 255, 0, 255).astype(int)
        for p, c in zip(pts, cu8):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c[0]} {c[1]} {c[2]}\n")
    return len(pts)


def _turbo(x: np.ndarray) -> np.ndarray:
    """Compact turbo-like colormap for depth viz."""
    x = np.clip(x, 0, 1)
    r = np.clip(1.6 - np.abs(4 * x - 3.2), 0, 1)
    g = np.clip(1.6 - np.abs(4 * x - 1.8), 0, 1)
    b = np.clip(1.6 - np.abs(4 * x - 0.6), 0, 1)
    return np.stack([r, g, b], -1)


def save_depth_png(path: str, depth: np.ndarray, colorize: bool = True):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    d = np.asarray(depth, np.float32)
    if colorize:
        v = d[d > 0]
        lo, hi = (v.min(), v.max()) if v.size else (0, 1)
        img = (_turbo((d - lo) / max(hi - lo, 1e-6)) * 255).astype(np.uint8)
    else:
        img = np.clip(d * 255, 0, 255).astype(np.uint8)
    try:
        import cv2
        cv2.imwrite(path, img[..., ::-1] if img.ndim == 3 else img)
    except ImportError:
        from PIL import Image
        Image.fromarray(img).save(path)


def save_gaussians_ply(path: str, arena, max_points: int = 500_000):
    """Gaussian centers colored by SH0 (3dgs_final.ply analog)."""
    from ..slam.gaussian_map import SH2RGB
    alive = np.asarray(arena.alive)
    xyz = np.asarray(arena.xyz)[alive][:max_points]
    cols = np.clip(np.asarray(SH2RGB(arena.f_dc))[alive][:max_points], 0, 1)
    return save_pcd_ply(path, xyz, cols)
