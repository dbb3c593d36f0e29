"""RGB-D dataset loaders for GT-injection runs and evaluation.

Counterpart of /root/reference/dataset/dataset.py (BaseDataset + ScanNet /
Replica torch Datasets): resize rule h=(H//64)*16, w=h*4/3; GT poses to
[t, q xyzw]; 16-bit depth PNG scaling. Plain-python iterables (no torch).
"""
from __future__ import annotations

import os
import glob
from typing import Dict, Iterator, Optional

import numpy as np

from ..utils.image import _imread

__all__ = ["get_dataset", "ReplicaDataset", "ScanNetDataset", "TUMDataset"]


def _read_depth(path: str, scale: float) -> np.ndarray:
    try:
        import cv2
        d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    except ImportError:
        from PIL import Image
        d = np.asarray(Image.open(path))
    return np.asarray(d, np.float32) / scale


def _mat_to_tq(m: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation
    q = Rotation.from_matrix(m[:3, :3]).as_quat()
    return np.concatenate([m[:3, 3], q]).astype(np.float32)


class BaseRGBD:
    color_paths: list
    depth_paths: list
    poses: Optional[np.ndarray]
    K4: np.ndarray
    depth_scale: float = 6553.5

    def __len__(self):
        return len(self.color_paths)

    def __getitem__(self, i: int) -> Dict:
        img = _imread(self.color_paths[i])
        out = {"t": i, "image": img, "K4": self.K4}
        if self.depth_paths:
            out["depth"] = _read_depth(self.depth_paths[i], self.depth_scale)
        if self.poses is not None:
            out["pose"] = self.poses[i]  # c2w [t, q xyzw]
        return out

    def __iter__(self) -> Iterator[Dict]:
        for i in range(len(self)):
            yield self[i]


class ReplicaDataset(BaseRGBD):
    """Replica format: results/frame*.jpg + depth*.png + traj.txt."""

    def __init__(self, folder: str, calib=None):
        res = os.path.join(folder, "results")
        self.color_paths = sorted(glob.glob(os.path.join(res, "frame*.jpg")))
        self.depth_paths = sorted(glob.glob(os.path.join(res, "depth*.png")))
        self.depth_scale = 6553.5
        self.K4 = np.asarray(calib if calib is not None
                             else [600.0, 600.0, 599.5, 339.5], np.float32)
        traj = os.path.join(folder, "traj.txt")
        self.poses = None
        if os.path.exists(traj):
            mats = np.loadtxt(traj).reshape(-1, 4, 4)
            self.poses = np.stack([_mat_to_tq(m) for m in mats])


class ScanNetDataset(BaseRGBD):
    """ScanNet export: color/*.jpg, depth/*.png, pose/*.txt."""

    def __init__(self, folder: str, calib=None):
        self.color_paths = sorted(
            glob.glob(os.path.join(folder, "color", "*.jpg")),
            key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
        self.depth_paths = sorted(
            glob.glob(os.path.join(folder, "depth", "*.png")),
            key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
        self.depth_scale = 1000.0
        intr = os.path.join(folder, "intrinsic", "intrinsic_color.txt")
        if calib is not None:
            self.K4 = np.asarray(calib, np.float32)
        elif os.path.exists(intr):
            K = np.loadtxt(intr)
            self.K4 = np.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2]],
                                 np.float32)
        else:
            self.K4 = np.asarray([577.6, 578.7, 318.9, 242.7], np.float32)
        pose_files = sorted(
            glob.glob(os.path.join(folder, "pose", "*.txt")),
            key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
        self.poses = (np.stack([_mat_to_tq(np.loadtxt(p).reshape(4, 4))
                                for p in pose_files])
                      if pose_files else None)


class TUMDataset(BaseRGBD):
    """TUM RGB-D: rgb.txt / depth.txt / groundtruth.txt association."""

    def __init__(self, folder: str, calib=None, max_dt: float = 0.08):
        def read_list(name):
            path = os.path.join(folder, name)
            if not os.path.exists(path):
                return np.zeros((0, 2), object)
            rows = [l.split() for l in open(path)
                    if l.strip() and not l.startswith("#")]
            return rows

        rgb = read_list("rgb.txt")
        depth = read_list("depth.txt")
        gt = read_list("groundtruth.txt")
        self.depth_scale = 5000.0
        self.K4 = np.asarray(calib if calib is not None
                             else [517.3, 516.5, 318.6, 255.3], np.float32)

        d_ts = np.asarray([float(r[0]) for r in depth]) if depth else None
        g_ts = np.asarray([float(r[0]) for r in gt]) if gt else None
        self.color_paths, self.depth_paths, poses = [], [], []
        for row in rgb:
            ts = float(row[0])
            self.color_paths.append(os.path.join(folder, row[1]))
            if d_ts is not None and len(d_ts):
                j = int(np.argmin(np.abs(d_ts - ts)))
                if abs(d_ts[j] - ts) < max_dt:
                    self.depth_paths.append(os.path.join(folder, depth[j][1]))
                else:
                    self.depth_paths.append(None)
            if g_ts is not None and len(g_ts):
                j = int(np.argmin(np.abs(g_ts - ts)))
                v = np.asarray([float(x) for x in gt[j][1:8]], np.float32)
                poses.append(v)  # [tx ty tz qx qy qz qw]
        self.poses = np.stack(poses) if poses else None
        if not any(self.depth_paths):
            self.depth_paths = []


def get_dataset(kind: str, folder: str, calib=None) -> BaseRGBD:
    kinds = {"replica": ReplicaDataset, "scannet": ScanNetDataset,
             "tum": TUMDataset}
    if kind not in kinds:
        raise ValueError(f"unknown dataset {kind}; options {list(kinds)}")
    return kinds[kind](folder, calib)
