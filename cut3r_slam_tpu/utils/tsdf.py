"""TSDF integration + mesh extraction.

Counterpart of /root/reference/tsdf_integrate.py (Open3D VoxelBlockGrid):
integrates rendered keyframe depth + color into a sparse block-hashed TSDF
and extracts a mesh. Host numpy with JAX-accelerated per-frame projection;
marching cubes via skimage when available, otherwise exports the
zero-crossing point cloud.
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["TSDFVolume", "integrate_keyframes"]

BLOCK = 16


def _load_native():
    """Native C++ core (csrc/tsdf_core.cpp); built by `make -C csrc`."""
    path = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                        "libtsdf_core.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.tsdf_integrate_block.argtypes = [
            f32p, f32p, f32p, f32p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float]
        lib.marching_tets_block.restype = ctypes.c_int
        lib.marching_tets_block.argtypes = [
            f32p, f32p, ctypes.c_int, f32p, ctypes.c_float,
            ctypes.c_float, f32p, ctypes.c_int]
        return lib
    except OSError:
        return None


_NATIVE = _load_native()


class TSDFVolume:
    def __init__(self, voxel_size: float = 0.02, trunc: float = 0.08,
                 max_weight: float = 64.0):
        self.voxel_size = voxel_size
        self.trunc = trunc
        self.max_weight = max_weight
        self.blocks: Dict[Tuple[int, int, int], np.ndarray] = {}  # (D,W) pairs
        self.colors: Dict[Tuple[int, int, int], np.ndarray] = {}

    # ------------------------------------------------------------------
    def integrate(self, depth: np.ndarray, color: Optional[np.ndarray],
                  K4: np.ndarray, c2w: np.ndarray,
                  depth_trunc: float = 8.0):
        """Fuse one frame. depth (H, W) metric; color (H, W, 3) in [0,1]."""
        H, W = depth.shape
        fx, fy, cx, cy = K4[:4]
        w2c = np.linalg.inv(c2w)

        # candidate blocks: backproject valid depth to world, collect blocks
        v, u = np.nonzero((depth > 0.01) & (depth < depth_trunc))
        if len(v) == 0:
            return
        z = depth[v, u]
        # allocate blocks along the whole truncation band, not just the
        # surface points (a surface on a block boundary needs both sides)
        key_list = []
        for off in (-self.trunc, 0.0, self.trunc):
            zz = np.maximum(z + off, 1e-3)
            pts = np.stack([(u - cx) / fx * zz, (v - cy) / fy * zz, zz], -1)
            pts_w = pts @ c2w[:3, :3].T + c2w[:3, 3]
            key_list.append(np.floor(
                pts_w / (self.voxel_size * BLOCK)).astype(np.int32))
        keys = np.unique(np.concatenate(key_list), axis=0)

        depth32 = np.ascontiguousarray(depth, np.float32)
        color32 = (np.ascontiguousarray(color, np.float32)
                   if color is not None else None)
        K32 = np.ascontiguousarray(np.asarray(K4[:4]), np.float32)
        w2c32 = np.ascontiguousarray(w2c, np.float32)

        for key in map(tuple, keys):
            if key not in self.blocks:
                self.blocks[key] = np.stack(
                    [np.ones((BLOCK,) * 3, np.float32),
                     np.zeros((BLOCK,) * 3, np.float32)])
                self.colors[key] = np.zeros((BLOCK, BLOCK, BLOCK, 3),
                                            np.float32)
            tsdf_w = self.blocks[key]
            col = self.colors[key]

            if _NATIVE is not None:
                base32 = np.ascontiguousarray(
                    np.asarray(key, np.float32) * BLOCK * self.voxel_size)
                rgb_ptr = (color32.ctypes.data_as(ctypes.c_void_p)
                           if color32 is not None else None)
                _NATIVE.tsdf_integrate_block(
                    tsdf_w[0], tsdf_w[1], col, depth32, rgb_ptr,
                    H, W, K32, w2c32, base32,
                    self.voxel_size, self.trunc, self.max_weight,
                    depth_trunc)
                continue

            # voxel centers in world
            base = np.asarray(key, np.float32) * BLOCK * self.voxel_size
            idx = np.arange(BLOCK, dtype=np.float32) + 0.5
            gz, gy, gx = np.meshgrid(idx, idx, idx, indexing="ij")
            vox = np.stack([gx, gy, gz], -1) * self.voxel_size + base
            p_cam = vox @ w2c[:3, :3].T + w2c[:3, 3]
            zc = p_cam[..., 2]
            uu = fx * p_cam[..., 0] / np.maximum(zc, 1e-6) + cx
            vv = fy * p_cam[..., 1] / np.maximum(zc, 1e-6) + cy
            ok = (zc > 0.01) & (uu >= 0) & (uu < W - 1) & (vv >= 0) & (vv < H - 1)
            ui = np.clip(uu.astype(np.int32), 0, W - 1)
            vi = np.clip(vv.astype(np.int32), 0, H - 1)
            d_obs = depth[vi, ui]
            ok &= d_obs > 0.01
            sdf = (d_obs - zc) / self.trunc
            ok &= sdf > -1.0
            sdf = np.clip(sdf, -1.0, 1.0)

            w_old = tsdf_w[1]
            w_new = np.where(ok, 1.0, 0.0)
            denom = np.maximum(w_old + w_new, 1e-6)
            tsdf_w[0] = np.where(ok, (tsdf_w[0] * w_old + sdf) / denom,
                                 tsdf_w[0])
            if color is not None:
                c_obs = color[vi, ui]
                col[:] = np.where(ok[..., None],
                                  (col * w_old[..., None] + c_obs)
                                  / denom[..., None], col)
            tsdf_w[1] = np.minimum(w_old + w_new, self.max_weight)

    # ------------------------------------------------------------------
    def _extract_native(self, min_weight: float):
        """Marching tetrahedra via the C++ core, with 1-voxel apron
        assembled from neighboring blocks (crack-free seams)."""
        n1 = BLOCK + 1
        max_tris = 6 * 2 * BLOCK ** 3
        buf = np.zeros(max_tris * 9, np.float32)
        all_v, all_f, all_c = [], [], []
        off = 0
        for key, (tsdf, w) in self.blocks.items():
            sdf_g = np.ones((n1,) * 3, np.float32)
            wgt_g = np.zeros((n1,) * 3, np.float32)
            sdf_g[:BLOCK, :BLOCK, :BLOCK] = tsdf
            wgt_g[:BLOCK, :BLOCK, :BLOCK] = w
            # apron from +z / +y / +x neighbors
            for axis, nb in ((0, (key[0], key[1], key[2] + 1)),
                             (1, (key[0], key[1] + 1, key[2])),
                             (2, (key[0] + 1, key[1], key[2]))):
                if nb in self.blocks:
                    nt, nw = self.blocks[nb]
                    if axis == 0:
                        sdf_g[BLOCK, :BLOCK, :BLOCK] = nt[0]
                        wgt_g[BLOCK, :BLOCK, :BLOCK] = nw[0]
                    elif axis == 1:
                        sdf_g[:BLOCK, BLOCK, :BLOCK] = nt[:, 0]
                        wgt_g[:BLOCK, BLOCK, :BLOCK] = nw[:, 0]
                    else:
                        sdf_g[:BLOCK, :BLOCK, BLOCK] = nt[:, :, 0]
                        wgt_g[:BLOCK, :BLOCK, BLOCK] = nw[:, :, 0]
            base = np.ascontiguousarray(
                (np.asarray(key, np.float32) + 0.0) * BLOCK * self.voxel_size
                + 0.5 * self.voxel_size)
            ntri = _NATIVE.marching_tets_block(
                np.ascontiguousarray(sdf_g), np.ascontiguousarray(wgt_g),
                n1, base, self.voxel_size, min_weight, buf, max_tris)
            if ntri == 0:
                continue
            verts = buf[: ntri * 9].reshape(ntri * 3, 3).copy()
            faces = np.arange(ntri * 3).reshape(ntri, 3) + off
            vi = np.clip(((verts - base) / self.voxel_size).astype(np.int32),
                         0, BLOCK - 1)
            cols = self.colors[key][vi[:, 2], vi[:, 1], vi[:, 0]]
            all_v.append(verts)
            all_f.append(faces)
            all_c.append(cols)
            off += len(verts)
        if not all_v:
            return np.zeros((0, 3)), None, np.zeros((0, 3))
        return (np.concatenate(all_v), np.concatenate(all_f),
                np.concatenate(all_c))

    def extract_mesh(self, min_weight: float = 1.0):
        """Isosurface per block: native marching tetrahedra when the C++
        core is built, skimage marching cubes otherwise, point-cloud
        fallback last. Returns (verts, faces|None, cols)."""
        if _NATIVE is not None:
            return self._extract_native(min_weight)
        try:
            from skimage.measure import marching_cubes
            have_mc = True
        except ImportError:
            have_mc = False

        all_v, all_f, all_c = [], [], []
        off = 0
        for key, (tsdf, w) in self.blocks.items():
            base = np.asarray(key, np.float32) * BLOCK * self.voxel_size
            masked = np.where(w >= min_weight, tsdf, np.nan)
            if have_mc:
                vol = masked  # (z, y, x) layout from integrate
                if not (np.nanmin(vol) < 0 < np.nanmax(vol)):
                    continue
                try:
                    verts, faces, _, _ = marching_cubes(
                        np.nan_to_num(vol, nan=1.0), level=0.0)
                except Exception:
                    continue
                # verts are (z, y, x) voxel indices
                vw = (verts[:, ::-1] + 0.5) * self.voxel_size + base
                all_v.append(vw)
                all_f.append(faces + off)
                ci = np.clip(verts.astype(np.int32), 0, BLOCK - 1)
                all_c.append(self.colors[key][ci[:, 0], ci[:, 1], ci[:, 2]])
                off += len(vw)
            else:
                near = (np.abs(masked) < 0.5) & (w >= min_weight)
                zz, yy, xx = np.nonzero(near)
                vw = (np.stack([xx, yy, zz], -1) + 0.5) * self.voxel_size + base
                all_v.append(vw)
                all_c.append(self.colors[key][zz, yy, xx])
        if not all_v:
            return np.zeros((0, 3)), None, np.zeros((0, 3))
        verts = np.concatenate(all_v)
        cols = np.concatenate(all_c)
        faces = np.concatenate(all_f) if all_f and have_mc else None
        return verts, faces, cols

    def save_ply(self, path: str, min_weight: float = 1.0):
        verts, faces, cols = self.extract_mesh(min_weight)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(verts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
            if faces is not None:
                f.write(f"element face {len(faces)}\n")
                f.write("property list uchar int vertex_indices\n")
            f.write("end_header\n")
            for v, c in zip(verts, np.clip(cols * 255, 0, 255).astype(int)):
                f.write(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f} {c[0]} {c[1]} {c[2]}\n")
            if faces is not None:
                for fc in faces:
                    f.write(f"3 {fc[0]} {fc[1]} {fc[2]}\n")
        return len(verts)


def integrate_keyframes(depths, colors, K4, c2ws,
                        voxel_size: float = 0.02,
                        out_ply: Optional[str] = None) -> TSDFVolume:
    """tsdf_integrate.py:29-88 equivalent over rendered keyframes."""
    vol = TSDFVolume(voxel_size=voxel_size, trunc=4 * voxel_size)
    for i in range(len(depths)):
        vol.integrate(np.asarray(depths[i]),
                      np.asarray(colors[i]) if colors is not None else None,
                      np.asarray(K4), np.asarray(c2ws[i]))
    if out_ply:
        vol.save_ply(out_ply)
    return vol
