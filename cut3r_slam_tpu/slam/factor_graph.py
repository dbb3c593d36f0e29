"""Covisibility factor graph + loop detection.

Counterpart of /root/reference/hislam2/factor_graph.py. The edge list is
small host-side state; the expensive parts — batched pointmap reprojection
overlap (factor_graph.py:255-315) and patch-feature similarity — are
jitted kernels that always run over the FULL fixed-capacity keyframe
buffers with validity masks, so the compiled program count stays constant
over the run (no per-call shape churn).

Semantics preserved:
* `add`: near frames (center distance <= 1.0) need one-directional
  reprojection overlap > 0.3; far frames use a bidirectional test
  (factor_graph.py:148-197); edges are added in both directions.
* `detect_loop`: covisible edges with temporal gap > 8 (:503-559).
* `NMS`: score = 0.8 * mean bidirectional overlap + 0.2 * feature
  similarity, accept > 0.4 (:561-582).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["FactorGraph"]


@partial(jax.jit, static_argnames=("bidir",))
def _overlap_to_all(pointmap: jax.Array, c2w_all: jax.Array,
                    K4: jax.Array, bidir_pts: jax.Array,
                    cur_w2c: jax.Array, bidir: bool = True):
    """Reprojection overlap of one pointmap into all KF cameras (+reverse).

    pointmap: (h, w, 3) world points of the current KF;
    c2w_all: (C, 4, 4); K4: [fx, fy, cx, cy] (already scaled to (h, w));
    bidir_pts: (C, h, w, 3) world pointmaps of all KFs;
    cur_w2c: (4, 4) current camera world-to-cam.

    Returns (fwd (C,), rev (C,)): fraction of pixels landing in-frame.
    """
    h, w = pointmap.shape[:2]
    fx, fy, cx, cy = K4[0], K4[1], K4[2], K4[3]
    pts = pointmap.reshape(-1, 3)

    w2c = jnp.linalg.inv(c2w_all)  # (C, 4, 4)
    p = jnp.einsum("cij,nj->cni", w2c[:, :3, :3], pts) + w2c[:, None, :3, 3]
    z = jnp.maximum(p[..., 2], 1e-5)
    u = fx * p[..., 0] / z + cx
    v = fy * p[..., 1] / z + cy
    valid = ((u >= 0) & (u < w) & (v >= 0) & (v < h) & (p[..., 2] > 0))
    fwd = valid.mean(axis=1)

    if not bidir:
        return fwd, fwd
    q = jnp.einsum("ij,cnj->cni", cur_w2c[:3, :3],
                   bidir_pts.reshape(bidir_pts.shape[0], -1, 3)) + cur_w2c[:3, 3]
    zq = jnp.maximum(q[..., 2], 1e-5)
    uq = fx * q[..., 0] / zq + cx
    vq = fy * q[..., 1] / zq + cy
    validq = ((uq >= 0) & (uq < w) & (vq >= 0) & (vq < h) & (q[..., 2] > 0))
    rev = validq.mean(axis=1)
    return fwd, rev


@jax.jit
def _feat_sim_to_all(feat: jax.Array, feat_all: jax.Array,
                     threshold: float = 0.7) -> jax.Array:
    """Patch-feature match ratio of `feat` vs every KF (skip token 0)."""
    f0 = feat[1:]
    f0 = f0 / jnp.maximum(jnp.linalg.norm(f0, axis=1, keepdims=True), 1e-12)
    fa = feat_all[:, 1:]
    fa = fa / jnp.maximum(jnp.linalg.norm(fa, axis=2, keepdims=True), 1e-12)
    sim = jnp.einsum("nd,cmd->cnm", f0, fa)
    max_sim = sim.max(axis=2)  # (C, N)
    return (max_sim > threshold).astype(jnp.float32).mean(axis=1)


class FactorGraph:
    def __init__(self, max_edges: int = 4096, near_dist: float = 1.0,
                 overlap_thresh: float = 0.3):
        self.max_edges = max_edges
        self.near_dist = near_dist
        self.overlap_thresh = overlap_thresh
        self.ii = np.zeros(0, np.int64)
        self.jj = np.zeros(0, np.int64)
        self.age = np.zeros(0, np.int64)

    # ------------------------------------------------------------------
    def add_factors(self, ii, jj):
        """Append edges, dropping duplicates (factor_graph.py:59-117)."""
        ii = np.atleast_1d(np.asarray(ii, np.int64)).reshape(-1)
        jj = np.atleast_1d(np.asarray(jj, np.int64)).reshape(-1)
        existing = set(zip(self.ii.tolist(), self.jj.tolist()))
        keep = []
        for k in range(len(ii)):
            e = (int(ii[k]), int(jj[k]))
            if e not in existing and e[0] != e[1]:
                existing.add(e)
                keep.append(k)
        if not keep:
            return
        ii, jj = ii[keep], jj[keep]
        self.ii = np.concatenate([self.ii, ii])[-self.max_edges:]
        self.jj = np.concatenate([self.jj, jj])[-self.max_edges:]
        self.age = np.concatenate([self.age, np.zeros(len(ii), np.int64)])[-self.max_edges:]

    def add_neighborhood_factors(self, t0: int, t1: int, r: int = 3):
        idx = np.arange(t0, t1)
        ii, jj = np.meshgrid(idx, idx, indexing="ij")
        m = (np.abs(ii - jj) <= r) & (ii != jj)
        self.add_factors(ii[m], jj[m])

    # ------------------------------------------------------------------
    def add(self, current_idx: int, c2w_all: np.ndarray, pts_all,
            feat=None, K4=None, valid_count: Optional[int] = None):
        """Covisibility edges for the newest KF (factor_graph.py:148-197).

        c2w_all: (C, 4, 4) poses buffer; pts_all: (C, h, w, 3) device
        pointmaps buffer; K4 scaled to (h, w). Only the first
        ``valid_count`` entries are real.
        """
        n = valid_count if valid_count is not None else current_idx + 1
        cur_c2w = c2w_all[current_idx]
        cur_w2c = np.linalg.inv(cur_c2w)
        fwd, rev = _overlap_to_all(
            pts_all[current_idx], jnp.asarray(c2w_all),
            jnp.asarray(K4, jnp.float32), pts_all, jnp.asarray(cur_w2c))
        fwd = np.asarray(fwd)
        rev = np.asarray(rev)

        centers = c2w_all[:n, :3, 3]
        dists = np.linalg.norm(centers - cur_c2w[:3, 3], axis=1)
        idx = np.arange(n)
        near = dists <= self.near_dist
        sel = np.zeros(n, bool)
        sel[near] = fwd[:n][near] > self.overlap_thresh
        far = ~near
        sel[far] = (fwd[:n][far] > self.overlap_thresh) | \
                   (rev[:n][far] > self.overlap_thresh)
        sel[current_idx] = False
        jj = idx[sel]
        if len(jj):
            ii = np.full_like(jj, current_idx)
            self.add_factors(ii, jj)
            self.add_factors(jj, ii)
        self.age += 1
        return jj

    # ------------------------------------------------------------------
    def detect_loop(self, current_idx: int, temporal_window: int = 8):
        """Covisible frames temporally > window away (factor_graph.py:503)."""
        covis = self.jj[self.ii == current_idx]
        cand = np.unique(covis[np.abs(covis - current_idx) > temporal_window])
        return cand if len(cand) else None

    def nms(self, cand: np.ndarray, current_idx: int, c2w_all: np.ndarray,
            pts_all, feat_all, K4, th: float = 0.4) -> Optional[int]:
        """Pick the best loop candidate (factor_graph.py:561-582)."""
        cur_w2c = np.linalg.inv(c2w_all[current_idx])
        fwd, rev = _overlap_to_all(
            pts_all[current_idx], jnp.asarray(c2w_all),
            jnp.asarray(K4, jnp.float32), pts_all, jnp.asarray(cur_w2c))
        feat_sim = np.asarray(_feat_sim_to_all(feat_all[current_idx], feat_all))
        overlap = (np.asarray(fwd) + np.asarray(rev)) / 2
        scores = 0.8 * overlap[cand] + 0.2 * feat_sim[cand]
        if scores.max() > th:
            return int(cand[int(np.argmax(scores))])
        return None
