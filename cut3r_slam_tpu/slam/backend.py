"""Loop-closure tracking backend: detection, LC re-tracking, submap PGO.

Counterpart of /root/reference/hislam2/track_backend.py (TrackBackend).
Per call (track_backend.py:527-586): scan the recent keyframes for loop
candidates (covisible edges with temporal gap > 8), NMS-pick the best
match, re-run CUT3R on [matched submap's keyframes + current keyframe]
scale-aligned to the matched anchor, then optimize per-submap rigid SE(3)
corrections (first submap fixed) with Adam (lr 5e-4, ``loop_iters`` steps)
against two L1 objectives (:259-296):

* seam consistency: |last pointmap of submap b  −  first of submap b+1|
* loop consistency: |current pointmap (corrected) − LC-predicted pointmap|

then rigidly transform all submap pointmaps and poses (:300-358).

Repeat closures (track_backend.py:361-524) use the multi-loop PGO: every
previously closed loop keeps its re-predicted LC submap cloud; each cloud
gets a free SE3 (``matched_lie``) and three L1 objectives couple the
system — seam consistency, LC-cloud-to-matched-submap anchoring
(``matched_loss``), and current-pointmap-to-LC-cloud consistency.

TPU notes: each PGO runs as ONE jitted `lax.scan` over iterations; the
submap count is padded to a multiple of 8 (loop count to a multiple of 4)
with weight masks so recompiles only happen when the run crosses a
padding bucket.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.lie import se3_exp, se3_matrix, se3_from_matrix
from ..geometry.pointmap import pose_vec_to_matrix
from .keyframe import KeyframeStore, SUBMAP_SIZE
from .factor_graph import FactorGraph
from .frontend import TrackFrontend, submap_postprocess

__all__ = ["TrackBackend", "pgo_align"]


@partial(jax.jit, static_argnames=("iters",))
def pgo_align(submap_pts: jax.Array, seam_conf: jax.Array,
              pts_current: jax.Array, pts_current_lc: jax.Array,
              b_weight: jax.Array, iters: int = 2000, lr: float = 5e-4):
    """Per-submap SE3 PGO (track_backend.py:238-296).

    submap_pts: (B, S+1, h, w, 3) world pointmaps (slot S = overlap);
    seam_conf: (B, h, w) confidence mask of each submap's overlap row
    (loss between submap b's last slot and submap b+1's first slot);
    pts_current: (h, w, 3) the current KF pointmap in world;
    pts_current_lc: (h, w, 3) the same KF re-predicted in the matched
    submap's frame; b_weight: (B,) 1 for real submaps, 0 for padding.

    Returns xi (B, 6) with xi[0] = 0.
    """
    B = submap_pts.shape[0]
    first = submap_pts[:, 0].reshape(B, -1, 3)
    last = submap_pts[:, -1].reshape(B, -1, 3)
    conf = (seam_conf.reshape(B, -1) > 0).astype(jnp.float32)
    cur = pts_current.reshape(-1, 3)
    cur_lc = pts_current_lc.reshape(-1, 3)
    # weight of seam b: between submap b and b+1 — needs both real
    seam_w = b_weight[:-1] * b_weight[1:]
    last_real = jnp.int32(jnp.clip(b_weight.sum() - 1, 0, B - 1))

    def loss_fn(xi):
        xi_full = jnp.concatenate([jnp.zeros((1, 6)), xi], axis=0)
        T = se3_matrix(se3_exp(xi_full))  # (B, 4, 4)
        R = T[:, :3, :3]
        t = T[:, :3, 3]

        def apply(pts, b):  # pts (B?, N, 3)
            return jnp.einsum("bij,bnj->bni", R[b], pts) + t[b][:, None, :]

        idx = jnp.arange(B)
        last_a = apply(last, idx)
        first_a = apply(first, idx)
        seam = jnp.abs(last_a[:-1] - first_a[1:]).mean(-1)  # (B-1, N)
        fl_loss = (seam * conf[:-1] * seam_w[:, None]).sum() / \
            jnp.maximum((conf[:-1] * seam_w[:, None]).sum(), 1.0)

        cur_a = jnp.einsum("ij,nj->ni", R[last_real], cur) + t[last_real]
        lc_loss = jnp.abs(cur_a - cur_lc).mean()
        return fl_loss + lc_loss

    xi = jnp.zeros((B - 1, 6))
    m = jnp.zeros_like(xi)
    v = jnp.zeros_like(xi)

    def step(carry, i):
        xi, m, v = carry
        g = jax.grad(loss_fn)(xi)
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        mh = m / (1 - 0.9 ** (i + 1.0))
        vh = v / (1 - 0.999 ** (i + 1.0))
        xi = xi - lr * mh / (jnp.sqrt(vh) + 1e-8)
        return (xi, m, v), None

    (xi, _, _), _ = jax.lax.scan(step, (xi, m, v),
                                 jnp.arange(iters, dtype=jnp.float32))
    xi_full = jnp.concatenate([jnp.zeros((1, 6)), xi], axis=0)
    return xi_full


@partial(jax.jit, static_argnames=("iters",))
def pgo_align_multi(submap_pts: jax.Array, seam_conf: jax.Array,
                    b_weight: jax.Array, lc_fl: jax.Array,
                    cur_pts: jax.Array, cur_sub: jax.Array,
                    matched_sub: jax.Array, c_weight: jax.Array,
                    iters: int = 2000, lr: float = 5e-4):
    """Multi-loop PGO with matched-anchor terms (track_backend.py:361-524).

    submap_pts: (B, S+1, h, w, 3); seam_conf: (B, h, w); b_weight: (B,).
    lc_fl: (C, 2, h, w, 3) first/last slots of each closed loop's LC
    prediction cloud (in the matched submap's frame); cur_pts: (C, h, w, 3)
    each loop's current-KF pointmap in world; cur_sub/matched_sub: (C,)
    submap indices; c_weight: (C,) 1 for real loops.

    Optimizes xi (B-1, 6) submap corrections (first fixed) AND xi_lc (C, 6)
    free SE3s of the LC clouds. Returns (xi_full (B, 6), xi_lc (C, 6)).
    """
    B = submap_pts.shape[0]
    C = lc_fl.shape[0]
    first = submap_pts[:, 0].reshape(B, -1, 3)
    last = submap_pts[:, -1].reshape(B, -1, 3)
    conf = (seam_conf.reshape(B, -1) > 0).astype(jnp.float32)
    lc_first = lc_fl[:, 0].reshape(C, -1, 3)
    lc_last = lc_fl[:, 1].reshape(C, -1, 3)
    cur = cur_pts.reshape(C, -1, 3)
    seam_w = b_weight[:-1] * b_weight[1:]

    def loss_fn(params):
        xi, xi_lc = params
        xi_full = jnp.concatenate([jnp.zeros((1, 6)), xi], axis=0)
        T = se3_matrix(se3_exp(xi_full))
        R, t = T[:, :3, :3], T[:, :3, 3]
        Tl = se3_matrix(se3_exp(xi_lc))
        Rl, tl = Tl[:, :3, :3], Tl[:, :3, 3]

        last_a = jnp.einsum("bij,bnj->bni", R, last) + t[:, None, :]
        first_a = jnp.einsum("bij,bnj->bni", R, first) + t[:, None, :]
        seam = jnp.abs(last_a[:-1] - first_a[1:]).mean(-1)
        fl_loss = (seam * conf[:-1] * seam_w[:, None]).sum() / \
            jnp.maximum((conf[:-1] * seam_w[:, None]).sum(), 1.0)

        # LC clouds under their free transforms
        lc_first_a = jnp.einsum("cij,cnj->cni", Rl, lc_first) + tl[:, None, :]
        lc_last_a = jnp.einsum("cij,cnj->cni", Rl, lc_last) + tl[:, None, :]
        # matched anchor: LC first slot vs the matched submap's first map
        m_first = first_a[matched_sub]                      # (C, N, 3)
        matched_loss = (jnp.abs(lc_first_a - m_first).mean((-1, -2))
                        * c_weight).sum() / jnp.maximum(c_weight.sum(), 1.0)
        # current consistency: world current map (corrected) vs LC last slot
        cur_a = jnp.einsum("cij,cnj->cni", R[cur_sub], cur) \
            + t[cur_sub][:, None, :]
        lc_loss = (jnp.abs(cur_a - lc_last_a).mean((-1, -2))
                   * c_weight).sum() / jnp.maximum(c_weight.sum(), 1.0)
        return fl_loss + lc_loss + matched_loss

    params = (jnp.zeros((B - 1, 6)), jnp.zeros((C, 6)))
    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)

    def step(carry, i):
        params, m, v = carry
        g = jax.grad(loss_fn)(params)
        m = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, m, g)
        v = jax.tree.map(lambda a, b: 0.999 * a + 0.001 * b * b, v, g)
        bc1, bc2 = 1 - 0.9 ** (i + 1.0), 1 - 0.999 ** (i + 1.0)
        params = jax.tree.map(
            lambda p, mm, vv: p - lr * (mm / bc1)
            / (jnp.sqrt(vv / bc2) + 1e-8), params, m, v)
        return (params, m, v), None

    (params, _, _), _ = jax.lax.scan(step, (params, m, v),
                                     jnp.arange(iters, dtype=jnp.float32))
    xi, xi_lc = params
    xi_full = jnp.concatenate([jnp.zeros((1, 6)), xi], axis=0)
    return xi_full, xi_lc


@jax.jit
def _apply_pgo(submap_pts: jax.Array, xi: jax.Array):
    """Rigidly transform all submap pointmaps by their corrections."""
    T = se3_matrix(se3_exp(xi))
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    out = jnp.einsum("bij,bshwj->bshwi", R, submap_pts) \
        + t[:, None, None, None, :]
    return out, T


class TrackBackend:
    def __init__(self, frontend: TrackFrontend, keyframes: KeyframeStore,
                 graph: FactorGraph, loop_iters: int = 2000,
                 loop_gap: int = 8, nms_thresh: float = 0.4,
                 freeze_after: int = 20):
        self.fe = frontend
        self.kf = keyframes
        self.graph = graph
        self.loop_iters = loop_iters
        self.loop_gap = loop_gap
        self.nms_thresh = nms_thresh
        self.freeze_counter = 0
        self.freeze_after = freeze_after
        self.closed: List[int] = []
        # closed-loop history for repeat closures (track_backend.py:371-388):
        # per loop, the matched/current KF indices and the LC prediction
        # cloud's first+last slots (2, h, w, 3) kept in world-consistent form
        self.closed_loop: Dict[str, List] = {
            "idx_current": [], "idx_matched": [], "lc_fl": []}

    # ------------------------------------------------------------------
    def lc_track(self, matched_idx: int, current_idx: int):
        """Re-run CUT3R on [matched submap KFs + current] (:137-217).

        Returns the current KF's pointmap predicted in the matched
        submap's (world-aligned) frame, at half resolution.
        """
        sub_m = matched_idx // SUBMAP_SIZE
        t0 = sub_m * SUBMAP_SIZE
        kf = self.kf
        idxs = list(range(t0, t0 + SUBMAP_SIZE)) + [current_idx]
        # decode from the stored encoder tokens (every KF carries its
        # featI from the motion filter; no encoder re-pass). In GT-
        # injection test mode this dispatches to the GT stand-in too.
        pts_self, conf_self, c2w = self.fe.infer_views(idxs)
        anchor_c2w = jnp.asarray(pose_vec_to_matrix(jnp.asarray(kf.pose[t0])))
        prev_depth0 = jnp.asarray(kf.depth[t0])
        poses, depths, pts_world, pts_ds, conf, conf_ds = submap_postprocess(
            pts_self, conf_self, c2w, anchor_c2w, prev_depth0,
            init=False, ds=self.fe.ds)
        return pts_ds, conf_ds

    # ------------------------------------------------------------------
    def loop_closure(self, matched_idx: int, current_idx: int
                     ) -> Dict[str, np.ndarray]:
        """PGO over submaps [0, current submap]; returns the LC packet.

        First closure follows loop_closure_init (track_backend.py:220-358);
        repeat closures use the multi-loop PGO with matched-anchor terms
        and free per-loop LC-cloud transforms (:361-524)."""
        kf = self.kf
        lc_pts_all, conf_lc = self.lc_track(matched_idx, current_idx)
        sub_cur = current_idx // SUBMAP_SIZE
        B = sub_cur + 1
        # pad bucket, clamped to the store's preallocated submap count
        Bp = min(((B + 7) // 8) * 8, kf.submap_pts.shape[0])

        submap_pts = kf.submap_pts[:Bp]
        seam_conf = kf.submap_conf[:Bp, -1]
        pts_current = kf.submap_pts[sub_cur, current_idx % SUBMAP_SIZE]
        b_weight = jnp.asarray(
            (np.arange(Bp) < B).astype(np.float32))

        lc_fl_new = jnp.stack([lc_pts_all[0], lc_pts_all[-1]])  # (2, h, w, 3)
        if not self.closed_loop["idx_current"]:
            xi = pgo_align(submap_pts, seam_conf, pts_current,
                           lc_pts_all[-1], b_weight, iters=self.loop_iters)
            xi_lc = jnp.zeros((1, 6))
            lc_fls = lc_fl_new[None]
        else:
            # assemble loop history (+ new loop) padded to a bucket of 4
            idx_cur_all = self.closed_loop["idx_current"] + [current_idx]
            idx_m_all = self.closed_loop["idx_matched"] + [matched_idx]
            lc_fls = jnp.stack(self.closed_loop["lc_fl"] + [lc_fl_new])
            C = len(idx_cur_all)
            Cp = ((C + 3) // 4) * 4
            pad = Cp - C
            if pad:
                lc_fls = jnp.concatenate(
                    [lc_fls, jnp.zeros((pad,) + lc_fls.shape[1:])])
            cur_sub = np.minimum(
                np.asarray(idx_cur_all + [0] * pad) // SUBMAP_SIZE, B - 1)
            matched_sub = np.minimum(
                np.asarray(idx_m_all + [0] * pad) // SUBMAP_SIZE, B - 1)
            cur_pts = kf.submap_pts[jnp.asarray(cur_sub),
                                    jnp.asarray(np.asarray(
                                        idx_cur_all + [0] * pad)
                                        % SUBMAP_SIZE)]
            c_weight = jnp.asarray((np.arange(Cp) < C).astype(np.float32))
            xi, xi_lc = pgo_align_multi(
                submap_pts, seam_conf, b_weight, lc_fls, cur_pts,
                jnp.asarray(cur_sub, jnp.int32),
                jnp.asarray(matched_sub, jnp.int32), c_weight,
                iters=self.loop_iters)
            lc_fls = lc_fls[:C]
            xi_lc = xi_lc[:C]
        new_pts, T = _apply_pgo(submap_pts, xi)

        # keep the LC clouds world-consistent for the next closure
        # (track_backend.py:506-510): apply each cloud's free transform
        Tl = se3_matrix(se3_exp(xi_lc))
        lc_fls_new = jnp.einsum("cij,cfhwj->cfhwi", Tl[:, :3, :3], lc_fls) \
            + Tl[:, :3, 3][:, None, None, None, :]
        self.closed_loop["idx_current"].append(current_idx)
        self.closed_loop["idx_matched"].append(matched_idx)
        self.closed_loop["lc_fl"] = [lc_fls_new[i]
                                     for i in range(lc_fls_new.shape[0])]

        # writeback: pointmaps + poses (:300-358)
        kf.submap_pts = kf.submap_pts.at[:Bp].set(new_pts)
        Tn = np.asarray(T)
        n_kf = min(kf.count, B * SUBMAP_SIZE + 1)
        cam_idx = list(range(0, n_kf))
        # one batched pose correction for all affected keyframes
        bsel_kf = np.minimum(np.arange(n_kf) // SUBMAP_SIZE, B - 1)
        c2w_kf = jax.vmap(pose_vec_to_matrix)(jnp.asarray(kf.pose[:n_kf]))
        T_new = jnp.asarray(Tn[bsel_kf]) @ c2w_kf
        new_poses_arr = np.asarray(jax.vmap(se3_from_matrix)(T_new))
        kf.pose[:n_kf] = new_poses_arr
        new_poses = [new_poses_arr[i].copy() for i in range(n_kf)]
        # per-KF half-res pointmaps buffer for the factor graph: one
        # vectorized gather/transform over all affected keyframes
        ci = np.asarray(cam_idx, np.int64)
        bsel = np.minimum(ci // SUBMAP_SIZE, B - 1)
        Rb = jnp.asarray(Tn[bsel, :3, :3])            # (n, 3, 3)
        tb = jnp.asarray(Tn[bsel, :3, 3])             # (n, 3)
        moved = jnp.einsum("nij,nhwj->nhwi", Rb, kf.pts_ds[jnp.asarray(ci)]) \
            + tb[:, None, None, :]
        kf.pts_ds = kf.pts_ds.at[jnp.asarray(ci)].set(moved)

        self.closed.append(current_idx)
        xi_np = np.asarray(xi[:B])
        pose_updates = np.asarray(se3_from_matrix(jnp.asarray(Tn[:B])))
        return {
            "pose_updates": pose_updates,          # (B, 7) [t, q xyzw]
            "submap_idx": np.arange(B),
            "camera_idx": np.asarray(cam_idx),
            "camera_pose": np.stack(new_poses),
        }

    # ------------------------------------------------------------------
    def run(self, t1: int) -> Optional[Dict[str, np.ndarray]]:
        """Scan recent KFs for loops (track_backend.py:527-586)."""
        if self.freeze_counter > 0:
            self.freeze_counter -= 1
            return None
        kf = self.kf
        K4 = kf.intrinsic[0] / self.fe.ds
        for i in range(max(t1 - 6, SUBMAP_SIZE + 1), t1 - 1):
            cand = self.graph.detect_loop(i, temporal_window=self.loop_gap)
            if cand is None:
                continue
            cand = cand[cand < i - self.loop_gap]
            if len(cand) == 0:
                continue
            c2w_all = np.asarray(jax.vmap(pose_vec_to_matrix)(
                jnp.asarray(kf.pose)))
            pick = self.graph.nms(cand, i, c2w_all, kf.pts_ds, kf.featI,
                                  K4, th=self.nms_thresh)
            if pick is None:
                continue
            updates = self.loop_closure(int(pick), i)
            self.freeze_counter = self.freeze_after
            return updates
        return None
