"""Tracking frontend: lazy-batched CUT3R submap tracking.

Counterpart of /root/reference/hislam2/track_frontend.py. Behavior:

* waits until >= SUBMAP_SIZE new keyframes, then runs CUT3R jointly on
  KFs [t0-1, t1) — a 1-frame overlap with the previous submap
  (track_frontend.py:285-330);
* predictions are made first-frame-relative (``first_w2c @ pose``), the
  new submap is scale-aligned to the previous one via the mean log-depth
  ratio on the shared overlap frame, pointmaps are rotated into world
  frame, and the downsampled submap pointmaps/confidences/poses/depths are
  written back (:166-282);
* covisibility edges are added per keyframe via reprojection overlap.

TPU design: the CUT3R inference always runs at the fixed shape
(V = SUBMAP_SIZE + 1) — shorter terminate-time batches are padded — and
the whole post-processing (pose composition, scale alignment, pointmap
rotation, downsampling) is one jitted program; only tiny pose vectors
cross back to the host.

Note: the reference's far-frame bidirectional overlap test projects
half-res pointmaps with full-res intrinsics (factor_graph.py:289-315),
undercounting the reverse overlap ~4x; we use consistently scaled
intrinsics instead (strictly more permissive edge proposals; the NMS gate
downstream is unchanged).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.lie import se3_from_matrix
from ..geometry.pointmap import geotrf, pose_vec_to_matrix
from ..models import CUT3R, normalize_images
from .keyframe import KeyframeStore, SUBMAP_SIZE
from .factor_graph import FactorGraph

__all__ = ["TrackFrontend", "submap_postprocess"]


def conf_remap(conf: jax.Array) -> jax.Array:
    """conf in (1, inf) -> (0, 1): 1 - 1/conf (track_frontend.py:193)."""
    return 1.0 - 1.0 / conf


@partial(jax.jit, static_argnames=("init", "ds"))
def submap_postprocess(pred_pts_self, pred_conf_self, pred_pose_c2w,
                       anchor_c2w, prev_depth0, init: bool, ds: int = 2):
    """World-align one tracked submap (track_frontend.py:180-243).

    pred_pts_self: (V, H, W, 3) pts3d_in_self_view; pred_conf_self (V, H, W);
    pred_pose_c2w: (V, 4, 4) model-frame c2w; anchor_c2w: (4, 4) stored c2w
    of the overlap KF (identity for init); prev_depth0: (H, W) stored depth
    of the overlap KF (unused for init).

    Returns (poses_c2w (V,4,4), depths (V,H,W), pts_world (V,H,W,3),
             pts_ds, conf (V,H,W), conf_ds).
    """
    first_w2c = jnp.linalg.inv(pred_pose_c2w[0])
    rel = jnp.einsum("ij,vjk->vik", first_w2c, pred_pose_c2w)  # (V,4,4)
    conf = conf_remap(pred_conf_self)
    depths = pred_pts_self[..., 2]

    if init:
        s = jnp.float32(1.0)
        align_R = jnp.eye(3)
        align_t = jnp.zeros(3)
    else:
        new_depth0 = depths[0]
        log_scale = jnp.mean(jnp.log(jnp.maximum(prev_depth0, 1e-8))
                             - jnp.log(jnp.maximum(new_depth0, 1e-8)))
        s = jnp.exp(log_scale)
        align_R = anchor_c2w[:3, :3]
        align_t = anchor_c2w[:3, 3]

    R = jnp.einsum("ij,vjk->vik", align_R, rel[:, :3, :3])
    T = jnp.einsum("ij,vj->vi", align_R, s * rel[:, :3, 3]) + align_t
    poses = jnp.broadcast_to(jnp.eye(4), rel.shape).at[:, :3, :3].set(R)
    poses = poses.at[:, :3, 3].set(T)

    pts_world = geotrf(poses[:, None, None], s * pred_pts_self)
    depths = s * depths
    pts_ds = pts_world[:, ::ds, ::ds]
    conf_ds = conf[:, ::ds, ::ds]
    return poses, depths, pts_world, pts_ds, conf, conf_ds


class TrackFrontend:
    def __init__(self, model: CUT3R, params, keyframes: KeyframeStore,
                 graph: Optional[FactorGraph] = None, warmup: int = 6,
                 downsample: int = 2, backend_min_kf: int = 10):
        assert warmup == SUBMAP_SIZE + 1, \
            "warmup must equal submap size + 1 (the overlap design)"
        self.model = model
        self.params = params
        self.keyframes = keyframes
        self.graph = graph or FactorGraph()
        self.warmup = warmup
        self.ds = downsample
        self.backend_min_kf = backend_min_kf
        self.is_initialized = False
        self.t1 = 0
        self.V = SUBMAP_SIZE + 1

        H, W = keyframes.img_hw
        p16 = model.cfg.patch_size

        @jax.jit
        def _infer(params, feat):
            """feat: (V, N, enc_dim) STORED encoder tokens -> submap
            predictions. The motion filter already ran the ViT-L encoder
            for every keyframe (kf.featI = encode_image output, the same
            tokens _encode_views produces) — the submap step decodes
            straight from them, skipping the 6-view encoder re-pass the
            reference performs (track_frontend.py:166's full inference).
            Only the self-pointmap + pose heads run (prepare_output
            use_pose=True consumes nothing else)."""
            from ..models.patch_embed import patch_positions
            V = feat.shape[0]
            pos = patch_positions(V, H // p16, W // p16)
            out, _ = model.apply(params, feat[:, None], pos[:, None],
                                 H, W, None, jnp.int32(0),
                                 method=CUT3R.decode_views,
                                 head_outputs=("self", "pose"))
            pose = out["camera_pose"][:, 0]  # (V, 7) wxyz
            from ..geometry.quaternion import wxyz_to_xyzw, quat_to_matrix
            q = wxyz_to_xyzw(pose[:, 3:7])
            c2w = jnp.broadcast_to(jnp.eye(4), (pose.shape[0], 4, 4))
            c2w = c2w.at[:, :3, :3].set(quat_to_matrix(q))
            c2w = c2w.at[:, :3, 3].set(pose[:, :3])
            return (out["pts3d_in_self_view"][:, 0],
                    out["conf_self"][:, 0], c2w)

        self._infer = _infer
        self.gt_inject = None  # GT-injection test mode (set_gt_injection)

    # ------------------------------------------------------------------
    def set_gt_injection(self, provider, sigma_t: float = 0.05,
                         sigma_r: float = 0.01, seed: int = 0):
        """GT-injection test mode (reference TrackFrontend.test,
        track_frontend.py:333-405): ``provider(tstamp) -> (depth (H,W),
        c2w (4,4))``. Network inference is replaced by pointmaps
        synthesized from GT depth and submap-relative GT poses perturbed
        by ``perturb_pose`` noise (sigma_trans=0.05, sigma_rot=0.01,
        :408-421); the submap anchor view stays unperturbed."""
        self.gt_inject = provider
        self._gt_rng = np.random.default_rng(seed)
        self._gt_sig = (float(sigma_t), float(sigma_r))

    def _gt_infer(self, idxs):
        from ..geometry.pointmap import depth_to_pointmap
        from ..geometry.lie import se3_exp, se3_matrix
        kf = self.keyframes
        d0, c2w0 = self.gt_inject(int(kf.tstamp[idxs[0]]))
        inv0 = np.linalg.inv(np.asarray(c2w0, np.float64))
        pts, confs, rels = [], [], []
        st, sr = self._gt_sig
        for k, i in enumerate(idxs):
            depth, c2w = self.gt_inject(int(kf.tstamp[i]))
            K4 = kf.intrinsic[i]
            pts.append(depth_to_pointmap(jnp.asarray(depth, jnp.float32),
                                         jnp.asarray(K4, jnp.float32)))
            rel = inv0 @ np.asarray(c2w, np.float64)
            if k > 0 and (st > 0 or sr > 0):
                xi = np.concatenate([
                    self._gt_rng.normal(0, st, 3),
                    self._gt_rng.normal(0, sr, 3)]).astype(np.float32)
                rel = np.asarray(se3_matrix(se3_exp(jnp.asarray(xi)))) @ rel
            rels.append(rel.astype(np.float32))
        H, W = kf.img_hw
        conf = jnp.full((len(idxs), H, W), 9.0, jnp.float32)  # 1-1/c=.89
        return (jnp.stack(pts), conf,
                jnp.asarray(np.stack(rels), jnp.float32))

    def infer_views(self, idxs):
        """(pts_self, conf_self, submap-relative c2w) for KF indices
        ``idxs`` (length V). Dispatches to the jitted decode or the
        GT-injection stand-in."""
        if self.gt_inject is not None:
            return self._gt_infer(idxs)
        feat = self.keyframes.featI[jnp.asarray(np.asarray(idxs))]
        return self._infer(self.params, feat)

    # ------------------------------------------------------------------
    def track(self, t0: int, t1: int, init: bool = False):
        """Track keyframes [t0, t1); t1 - t0 <= V (padded to V)."""
        kf = self.keyframes
        n = t1 - t0
        assert 1 < n <= self.V
        # pad with the last KF repeated; its outputs are ignored
        idxs = list(range(t0, t1)) + [t1 - 1] * (self.V - n)

        pts_self, conf_self, c2w = self.infer_views(idxs)

        anchor_c2w = jnp.asarray(pose_vec_to_matrix(jnp.asarray(kf.pose[t0])))
        prev_depth0 = jnp.asarray(kf.depth[t0])
        poses, depths, pts_world, pts_ds, conf, conf_ds = submap_postprocess(
            pts_self, conf_self, c2w, anchor_c2w, prev_depth0,
            init=init, ds=self.ds)

        # ---- writeback (host metadata + device submap buffers) ----
        sub = t0 // SUBMAP_SIZE
        pose_vecs = np.asarray(se3_from_matrix(poses))  # [t, q xyzw]
        kf.pose[t0:t1] = pose_vecs[:n]
        kf.depth[t0:t1] = np.asarray(depths[:n])
        kf.set_submap(sub, pts_ds[:n], conf_ds[:n],
                      slot0=0)
        # per-KF half-res pointmaps for the factor graph
        kf.pts_ds = jax.lax.dynamic_update_slice(
            kf.pts_ds, pts_ds[:n], (t0, 0, 0, 0))

        # ---- covisibility graph ----
        if init:
            self.graph.add_neighborhood_factors(0, min(3, t1), r=3)
        K4 = kf.intrinsic.copy() / self.ds  # scaled intrinsics
        c2w_all = pose_vec_to_matrix_np(kf.pose)
        for i in range(t0, t1):
            if not init:
                self.graph.add_neighborhood_factors(max(i - 3, 0), i + 1, r=3)
            if i > 2:
                self.graph.add(i, c2w_all, kf.pts_ds, K4=K4[i],
                               valid_count=i + 1)
        return poses

    # ------------------------------------------------------------------
    def run(self, tstamp: int, last_frame: bool = False
            ) -> Tuple[bool, Optional[range], Optional[int]]:
        """Per-frame trigger (track_frontend.py:285-330).

        Returns (run_backend, new_kf_range, submap_idx).
        """
        kf = self.keyframes
        if not self.is_initialized and kf.count - 1 == self.warmup:
            t1 = kf.count - 1
            self.track(0, t1, init=True)
            self.is_initialized = True
            self.t1 = t1
            return False, range(0, t1), 0

        if self.is_initialized and self.t1 < kf.count - SUBMAP_SIZE:
            t0 = self.t1 - 1
            t1 = kf.count - 1
            self.track(t0, t1)
            self.t1 = t1
            return (t1 > self.backend_min_kf), range(t0, t1), t0 // SUBMAP_SIZE

        if last_frame and self.is_initialized and kf.count - 1 > self.t1:
            t0 = self.t1 - 1
            t1 = kf.count - 1
            self.track(t0, t1)
            self.t1 = t1
            return False, range(t0, t1), t0 // SUBMAP_SIZE

        return False, None, None


def pose_vec_to_matrix_np(pose_vecs: np.ndarray) -> np.ndarray:
    """Host-side [t, q xyzw] -> (N, 4, 4) without a device round trip."""
    from scipy.spatial.transform import Rotation
    out = np.tile(np.eye(4, dtype=np.float32), (len(pose_vecs), 1, 1))
    q = pose_vecs[:, 3:7]
    norms = np.linalg.norm(q, axis=1, keepdims=True)
    q = np.where(norms > 1e-8, q / np.maximum(norms, 1e-8),
                 np.array([0, 0, 0, 1.0], np.float32))
    out[:, :3, :3] = Rotation.from_quat(q).as_matrix()
    out[:, :3, 3] = pose_vecs[:, :3]
    return out
