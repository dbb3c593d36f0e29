"""Training losses for CUT3R: Regr3DPose + ConfLoss + RGB.

JAX counterparts of /root/reference/src/dust3r/losses.py (Regr3DPose :287,
ConfLoss :1047, RGBLoss): anchor-view-0 pointmap regression with average-
distance normalization of both prediction and ground truth, confidence
weighting ``conf * l - alpha * log(conf)``, and pose translation/rotation
terms. Written as pure functions over stacked view tensors (V, B, ...)
so the whole loss jits into the training step.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..geometry.quaternion import wxyz_to_xyzw
from ..geometry.pointmap import geotrf

__all__ = ["regr3d_pose_loss", "conf_loss", "rgb_loss", "cut3r_total_loss",
           "depth_scale_shift_inv_loss", "scale_inv_loss",
           "regr3d_pose_batchlist_loss", "cut3r_batchlist_total_loss",
           "find_opt_scaling"]


def _avg_dis_norm(pts: jax.Array, valid: jax.Array, eps: float = 1e-8):
    """Average-distance normalization factor (losses.py normalize_pointcloud
    'avg_dis' mode): mean norm over valid points, per batch element.

    pts: (V, B, H, W, 3); valid: (V, B, H, W). Returns (B,) factor.
    """
    dis = jnp.linalg.norm(pts, axis=-1)
    m = valid.astype(pts.dtype)
    tot = jnp.sum(dis * m, axis=(0, 2, 3))
    cnt = jnp.maximum(jnp.sum(m, axis=(0, 2, 3)), 1.0)
    return jnp.maximum(tot / cnt, eps)


def regr3d_pose_loss(pred: Dict[str, jax.Array], gt: Dict[str, jax.Array],
                     ) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Per-pixel regression distances for self & cross pointmaps + pose terms.

    pred: dict with pts3d_in_self_view / pts3d_in_other_view (V,B,H,W,3)
          and camera_pose (V,B,7 wxyz).
    gt:   dict with pts3d (V,B,H,W,3) world frame, camera_pose (V,B,4,4)
          c2w matrices, valid_mask (V,B,H,W).

    Returns (l_self, l_cross, aux) where l_* are (V,B,H,W) distances after
    normalization and aux holds pose losses.
    """
    c2w = gt["camera_pose"]  # (V, B, 4, 4)
    w2c = jnp.linalg.inv(c2w)
    in_cam0 = jnp.linalg.inv(c2w[0])  # (B, 4, 4) anchor view
    # gt in each view's own camera / in anchor camera
    gt_self = geotrf(w2c[:, :, None, None], gt["pts3d"])
    gt_cross = geotrf(in_cam0[None, :, None, None], gt["pts3d"])
    valid = gt["valid_mask"]

    pr_self = pred["pts3d_in_self_view"]
    pr_cross = pred["pts3d_in_other_view"]

    # normalize both point clouds by their own avg distance (norm_mode=avg_dis
    # over the self+cross concatenation, losses.py:319-332)
    pr_all = jnp.concatenate([pr_self, pr_cross], axis=2)
    gt_all = jnp.concatenate([gt_self, gt_cross], axis=2)
    valid2 = jnp.concatenate([valid, valid], axis=2)
    nf_pr = _avg_dis_norm(pr_all, valid2)[None, :, None, None, None]
    nf_gt = _avg_dis_norm(gt_all, valid2)[None, :, None, None, None]

    l_self = jnp.linalg.norm(pr_self / nf_pr - gt_self / nf_gt, axis=-1)
    l_cross = jnp.linalg.norm(pr_cross / nf_pr - gt_cross / nf_gt, axis=-1)

    # pose terms: predicted c2w (in anchor frame) vs gt relative pose
    gt_rel = jnp.einsum("bij,vbjk->vbik", in_cam0, c2w)  # anchor-relative c2w
    gt_t = gt_rel[..., :3, 3]
    pr_t = pred["camera_pose"][..., :3]
    nf_gt_t = jnp.maximum(jnp.linalg.norm(gt_t, axis=-1).mean(0), 1e-8)
    nf_pr_t = jnp.maximum(jnp.linalg.norm(pr_t, axis=-1).mean(0), 1e-8)
    l_trans = jnp.linalg.norm(pr_t / nf_pr_t[None, :, None]
                              - gt_t / nf_gt_t[None, :, None], axis=-1)

    # quaternion distance: 1 - |<q_pred, q_gt>|
    from ..geometry.quaternion import matrix_to_quat
    q_gt = matrix_to_quat(gt_rel[..., :3, :3])
    q_pr = wxyz_to_xyzw(pred["camera_pose"][..., 3:7])
    l_quat = 1.0 - jnp.abs(jnp.sum(q_gt * q_pr, axis=-1))

    aux = {"loss_trans": l_trans.mean(), "loss_quat": l_quat.mean()}
    return l_self, l_cross, aux


def conf_loss(l: jax.Array, conf: jax.Array, valid: jax.Array,
              alpha: float = 0.2) -> jax.Array:
    """ConfLoss (losses.py:1047): mean over valid of conf*l - alpha*log(conf).

    conf is the activated confidence (>1); log(conf) >= 0.
    """
    log_conf = jnp.log(conf)
    per_pix = conf * l - alpha * log_conf
    m = valid.astype(l.dtype)
    return jnp.sum(per_pix * m) / jnp.maximum(jnp.sum(m), 1.0)


def rgb_loss(pred_rgb: jax.Array, gt_img: jax.Array, valid: jax.Array) -> jax.Array:
    m = valid.astype(pred_rgb.dtype)[..., None]
    return jnp.sum(jnp.abs(pred_rgb - gt_img) * m) / jnp.maximum(jnp.sum(m) * 3, 1.0)


def depth_scale_shift_inv_loss(pred_z: jax.Array, gt_z: jax.Array,
                               mask: jax.Array) -> jax.Array:
    """Scale- AND shift-invariant depth L1
    (losses.py:221-254 DepthScaleShiftInvLoss).

    pred_z/gt_z: (..., H, W) depth maps; mask: (..., H, W) bool. Each
    leading-index map is normalized independently: shift = masked mean,
    scale = masked mean |x - shift| (clamped 1e-6), then
    |pred_n - gt_n| on masked pixels. Returns the per-pixel masked
    distance map (zeros off-mask) — reduce with `masked_mean`.
    """
    m = mask.astype(pred_z.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=(-2, -1), keepdims=True), 1.0)

    def _norm(x):
        shift = jnp.sum(x * m, axis=(-2, -1), keepdims=True) / cnt
        cen = x - shift
        scale = jnp.sum(jnp.abs(cen) * m, axis=(-2, -1),
                        keepdims=True) / cnt
        return cen / jnp.maximum(scale, 1e-6)

    return jnp.abs(_norm(pred_z) - _norm(gt_z)) * m


def scale_inv_loss(pred_pts: jax.Array, gt_pts: jax.Array,
                   mask: jax.Array) -> jax.Array:
    """Scale-invariant pointmap loss (losses.py:257-285 ScaleInvLoss).

    pred_pts/gt_pts: (..., H, W, 3); mask: (..., H, W) bool. Each
    leading-index map is normalized by its masked mean point norm
    (clamped 1e-6); distance = ||pred_n - gt_n||_2 on masked pixels.
    Returns the per-pixel masked distance map.
    """
    m = mask.astype(pred_pts.dtype)
    cnt = jnp.maximum(jnp.sum(m, axis=(-2, -1), keepdims=True), 1e-6)

    def _norm(x):
        n = jnp.sqrt(jnp.sum(x * x, axis=-1) + 1e-20)
        f = jnp.sum(n * m, axis=(-2, -1), keepdims=True) / cnt
        return x / jnp.maximum(f, 1e-6)[..., None]

    d = _norm(pred_pts) - _norm(gt_pts)
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-20) * m


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def find_opt_scaling(gt_pts1: jax.Array, gt_pts2, pr_pts1: jax.Array,
                     pr_pts2=None, fit_mode: str = "weiszfeld_stop_grad",
                     valid1=None, valid2=None) -> jax.Array:
    """Per-batch optimal gt->pred scale factor
    (/root/reference/src/dust3r/inference.py:329-388 find_opt_scaling).

    Solves min_s || pr - s*gt || over the valid points of (up to) two
    views, per batch element. ``avg``: closed-form least squares on the
    per-point dot products; ``median``: median of per-point ratios;
    ``weiszfeld``: 10 IRLS iterations with 1/residual-distance weights
    (a geometric-median refinement of the avg start). Modes ending in
    ``_stop_grad`` detach the result. The torch code carries invalid
    points as NaNs and nanmean/nanmedian's over them; here invalid points
    get weight 0 in masked reductions (same math, no NaNs under jit).

    gt/pr pts: (B, H, W, 3); valid: (B, H, W) bool or None (all valid).
    Returns (B,) scaling, clipped to >= 1e-3.
    """
    def flat(pts, valid):
        B = pts.shape[0]
        p = pts.reshape(B, -1, 3)
        if valid is None:
            m = jnp.ones(p.shape[:2], pts.dtype)
        else:
            m = valid.reshape(B, -1).astype(pts.dtype)
        return p, m

    g1, m1 = flat(gt_pts1, valid1)
    p1, _ = flat(pr_pts1, valid1)
    if gt_pts2 is not None:
        g2, m2 = flat(gt_pts2, valid2)
        p2, _ = flat(pr_pts2, valid2)
        all_gt = jnp.concatenate([g1, g2], axis=1)
        all_pr = jnp.concatenate([p1, p2], axis=1)
        m = jnp.concatenate([m1, m2], axis=1)
    else:
        all_gt, all_pr, m = g1, p1, m1

    dot_gt_pr = jnp.sum(all_pr * all_gt, axis=-1)      # (B, N)
    dot_gt_gt = jnp.sum(all_gt * all_gt, axis=-1)
    cnt = jnp.maximum(m.sum(1), 1.0)

    def wmean(x, w):
        return jnp.sum(x * w, axis=1) / jnp.maximum(w.sum(1), 1e-12)

    if fit_mode.startswith("avg"):
        scaling = (jnp.sum(dot_gt_pr * m, 1) / cnt) \
            / jnp.maximum(jnp.sum(dot_gt_gt * m, 1) / cnt, 1e-12)
    elif fit_mode.startswith("median"):
        # masked median: invalid entries to +inf, take the k-th order
        # statistic at k = (n_valid - 1) / 2 interpolated like
        # torch.nanmedian (lower median)
        ratio = jnp.where(m > 0, dot_gt_pr / jnp.maximum(dot_gt_gt, 1e-12),
                          jnp.inf)
        srt = jnp.sort(ratio, axis=1)
        k = ((m.sum(1) - 1) / 2).astype(jnp.int32).clip(0)
        scaling = jnp.take_along_axis(srt, k[:, None], axis=1)[:, 0]
    elif fit_mode.startswith("weiszfeld"):
        scaling = (jnp.sum(dot_gt_pr * m, 1) / cnt) \
            / jnp.maximum(jnp.sum(dot_gt_gt * m, 1) / cnt, 1e-12)

        def body(s, _):
            d = all_pr - s[:, None, None] * all_gt
            dis = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-20)
            w = m / jnp.maximum(dis, 1e-8)
            s = wmean(dot_gt_pr, w) / jnp.maximum(
                wmean(dot_gt_gt, w), 1e-12)
            return s, None
        scaling, _ = jax.lax.scan(body, scaling, None, length=10)
    else:
        raise ValueError(f"bad {fit_mode=}")

    if fit_mode.endswith("stop_grad"):
        scaling = jax.lax.stop_gradient(scaling)
    return jnp.maximum(scaling, 1e-3)


def regr3d_pose_batchlist_loss(pred: Dict[str, jax.Array],
                               gt: Dict[str, jax.Array],
                               ) -> Tuple[jax.Array, jax.Array, Dict]:
    """Regr3DPoseBatchList (losses.py:863-1044): per-batch-element
    criterion selection on top of the anchor-view regression.

    Extra gt flags, each (B,) bool:
      depth_only   — dataset has only relative depth: scale/shift-inv L1
                     on the z channel;
      single_view  — single-view non-metric dataset: scale-inv pointmap
                     loss;
      is_metric    — metric dataset (suppresses the single_view branch);
      camera_only  — pose-only supervision: cross-view pixel losses
                     dropped.
    Elements with no flag set use the standard normalized-pointmap
    criterion from regr3d_pose_loss. Static shapes: all three variants
    are evaluated and selected with jnp.where per element.
    """
    l_self_std, l_cross_std, aux = regr3d_pose_loss(pred, gt)
    valid = gt["valid_mask"]                     # (V, B, H, W)
    B = valid.shape[1]
    zeros = jnp.zeros((B,), bool)
    depth_only = gt.get("depth_only", zeros)
    single_view = gt.get("single_view", zeros)
    is_metric = gt.get("is_metric", zeros)
    camera_only = gt.get("camera_only", zeros)

    c2w = gt["camera_pose"]
    w2c = jnp.linalg.inv(c2w)
    in_cam0 = jnp.linalg.inv(c2w[0])
    gt_self = geotrf(w2c[:, :, None, None], gt["pts3d"])
    gt_cross = geotrf(in_cam0[None, :, None, None], gt["pts3d"])
    pr_self = pred["pts3d_in_self_view"]
    pr_cross = pred["pts3d_in_other_view"]

    sel_do = depth_only[None, :, None, None]
    sel_sv = (single_view & ~is_metric)[None, :, None, None]

    def _mix(l_std, pr, gtp):
        l_do = depth_scale_shift_inv_loss(pr[..., 2], gtp[..., 2], valid)
        l_sv = scale_inv_loss(pr, gtp, valid)
        return jnp.where(sel_do, l_do, jnp.where(sel_sv, l_sv, l_std))

    l_self = _mix(l_self_std, pr_self, gt_self)
    l_cross = _mix(l_cross_std, pr_cross, gt_cross)
    cross_keep = (~camera_only)[None, :, None, None]
    valid_cross = valid & cross_keep
    return l_self, l_cross, {**aux, "valid_cross": valid_cross}


def cut3r_batchlist_total_loss(pred: Dict[str, jax.Array],
                               gt: Dict[str, jax.Array],
                               alpha: float = 0.2,
                               pose_weight: float = 1.0,
                               rgb_weight: float = 1.0
                               ) -> Tuple[jax.Array, Dict]:
    """ConfLoss over the BatchList criterion mix (losses.py:1047 applied
    to Regr3DPoseBatchList), plus pose and optional RGB terms."""
    l_self, l_cross, aux = regr3d_pose_batchlist_loss(pred, gt)
    valid = gt["valid_mask"]
    valid_cross = aux.pop("valid_cross")
    loss = (conf_loss(l_self, pred["conf_self"], valid, alpha)
            + conf_loss(l_cross, pred["conf"], valid_cross, alpha)
            + pose_weight * (aux["loss_trans"] + aux["loss_quat"]))
    if "rgb" in pred and "img" in gt:
        loss = loss + rgb_weight * rgb_loss(pred["rgb"], gt["img"], valid)
    aux["total"] = loss
    return loss, aux


def cut3r_total_loss(pred: Dict[str, jax.Array], gt: Dict[str, jax.Array],
                     alpha: float = 0.2, pose_weight: float = 1.0,
                     rgb_weight: float = 1.0) -> Tuple[jax.Array, Dict]:
    l_self, l_cross, aux = regr3d_pose_loss(pred, gt)
    valid = gt["valid_mask"]
    loss = (conf_loss(l_self, pred["conf_self"], valid, alpha)
            + conf_loss(l_cross, pred["conf"], valid, alpha)
            + pose_weight * (aux["loss_trans"] + aux["loss_quat"]))
    if "rgb" in pred and "img" in gt:
        loss = loss + rgb_weight * rgb_loss(pred["rgb"], gt["img"], valid)
    aux["total"] = loss
    return loss, aux
