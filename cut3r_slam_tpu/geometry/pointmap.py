"""Pointmap / pose utilities shared by the tracking and mapping layers.

JAX counterparts of /root/reference/hislam2/util/utils.py helpers
(`depth_to_pointmap` :467, `pose_vec_to_matrix` :690, `umeyama_alignment`
:738, `get_depth_normal` :268) and dust3r's `geotrf`. The reference round-
trips these through scipy/open3d on CPU; here everything stays on device.

Pose vector convention at the SLAM layer: ``[t(3), quat xyzw]`` camera-to-
world (see SURVEY.md Appendix A).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .quaternion import quat_normalize
from .lie import se3_matrix, se3_from_matrix

__all__ = [
    "geotrf", "depth_to_pointmap", "pointmap_to_depth", "pose_vec_to_matrix",
    "matrix_to_pose_vec", "umeyama_alignment", "depth_to_normal",
    "log_depth_scale_align",
]


def geotrf(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply 4x4 (or (..., 4, 4)) rigid/affine transform to (..., 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...j->...i", R, pts) + t


def depth_to_pointmap(depth: jax.Array, intrinsics: jax.Array,
                      c2w: jax.Array | None = None) -> jax.Array:
    """depth (..., H, W), intrinsics (..., 4) -> pointmap (..., H, W, 3).

    If ``c2w`` (..., 4, 4) is given, points are returned in world frame.
    """
    ht, wd = depth.shape[-2:]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    y = jnp.arange(ht, dtype=depth.dtype)
    x = jnp.arange(wd, dtype=depth.dtype)
    gy, gx = jnp.meshgrid(y, x, indexing="ij")
    X = (gx - cx) / fx * depth
    Y = (gy - cy) / fy * depth
    pts = jnp.stack([X, Y, depth], axis=-1)
    if c2w is not None:
        pts = geotrf(c2w[..., None, None, :, :].reshape(c2w.shape[:-2] + (1, 1, 4, 4)), pts)
    return pts


def pointmap_to_depth(pts: jax.Array) -> jax.Array:
    return pts[..., 2]


def pose_vec_to_matrix(pose: jax.Array) -> jax.Array:
    """[t, quat xyzw] (..., 7) -> (..., 4, 4)."""
    return se3_matrix(jnp.concatenate(
        [pose[..., :3], quat_normalize(pose[..., 3:7])], axis=-1))


def matrix_to_pose_vec(m: jax.Array) -> jax.Array:
    return se3_from_matrix(m)


def umeyama_alignment(x: jax.Array, y: jax.Array, with_scale: bool = True):
    """Least-squares similarity transform aligning x -> y.

    x, y: (N, 3) point sets. Returns (R (3,3), t (3,), s scalar) such that
    ``y ~= s R x + t``. Mirrors util/utils.py:738 (Umeyama 1991).
    """
    mu_x = x.mean(axis=0)
    mu_y = y.mean(axis=0)
    xc = x - mu_x
    yc = y - mu_y
    n = x.shape[0]
    cov = yc.T @ xc / n
    U, D, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=x.dtype)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = S.at[2, 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = U @ S @ Vt
    var_x = (xc * xc).sum() / n
    s = jnp.where(with_scale, jnp.trace(jnp.diag(D) @ S) / jnp.maximum(var_x, 1e-12), 1.0)
    t = mu_y - s * R @ mu_x
    return R, t, s


def log_depth_scale_align(depth_ref: jax.Array, depth_new: jax.Array,
                          mask: jax.Array) -> jax.Array:
    """Scale factor s = exp(mean(log d_ref - log d_new)) over masked pixels.

    The submap stitching rule of track_frontend.py:216-222. ``mask`` is a
    boolean/float validity map; falls back to s=1 when too few valid pixels
    (the reference's conf_mask.sum()<50 guard at track_frontend.py:120-121).
    """
    m = mask.astype(depth_ref.dtype)
    safe_ref = jnp.maximum(depth_ref, 1e-6)
    safe_new = jnp.maximum(depth_new, 1e-6)
    diff = (jnp.log(safe_ref) - jnp.log(safe_new)) * m
    cnt = m.sum()
    s = jnp.exp(diff.sum() / jnp.maximum(cnt, 1.0))
    return jnp.where(cnt < 50, jnp.ones_like(s), s)


def depth_to_normal(depth: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Cross-product normals from a depth map (H, W) -> (H, W, 3).

    Matches gaussian/utils/slam_utils.py:179-229 (depths_to_points +
    depth_to_normal): central differences of the camera-frame pointmap,
    zero on the 1-pixel border.
    """
    pts = depth_to_pointmap(depth, intrinsics)
    dx = pts[2:, 1:-1] - pts[:-2, 1:-1]
    dy = pts[1:-1, 2:] - pts[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # eps inside the sqrt: jnp.linalg.norm has a NaN gradient at exactly 0,
    # which empty-depth pixels would inject into every mapping loss
    n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    out = jnp.zeros_like(pts)
    out = out.at[1:-1, 1:-1].set(n)
    return out
