"""Gaussian-to-point integration + frustum visibility (GOF/RaDe-GS path).

TPU-native counterpart of the reference rasterizer's extra entry points
(`/root/reference/thirdparty/diff-gaussian-rasterization/ext.cpp:16-19`):

* ``mark_visible``  — frustum culling test
  (`rasterizer_impl.cu markVisible` -> `auxiliary.h in_frustum`).
* ``integrate_points`` — evaluate accumulated Gaussian opacity, blended
  color, projected coordinate and a surface SDF at arbitrary 3D query
  points (`forward.cu integrateCUDA:857,996-1374`, python wrapper
  `diff_gaussian_rasterization/__init__.py:239-306`). The reference uses
  it (adopted from Gaussian Opacity Fields) for marching-tetrahedra mesh
  extraction; it is NOT in the live SLAM render loop, so this is an
  offline XLA implementation sharing the renderer's preprocessing and
  tile binning rather than a Pallas kernel.

Design notes / deliberate deviations (documented, not silent):

* Like `ops/gs_raster.py`, the API is CAMERA-frame (the renderer wrapper
  transforms Gaussians outside the kernel, `gaussian/renderer/__init__.py
  :160`), so the reference's view matrix W is the identity here.
* The reference's ill-conditioned branch (`forward.cu:204-224`) declares
  a NEW ``inv_cov_ray`` inside the else-block, shadowing the outer
  variable — the value actually used downstream is uninitialized memory
  (undefined behavior). We instead ridge-clamp the Gaussian's scale
  eigenvalues (Vrk = R S^2 R^T, so eigenvalues are exactly scales^2) and
  always use the well-conditioned formula; `condition` still follows the
  reference rule min(scales)^2 > 1e-8 to select the behind-test branch
  in the per-point alpha (`forward.cu:1308-1323`).
* The CUDA kernel caps per-pixel contributor bookkeeping at
  MAX_NUM_CONTRIBUTORS*4 and points-per-pixel at MAX_NUM_PROJECTED with
  a host-visible error print; here the per-tile entry list is already
  capped at ``cfg.max_per_tile`` (same truncation surface as the
  renderer) and any number of points per pixel is fine (vmap).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .gs_raster import RasterizeConfig, _bin_gaussians, _preprocess

__all__ = ["mark_visible", "integrate_points"]


def mark_visible(means_cam: jax.Array, near: float = 0.2) -> jax.Array:
    """Frustum visibility of points, camera frame (markVisible semantics).

    The reference's in_frustum (`auxiliary.h`) computes the projected
    point but only acts on the near-plane test ``p_view.z > 0.2`` (the
    xy bounds checks are commented out upstream), so visibility is
    exactly a near-depth test.
    """
    return means_cam[:, 2] > near


def _inv_ray_cov(quats, scales, txtz, tytz, t_norm, tz, fx, fy):
    """Per-Gaussian inverse ray-space covariance (forward.cu:188-235).

    Returns the 6 upper-triangle components of
    S · (M · Vrk_inv · M^T) · S   with  S = diag(1/fx, 1/fy, 1),
    M = z/ltz · [[v²+1, −uv, −u], [−uv, u²+1, −v],
                 [u·ltz/l, v·ltz/l, ltz/l]],  ltz = u²+v²+1, l = ‖t‖,
    Vrk_inv = R diag(1/max(s², 1e-8)) Rᵀ  (ridge replaces the
    reference's UB ill-conditioned branch, see module docstring).
    """
    qr, qx, qy, qz = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    R = jnp.stack([
        1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qr * qz),
        2 * (qx * qz + qr * qy),
        2 * (qx * qy + qr * qz), 1 - 2 * (qx * qx + qz * qz),
        2 * (qy * qz - qr * qx),
        2 * (qx * qz - qr * qy), 2 * (qy * qz + qr * qx),
        1 - 2 * (qx * qx + qy * qy),
    ], axis=-1).reshape(-1, 3, 3)
    inv_s2 = 1.0 / jnp.maximum(scales * scales, 1e-8)  # (P, 3)
    vrk_inv = jnp.einsum("pij,pj,pkj->pik", R, inv_s2, R)

    u, v = txtz, tytz
    ltz = u * u + v * v + 1.0
    zl = tz / ltz
    row0 = jnp.stack([v * v + 1.0, -u * v, -u], axis=-1) * zl[:, None]
    row1 = jnp.stack([-u * v, u * u + 1.0, -v], axis=-1) * zl[:, None]
    row2 = (jnp.stack([u, v, jnp.ones_like(u)], axis=-1)
            * (ltz / t_norm)[:, None] * zl[:, None])
    M = jnp.stack([row0, row1, row2], axis=-2)  # (P, 3, 3)
    icr = jnp.einsum("pab,pbc,pdc->pad", M, vrk_inv, M)
    s = jnp.stack([1.0 / fx, 1.0 / fy, jnp.asarray(1.0, icr.dtype)])
    icr = icr * s[None, :, None] * s[None, None, :]
    return icr  # (P, 3, 3) symmetric


# 5-tap subpixel offsets used by integrateCUDA's contribution test
# (forward.cu:1020-1022): pixel center + 4 half-pixel corners.
# Plain tuples: jnp arrays at import time would eagerly initialize a
# backend before callers force their platform.
_OFF_X = (0.0, -0.5, 0.5, -0.5, 0.5)
_OFF_Y = (0.0, -0.5, -0.5, 0.5, 0.5)


@partial(jax.jit, static_argnames=("cfg", "point_chunk"))
def integrate_points(points_cam: jax.Array, means_cam: jax.Array,
                     quats_wxyz: jax.Array, scales: jax.Array,
                     opacities: jax.Array, colors: jax.Array,
                     K4: jax.Array, cfg: RasterizeConfig,
                     bg: jax.Array | None = None,
                     point_chunk: int = 4096):
    """Integrate Gaussians onto query points (integrateCUDA semantics).

    Args:
      points_cam: (N, 3) query points, camera frame.
      means_cam/quats_wxyz/scales/opacities/colors: Gaussian arrays as in
        ``gs_raster.rasterize`` (camera frame, wxyz quats, exp'd scales).
      K4: [fx, fy, cx, cy].
      cfg: shared tile/bin configuration.
      bg: (3,) background color (default zeros).
      point_chunk: points processed per lax.map step (memory knob).

    Returns dict with
      alpha_integrated: (N,) accumulated opacity along the point's pixel
        ray, each contribution evaluated at the query point's depth
        (3D falloff), front-to-back transmittance-weighted.
      color_integrated: (N, 3) the point's pixel blended color (+ T·bg).
      point_coordinate: (N, 2) projected pixel coordinates.
      point_sdf: (N,) median-surface depth at the point's pixel minus
        the point's depth (>0 in front of the surface).
      visible: (N,) the mark_visible + in-image mask actually applied.
    """
    if bg is None:
        bg = jnp.zeros((3,), points_cam.dtype)
    fx, fy, cx, cy = K4[0], K4[1], K4[2], K4[3]
    H, W = cfg.height, cfg.width

    pre = _preprocess(means_cam, quats_wxyz, scales, opacities, K4, cfg)
    entry_gauss, entry_mask = _bin_gaussians(pre, cfg)
    icov_ray = _inv_ray_cov(
        quats_wxyz, scales,
        means_cam[:, 0] / jnp.maximum(means_cam[:, 2], 1e-7),
        means_cam[:, 1] / jnp.maximum(means_cam[:, 2], 1e-7),
        pre["t_center"], jnp.maximum(means_cam[:, 2], 1e-7), fx, fy)
    condition = jnp.min(scales * scales, axis=-1) > 1e-8  # forward.cu:142

    # project query points (preprocessPointsCUDA:880-898)
    pz = points_cam[:, 2]
    pz_safe = jnp.where(pz > 0.2, pz, 1.0)
    px = fx * points_cam[:, 0] / (pz_safe + 1e-7) + cx
    py = fy * points_cam[:, 1] / (pz_safe + 1e-7) + cy
    p_depth = jnp.sqrt(jnp.sum(points_cam * points_cam, axis=-1))
    visible = ((pz > 0.2) & (px >= 0) & (px < W) & (py >= 0) & (py < H))

    pix_ix = jnp.clip(px.astype(jnp.int32), 0, W - 1)
    pix_iy = jnp.clip(py.astype(jnp.int32), 0, H - 1)
    tile_of_pt = (pix_iy // 16) * cfg.tiles_x + pix_ix // 16
    pixf_x = pix_ix.astype(points_cam.dtype) + 0.5
    pixf_y = pix_iy.astype(points_cam.dtype) + 0.5

    K = cfg.max_per_tile

    def one_point(args):
        (tile, fx_pix, fy_pix, qx_pt, qy_pt, qd, vis) = args
        idx = entry_gauss[tile]            # (K,) depth-sorted gaussians
        ok = entry_mask[tile] & pre["valid"][idx] & vis
        xy = pre["mean2d"][idx]            # (K, 2)
        con = pre["conic"][idx]            # (K, 3)
        op = pre["opacity"][idx]           # (K,)
        dist_c = pre["t_center"][idx]      # gaussian center distance
        plane = pre["ray_plane"][idx]      # (K, 2)
        icr = icov_ray[idx]                # (K, 3, 3)
        cond = condition[idx]
        col = colors[idx]                  # (K, 3)

        # ---- render-pass contribution test at the 5 subpixel taps ----
        # Exact CUDA control flow (forward.cu:1063-1124): a tap whose
        # test_T = T·(1−α) would drop below 1e-4 is SKIPPED WITHOUT
        # updating that corner's T (the transmittance clamps just above
        # 1e-4 instead of decaying), so this is a sequential recurrence,
        # not a cumulative product — lax.scan over the depth-sorted
        # entries (offline path; K steps of scalar-vector work).
        off_x = jnp.asarray(_OFF_X, xy.dtype)
        off_y = jnp.asarray(_OFF_Y, xy.dtype)
        dx5 = xy[:, 0:1] - (fx_pix + off_x)[None, :]       # (K, 5)
        dy5 = xy[:, 1:2] - (fy_pix + off_y)[None, :]
        power5 = (-0.5 * (con[:, 0:1] * dx5 * dx5 + con[:, 2:3] * dy5 * dy5)
                  - con[:, 1:2] * dx5 * dy5)
        alpha5 = jnp.minimum(0.99, op[:, None] * jnp.exp(power5))
        hit5 = (power5 <= 0.0) & (alpha5 >= 1.0 / 255.0) & ok[:, None]

        def entry_step(carry, xs):
            T5, C3, mid = carry
            a5, h5, colk, distk, pl0, pl1, x0, x1 = xs
            test5 = T5 * (1.0 - a5)
            pass5 = h5 & (test5 >= 1e-4)
            hit_c = pass5[0]
            # center-tap blend before the T update (forward.cu:1095-1112)
            C3 = C3 + jnp.where(hit_c, a5[0] * T5[0], 0.0) * colk
            take_mid = hit_c & (T5[0] > 0.5 + 1e-6)
            mid = jax.tree.map(
                lambda old, new: jnp.where(take_mid, new, old), mid,
                (distk, pl0, pl1, x0, x1, jnp.int32(1)))
            T5 = jnp.where(pass5, test5, T5)
            return (T5, C3, mid), jnp.any(pass5)

        mid0 = (jnp.float32(0), jnp.float32(0), jnp.float32(0),
                jnp.float32(0), jnp.float32(0), jnp.int32(0))
        (T5_fin, pix_color, mid), contributes = jax.lax.scan(
            entry_step,
            (jnp.ones((5,), xy.dtype), jnp.zeros((3,), xy.dtype), mid0),
            (alpha5, hit5, col, dist_c, plane[:, 0], plane[:, 1],
             xy[:, 0], xy[:, 1]))
        T_final = T5_fin[0]
        mid_dist, mid_pl0, mid_pl1, mid_x, mid_y, mid_flag = mid
        has_mid = mid_flag > 0

        # ---- per-point 3D alpha accumulation (forward.cu:1296-1337) ----
        dxp = xy[:, 0] - qx_pt
        dyp = xy[:, 1] - qy_pt
        g_depth_at_pt = dist_c + plane[:, 0] * dxp + plane[:, 1] * dyp
        dz = dist_c - jnp.minimum(qd, g_depth_at_pt)
        # well-conditioned: full 3D falloff; else: behind-test + planar
        dz_ill = dist_c
        dzk = jnp.where(cond, dz, dz_ill)
        d3 = jnp.stack([dxp, dyp, dzk], axis=-1)        # (K, 3)
        powp = -0.5 * jnp.einsum("ka,kab,kb->k", d3, icr, d3)
        alphap = jnp.minimum(0.99, op * jnp.exp(powp))
        alphap = jnp.where(cond | (qd >= g_depth_at_pt), alphap, 0.0)
        usep = contributes & (alphap >= 1.0 / 255.0)
        a_p = jnp.where(usep, alphap, 0.0)
        Tp_before = jnp.exp(jnp.concatenate([
            jnp.zeros((1,), a_p.dtype),
            jnp.cumsum(jnp.log1p(-jnp.minimum(a_p, 0.999)))[:-1]]))
        alpha_int = jnp.sum(a_p * Tp_before)

        # SDF: median-surface plane evaluated at the point's projection
        # (forward.cu:1358-1363); 0 when the pixel has no median surface.
        mid_depth = (mid_dist + mid_pl0 * (mid_x - qx_pt)
                     + mid_pl1 * (mid_y - qy_pt))
        sdf = jnp.where(has_mid & vis & (qd > 0), mid_depth - qd, 0.0)

        color_int = jnp.where(vis, pix_color + T_final * bg, 0.0)
        return (jnp.where(vis, alpha_int, 0.0), color_int, sdf)

    n = points_cam.shape[0]
    pad = (-n) % point_chunk
    def padded(x):
        return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:],
                                             x.dtype)]) if pad else x
    args = (padded(tile_of_pt), padded(pixf_x), padded(pixf_y),
            padded(px), padded(py), padded(p_depth), padded(visible))
    args = jax.tree.map(
        lambda x: x.reshape((-1, point_chunk) + x.shape[1:]), args)
    alpha_i, color_i, sdf = jax.lax.map(jax.vmap(one_point), args)

    def unpad(x):
        return x.reshape((-1,) + x.shape[2:])[:n]
    return {
        "alpha_integrated": unpad(alpha_i),
        "color_integrated": unpad(color_i),
        "point_coordinate": jnp.stack([px, py], axis=-1),
        "point_sdf": unpad(sdf),
        "visible": visible,
    }
