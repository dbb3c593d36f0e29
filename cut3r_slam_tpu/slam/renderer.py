"""Render wrapper: world -> camera transform in JAX, then the rasterizer.

Counterpart of /root/reference/hislam2/gaussian/renderer/__init__.py:
the Gaussian -> camera-frame transform happens OUTSIDE the rasterizer
(torch there, JAX here) so pose-delta gradients flow through
``get_pose`` = SE3_exp(deltas) @ w2c (slam_utils.py:93-102) without the
kernel needing pose derivatives.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.gs_raster import RasterizeConfig, rasterize, compute_bins
from ..geometry.quaternion import (matrix_to_quat, xyzw_to_wxyz)
from .camera import se3_delta_to_matrix
from .gaussian_map import SH2RGB

__all__ = ["render_view", "render_window", "transform_to_frame",
           "bin_view"]


def _quat_mult_wxyz(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def transform_to_frame(params: Dict[str, jax.Array], w2c: jax.Array):
    """Gaussian world params -> camera frame (renderer/__init__.py:160-212).

    params: arena param dict (xyz, quat wxyz, ...); w2c: (4, 4) possibly
    delta-composed. Returns (means_cam, quats_cam_wxyz).
    """
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    means_cam = params["xyz"] @ R.T + t
    q_cam_frame = xyzw_to_wxyz(matrix_to_quat(R))
    q = params["quat"]
    quat_n = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-24)
    quats_cam = _quat_mult_wxyz(q_cam_frame[None], quat_n)
    return means_cam, quats_cam


def render_view(params: Dict[str, jax.Array], alive: jax.Array,
                w2c_base: jax.Array, K4: jax.Array, cfg: RasterizeConfig,
                trans_delta: Optional[jax.Array] = None,
                rot_delta: Optional[jax.Array] = None,
                bg: Optional[jax.Array] = None,
                means2d_probe: Optional[jax.Array] = None,
                bins=None):
    """Render one view from arena params + camera (+ optional pose deltas).

    Dead arena slots render with zero opacity (they cost compute but keep
    shapes static — the TPU trade). ``bins``: a cached tile binning from
    ``bin_view`` — reused across an optimization segment's iterations
    (the sort is the per-render fixed cost worth amortizing on TPU).
    """
    w2c = w2c_base
    if trans_delta is not None:
        w2c = se3_delta_to_matrix(trans_delta, rot_delta) @ w2c_base
    means_cam, quats_cam = transform_to_frame(params, w2c)
    opac = jax.nn.sigmoid(params["opacity_logit"]) * alive.astype(jnp.float32)
    colors = jnp.clip(SH2RGB(params["f_dc"]), 0.0, None)
    if cfg.use_pallas:
        from ..ops.gs_raster_pallas import rasterize_pallas
        return rasterize_pallas(means_cam, quats_cam,
                                jnp.exp(params["log_scales"]), opac, colors,
                                K4, cfg, bg=bg, means2d_probe=means2d_probe,
                                bins=bins, interpret=cfg.interpret)
    return rasterize(means_cam, quats_cam, jnp.exp(params["log_scales"]),
                     opac, colors, K4, cfg, bg=bg,
                     means2d_probe=means2d_probe, bins=bins)


def render_window(params: Dict[str, jax.Array], alive: jax.Array,
                  w2c_base: jax.Array, K4: jax.Array, cfg: RasterizeConfig,
                  trans_deltas: Optional[jax.Array] = None,
                  rot_deltas: Optional[jax.Array] = None,
                  bins=None, means2d_probe=None):
    """Render V views in ONE fused program (Pallas backend only).

    w2c_base (V, 4, 4); trans/rot_deltas (V, 3) optional per-view pose
    deltas. Returns per-view stacked maps (V, H, W, ...). The windowed
    mapping optimizer renders its whole window through this — one blend
    kernel + one backward per iteration instead of V sequential renders
    (gs_backend_per_frame.py:451-594 loops views; on TPU the fixed
    per-render cost dominates, so the fusion is the idiomatic shape).
    """
    from ..ops.gs_raster_pallas import rasterize_pallas_multi
    w2c = w2c_base
    if trans_deltas is not None or rot_deltas is not None:
        if trans_deltas is None:
            trans_deltas = jnp.zeros_like(rot_deltas)
        if rot_deltas is None:
            rot_deltas = jnp.zeros_like(trans_deltas)
        M = jax.vmap(se3_delta_to_matrix)(trans_deltas, rot_deltas)
        w2c = jnp.einsum("vij,vjk->vik", M, w2c_base)
    means_cam, quats_cam = jax.vmap(
        lambda w: transform_to_frame(params, w))(w2c)
    opac = jax.nn.sigmoid(params["opacity_logit"]) * alive.astype(jnp.float32)
    colors = jnp.clip(SH2RGB(params["f_dc"]), 0.0, None)
    return rasterize_pallas_multi(means_cam, quats_cam,
                                  jnp.exp(params["log_scales"]), opac,
                                  colors, K4, cfg, bins=bins,
                                  means2d_probe=means2d_probe,
                                  interpret=cfg.interpret)


def bin_view(params: Dict[str, jax.Array], alive: jax.Array,
             w2c_base: jax.Array, K4: jax.Array, cfg: RasterizeConfig,
             trans_delta: Optional[jax.Array] = None,
             rot_delta: Optional[jax.Array] = None):
    """Tile binning for one view at the CURRENT params/pose — all under
    stop_gradient (bins are integer tile lists; see
    ops/gs_raster.compute_bins for the reuse contract)."""
    w2c = w2c_base
    if trans_delta is not None:
        w2c = se3_delta_to_matrix(trans_delta, rot_delta) @ w2c_base
    means_cam, quats_cam = transform_to_frame(params, w2c)
    opac = jax.nn.sigmoid(params["opacity_logit"]) * alive.astype(jnp.float32)
    means_cam, quats_cam, scales, opac = jax.lax.stop_gradient(
        (means_cam, quats_cam, jnp.exp(params["log_scales"]), opac))
    # NOTE: compute_bin_plan (the bin-time segment-reduction plan for the
    # pack backward) is NOT used here: on a v5 chip the planned path
    # measured 71.7 ms e2e fwd+bwd vs 21.3 ms for XLA's own scatter-add
    # lowering (scripts/profile_raster_stages.py, 2026-08-20) — the
    # standalone permutation gather + segment sum loses to the fused
    # in-graph scatter by 3x. Kept (with interpret-mode parity tests)
    # for hardware where the trade flips.
    return compute_bins(means_cam, quats_cam, scales, opac, K4, cfg)
