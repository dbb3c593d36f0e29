"""Differentiable 3D-Gaussian-splatting rasterizer (RaDe-GS variant), TPU-native.

Replaces the reference's diff-gaussian-rasterization CUDA extension
(/root/reference/thirdparty/diff-gaussian-rasterization): preprocess
(forward.cu:308-423, computeCov2D with camera/ray planes + per-Gaussian
normals :76-262), tile binning (rasterizer_impl.cu:70-151) and per-pixel
front-to-back blending with expected & median depth/coord and blended
normals (renderCUDA, forward.cu:429-692).

Instead of a CUDA thread-per-pixel loop, rendering is reformulated as
**chunked matmuls**: for every 16x16 tile, per-chunk Gaussian weights
``aT (pixels x K)`` are built from the conic (VPU), transmittance is a
cumulative product in log space, and all accumulations (color, depth,
coord, normal) are (pixels x K) @ (K x c) contractions on the MXU.
Early termination, the alpha clamp, and the median (last contribution
with T > 0.5) reproduce the CUDA semantics exactly via masking.

Binning is shape-static: each Gaussian emits at most MAX_DUP tile entries;
entries are sorted once by (tile, depth) with a multi-key XLA sort; each
tile consumes at most ``max_per_tile`` nearest entries. All caps are
compile-time constants, so the program never recompiles over a run.

Gradients come from JAX AD through the (rematerialized) blending scan —
the analytic CUDA backward (backward.cu) is replaced by autodiff on the
same arithmetic. The camera-frame transform stays OUTSIDE this module
(exactly like the reference keeps it in torch, renderer/__init__.py:160)
so pose gradients flow through the caller.

Quaternion convention here: **wxyz** (CUDA computeCov3D order, r-x-y-z).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

__all__ = ["RasterizeConfig", "rasterize", "compute_bins",
           "compute_bin_plan", "quat_wxyz_to_matrix"]

TILE = 16
ALPHA_MIN = 1.0 / 255.0
# Median-depth selection threshold (CUDA forward.cu:596-603 tests
# T > 0.5 with T the transmittance BEFORE the entry's contribution).
# The +1e-4 bias makes the XLA and Pallas backends agree on ties: alpha
# values like 0.5 produce Tb == 0.5 EXACTLY under the XLA cumprod but
# 0.5 +- 1e-8 under the Pallas log-space scan, flipping `> 0.5` between
# backends and selecting different contributors (mdepth divergence up
# to the inter-Gaussian depth gap). Any true Tb within 1e-4 of the
# biased threshold remains ambiguous, but that set is measure-zero in
# real scenes while exact-0.5 ties are common (sigmoid(0) opacities).
MEDIAN_T_THRESH = 0.5 + 1e-4
# Quantized tie-break (VERDICT r4 #8): both backends compare FLOORED
# fixed-point transmittance, so a few-ulp Tb difference between the XLA
# cumprod and the Pallas roll-scan product (exact associativity aside,
# they differ in reduction order) flips the comparison ONLY when Tb
# lands within those ulps of a 2^-12 quantization boundary (~1e-3 odds
# per boundary-adjacent pixel) instead of anywhere in the ulp band
# around the threshold. Semantics shift vs the CUDA float compare by at
# most one quantization step (2.4e-4) in the effective threshold —
# inside the bias slack above. Chip-measured p99 |mdepth| gap across
# backends: 1.2e-1 (float compare) -> see IMPLEMENTATION_STATUS.
MEDIAN_T_QUANT = 2.0 ** 12


def median_gate(Tb):
    """Backend-shared median-selection test on pre-blend transmittance."""
    return jnp.floor(Tb * MEDIAN_T_QUANT) \
        > jnp.floor(jnp.float32(MEDIAN_T_THRESH * MEDIAN_T_QUANT))
T_MIN = 1e-4
NORMALIZE_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    height: int
    width: int
    max_dup: int = 16          # max tiles one Gaussian may cover
    max_per_tile: int = 512    # nearest entries blended per tile
    chunk: int = 128           # Gaussians per blending step
    kernel_size: float = 0.1   # low-pass added to cov2D (config.h / settings)
    use_pallas: bool = False   # tile blend via the Pallas kernels (TPU);
    #                            fwd+custom-VJP bwd in ops/gs_raster_pallas
    interpret: bool = False    # run Pallas kernels in interpret mode —
    #                            CPU-testable parity of the pallas paths
    fused_bin_key: bool = True  # binning sort on ONE packed uint32 key
    #                             (tile | quantized depth) instead of a
    #                             2-key (tile, f32 depth) sort — ~halves
    #                             the per-render sort cost on TPU. Depth
    #                             order is exact down to ~1e-4 relative
    #                             (ties blend in arbitrary order).

    @property
    def tiles_x(self):
        return (self.width + TILE - 1) // TILE

    @property
    def tiles_y(self):
        return (self.height + TILE - 1) // TILE

    @property
    def n_tiles(self):
        return self.tiles_x * self.tiles_y


def quat_wxyz_to_matrix(q: jax.Array) -> jax.Array:
    """CUDA computeCov3D rotation (forward.cu:270-291), wxyz layout."""
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    m = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# preprocess
# ---------------------------------------------------------------------------

def _preprocess(means, quats, scales, opacities, K4, cfg: RasterizeConfig):
    """Per-Gaussian screen-space quantities (forward.cu preprocessCUDA).

    means: (P, 3) CAMERA-frame centers; quats (P, 4) wxyz (normalized);
    scales (P, 3) (already exp'd); opacities (P,); K4 [fx, fy, cx, cy].
    """
    fx, fy, cx, cy = K4[0], K4[1], K4[2], K4[3]
    H, W = cfg.height, cfg.width
    tan_fovx = W / (2.0 * fx)
    tan_fovy = H / (2.0 * fy)

    tz = means[:, 2]
    valid = tz > 0.2  # near cull (auxiliary.h in_frustum)
    tz_safe = jnp.where(valid, tz, 1.0)

    # clamp the projection point like computeCov2D (forward.cu:85-94)
    txtz = jnp.clip(means[:, 0] / tz_safe, -1.3 * tan_fovx, 1.3 * tan_fovx)
    tytz = jnp.clip(means[:, 1] / tz_safe, -1.3 * tan_fovy, 1.3 * tan_fovy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    # cov3D = R S² Rᵀ (computeCov3D with glm column-major unrolled:
    # Σ = (S·R_glm)ᵀ(S·R_glm) = R_std · S² · R_stdᵀ for the standard R).
    # Structure-of-arrays scalar math throughout this function: (P, 3, 3)
    # tensors + tiny einsums layout catastrophically on TPU (3-wide minor
    # dims pad to 128 lanes; measured 63 ms for this function vs ~3 ms in
    # flat (P,) component form).
    qr, qx, qy, qz = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qr * qz)
    r02 = 2 * (qx * qz + qr * qy)
    r10 = 2 * (qx * qy + qr * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qr * qx)
    r20 = 2 * (qx * qz - qr * qy)
    r21 = 2 * (qy * qz + qr * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s20 = scales[:, 0] * scales[:, 0]
    s21 = scales[:, 1] * scales[:, 1]
    s22_ = scales[:, 2] * scales[:, 2]
    V00 = r00 * r00 * s20 + r01 * r01 * s21 + r02 * r02 * s22_
    V01 = r00 * r10 * s20 + r01 * r11 * s21 + r02 * r12 * s22_
    V02 = r00 * r20 * s20 + r01 * r21 * s21 + r02 * r22 * s22_
    V11 = r10 * r10 * s20 + r11 * r11 * s21 + r12 * r12 * s22_
    V12 = r10 * r20 * s20 + r11 * r21 * s21 + r12 * r22 * s22_
    V22 = r20 * r20 * s20 + r21 * r21 * s21 + r22 * r22 * s22_

    # EWA: cov2D = J Vrk Jᵀ with J = [[fx/z, 0, -fx tx/z²],
    #                                 [0, fy/z, -fy ty/z²]]
    z2 = tz_safe * tz_safe
    j00 = fx / tz_safe
    j02 = -fx * tx / z2
    j11 = fy / tz_safe
    j12 = -fy * ty / z2
    a = j00 * j00 * V00 + 2 * j00 * j02 * V02 + j02 * j02 * V22
    b = (j00 * j11 * V01 + j00 * j12 * V02 + j02 * j11 * V12
         + j02 * j12 * V22)
    c = j11 * j11 * V11 + 2 * j11 * j12 * V12 + j12 * j12 * V22
    det0 = jnp.maximum(a * c - b * b, 1e-6)
    a = a + cfg.kernel_size
    c = c + cfg.kernel_size
    det1 = jnp.maximum(a * c - b * b, 1e-6)
    coef = jnp.sqrt(det0 / (det1 + 1e-6) + 1e-6)  # opacity low-pass rescale

    det_inv = 1.0 / det1
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))
    mean2d = jnp.stack([fx * txtz + cx, fy * tytz + cy], axis=-1)

    # ---- RaDe-GS planes + normals (computeCov2D :135-262) ----
    # Vrk_inv enters only through the *normalized* direction uvh_mn, so a
    # ridge-regularized closed-form inverse reproduces both reference
    # branches: well-conditioned -> true inverse; flat -> the small-eigen
    # direction dominates (the reference's outer(e_min, e_min) fallback).
    # eigh is avoided because its gradient NaNs on degenerate spectra
    # (isotropic Gaussians).
    # trace-normalize first: only the normalized direction of Vrk_inv·uvh
    # matters, and raw determinants of tiny Gaussians ((1e-4)^6 ~ 1e-24)
    # overflow 1/det^2 in the backward pass
    tr_inv = 1.0 / jnp.maximum(V00 + V11 + V22, 1e-20)
    w00 = V00 * tr_inv + 1e-6
    w01 = V01 * tr_inv
    w02 = V02 * tr_inv
    w11 = V11 * tr_inv + 1e-6
    w12 = V12 * tr_inv
    w22 = V22 * tr_inv + 1e-6
    # symmetric adjugate inverse (differentiable everywhere)
    A00 = w11 * w22 - w12 * w12
    A01 = w02 * w12 - w01 * w22
    A02 = w01 * w12 - w02 * w11
    A11 = w00 * w22 - w02 * w02
    A12 = w01 * w02 - w00 * w12
    A22 = w00 * w11 - w01 * w01
    det3 = jnp.maximum(w00 * A00 + w01 * A01 + w02 * A02, 1e-12)
    # uvh = (u, v, 1); uvh_m = W⁻¹ uvh
    m0 = (A00 * txtz + A01 * tytz + A02) / det3
    m1 = (A01 * txtz + A11 * tytz + A12) / det3
    m2 = (A02 * txtz + A12 * tytz + A22) / det3
    mlen = jnp.sqrt(m0 * m0 + m1 * m1 + m2 * m2 + 1e-24)
    mn0, mn1, mn2 = m0 / mlen, m1 / mlen, m2 / mlen

    u2 = txtz * txtz
    v2 = tytz * tytz
    uv = txtz * tytz
    t_norm = jnp.sqrt(tx * tx + ty * ty + tz_safe * tz_safe)
    nl = u2 + v2 + 1.0
    vbn = mn0 * txtz + mn1 * tytz + mn2
    # nJ_inv (column-major glm -> math: rows below are the math rows)
    plane0 = ((v2 + 1) * mn0 - uv * mn1
              - txtz * mn2) / jnp.maximum(vbn, 1e-7)
    plane1 = (-uv * mn0 + (u2 + 1) * mn1
              - tytz * mn2) / jnp.maximum(vbn, 1e-7)

    ray_plane = jnp.stack([plane0 * t_norm / nl / fx,
                           plane1 * t_norm / nl / fy], axis=-1)

    cam_plane = jnp.stack([
        (-(v2 + 1) * tz_safe + plane0 * tx) / nl / fx,
        (uv * tz_safe + plane1 * tx) / nl / fy,
        (uv * tz_safe + plane0 * ty) / nl / fx,
        (-(u2 + 1) * tz_safe + plane1 * ty) / nl / fy,
        (tx + plane0 * tz_safe) / nl / fx,
        (ty + plane1 * tz_safe) / nl / fy,
    ], axis=-1)

    factor = t_norm / nl
    # nJ (glm col-major :178-182) applied to (-p0*f, -p1*f, -1)
    rn0 = -plane0 * factor
    rn1 = -plane1 * factor
    n_cam = jnp.stack([
        rn0 / tz_safe + (-1.0) * tx / t_norm,
        rn1 / tz_safe + (-1.0) * ty / t_norm,
        -(tx * rn0 + ty * rn1) / z2 + (-1.0) * tz_safe / t_norm,
    ], axis=-1)
    normal = n_cam / jnp.sqrt(
        jnp.sum(n_cam * n_cam, axis=-1, keepdims=True) + 1e-24)

    # Opacity cull: a Gaussian with effective opacity < 1/255 can never
    # pass the per-pixel alpha test (alpha = opacity·coef·exp(power) ≤
    # opacity·coef, forward.cu:560-566), so binning it only burns
    # max_per_tile budget. This matters because pruned arena slots keep
    # stale geometry with opacity forced to 0 by the alive mask — without
    # this cull every one of them stays tile-resident forever. Exact vs
    # CUDA except for Gaussians within one ulp of the threshold.
    valid = valid & (det1 > 1e-6) & (opacities * coef >= ALPHA_MIN)
    radius = jnp.where(valid, radius, 0.0)

    return {
        "mean2d": mean2d, "conic": conic, "radius": radius,
        "opacity": opacities * coef, "depth_z": tz,
        "t_center": t_norm, "ray_plane": ray_plane,
        "cam_plane": cam_plane, "normal": normal,
        "view_point": jnp.stack([tx, ty, tz_safe], axis=-1),
        "valid": valid,
    }


# ---------------------------------------------------------------------------
# binning
# ---------------------------------------------------------------------------

def _bin_gaussians(pre, cfg: RasterizeConfig, return_inverse: bool = False):
    """Duplicate-sort-range binning with static caps.

    Returns per-tile entry indices (n_tiles, max_per_tile) into the
    Gaussian arrays plus a validity mask. With ``return_inverse`` also
    returns the INVERSE map (P, max_dup) int32: for Gaussian p's d-th
    tile duplicate, the flat position ``tile * max_per_tile + k`` it
    landed at (or -1 if culled / beyond the per-tile cap). The Pallas
    backward turns the pack's gradient scatter-add (the slowest XLA op
    in the whole render, ~7.6 ms at 2M entries on a v5 chip) into a
    (P, max_dup) GATHER over this map — one extra inverse-permutation
    scatter of int32s at BIN time, amortized across a cached-bins
    optimization segment.
    """
    P = pre["mean2d"].shape[0]
    mean2d = pre["mean2d"]
    radius = pre["radius"]
    valid = pre["valid"]

    rect_min_x = jnp.clip(((mean2d[:, 0] - radius) / TILE).astype(jnp.int32),
                          0, cfg.tiles_x - 1)
    rect_max_x = jnp.clip(jnp.ceil((mean2d[:, 0] + radius + 1) / TILE
                                   ).astype(jnp.int32), 1, cfg.tiles_x)
    rect_min_y = jnp.clip(((mean2d[:, 1] - radius) / TILE).astype(jnp.int32),
                          0, cfg.tiles_y - 1)
    rect_max_y = jnp.clip(jnp.ceil((mean2d[:, 1] + radius + 1) / TILE
                                   ).astype(jnp.int32), 1, cfg.tiles_y)
    nx = rect_max_x - rect_min_x
    ny = rect_max_y - rect_min_y
    n_tiles_g = nx * ny
    alive = valid & (radius > 0)

    # enumerate up to max_dup tile slots per Gaussian, row-major in its rect
    slot = jnp.arange(cfg.max_dup, dtype=jnp.int32)[None, :]  # (1, D)
    sy = slot // jnp.maximum(nx[:, None], 1)
    sx = slot % jnp.maximum(nx[:, None], 1)
    tile_id = ((rect_min_y[:, None] + sy) * cfg.tiles_x
               + rect_min_x[:, None] + sx)
    entry_ok = (slot < n_tiles_g[:, None]) & alive[:, None]
    tile_id = jnp.where(entry_ok, tile_id, cfg.n_tiles)  # sentinel tile

    # sort all entries by (tile, depth)
    depth = jnp.broadcast_to(pre["depth_z"][:, None], tile_id.shape)
    gidx = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], tile_id.shape)
    tile_flat = tile_id.reshape(-1)
    depth_flat = jnp.where(entry_ok.reshape(-1), depth.reshape(-1), jnp.inf)
    gidx_flat = gidx.reshape(-1)
    e_flat = jnp.arange(tile_flat.shape[0], dtype=jnp.int32)
    e_s = None
    if cfg.fused_bin_key:
        # ONE uint32 key: tile id in the high bits, quantized depth in
        # the low bits (CUDA packs tile|depth into a 64-bit radix key
        # the same way, rasterizer_impl.cu duplicateWithKeys). Positive
        # f32 bit patterns are monotone, so the top depth_bits of the
        # float encoding preserve order to ~2^-(depth_bits - 9) relative.
        tile_bits = max(cfg.n_tiles.bit_length(), 1)  # ids 0..n_tiles incl.
        depth_bits = 32 - tile_bits
        dbits = jax.lax.bitcast_convert_type(
            jnp.maximum(depth_flat.astype(jnp.float32), 0.0), jnp.uint32)
        key = ((tile_flat.astype(jnp.uint32) << depth_bits)
               | (dbits >> tile_bits))
        if return_inverse:
            key_s, gidx_s, e_s = jax.lax.sort((key, gidx_flat, e_flat),
                                              num_keys=1)
        else:
            key_s, gidx_s = jax.lax.sort((key, gidx_flat), num_keys=1)
        boundaries = jnp.searchsorted(
            key_s, jnp.arange(cfg.n_tiles + 1,
                              dtype=jnp.uint32) << depth_bits)
    else:
        if return_inverse:
            tile_s, depth_s, gidx_s, e_s = jax.lax.sort(
                (tile_flat, depth_flat, gidx_flat, e_flat), num_keys=2)
        else:
            tile_s, depth_s, gidx_s = jax.lax.sort(
                (tile_flat, depth_flat, gidx_flat), num_keys=2)

        # per-tile ranges via searchsorted on the sorted tile ids
        boundaries = jnp.searchsorted(tile_s, jnp.arange(cfg.n_tiles + 1,
                                                         dtype=jnp.int32))
    starts = boundaries[:-1]
    counts = boundaries[1:] - starts

    # per-tile nearest max_per_tile entries
    k = jnp.arange(cfg.max_per_tile, dtype=jnp.int32)[None, :]
    take = starts[:, None] + k
    in_range = k < counts[:, None]
    take = jnp.clip(take, 0, gidx_s.shape[0] - 1)
    entry_gauss = jnp.where(in_range, gidx_s[take], 0)
    if not return_inverse:
        return entry_gauss, in_range

    # inverse permutation: pre-sort entry e sits at sorted position s
    n_e = e_flat.shape[0]
    pos_s = jnp.zeros((n_e,), jnp.int32).at[e_s].set(
        jnp.arange(n_e, dtype=jnp.int32), unique_indices=True)
    t_e = tile_flat  # (P * max_dup,) sentinel = cfg.n_tiles when culled
    starts_pad = jnp.concatenate(
        [starts.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])
    k_e = pos_s - starts_pad[t_e]
    ok = (t_e < cfg.n_tiles) & (k_e >= 0) & (k_e < cfg.max_per_tile)
    inv_flat = jnp.where(ok, t_e * cfg.max_per_tile + k_e, -1)
    return entry_gauss, in_range, inv_flat.reshape(P, cfg.max_dup)


@partial(jax.jit, static_argnames=("cfg",))
def compute_bins(means_cam: jax.Array, quats_wxyz: jax.Array,
                 scales: jax.Array, opacities: jax.Array, K4: jax.Array,
                 cfg: "RasterizeConfig"):
    """Tile-binning alone: per-tile Gaussian entry lists + validity mask.

    The duplicate-sort binning is the per-render fixed cost the CUDA
    rasterizer pays on every forward (rasterizer_impl.cu:70-151, where a
    device radix sort is ~free). On TPU the 2M-entry XLA sort costs ~8 ms,
    so the mapping optimizer computes bins ONCE PER SEGMENT here and
    passes them to ``rasterize(..., bins=...)`` for the segment's
    iterations: Gaussian centers move ~1e-4 world units/iter at the
    mapping LRs (<0.2 px), far inside the 3-sigma rect slack, so reusing
    a segment-start bin is exact up to entries entering/leaving a tile's
    fringe. Fresh per-render validity (near-cull) is re-applied at
    render time via the entry mask.

    Returns (entry_gauss (n_tiles, K) int32, entry_mask (n_tiles, K) bool).
    (The inverse Gaussian->entry map of _bin_gaussians(return_inverse=True)
    is NOT emitted: its gather-based pack backward measured slower than
    XLA's scatter-add on the v5 chip, so nothing consumes it by default.)
    """
    pre = _preprocess(means_cam, quats_wxyz, scales, opacities, K4, cfg)
    return _bin_gaussians(pre, cfg)


def compute_bin_plan(entry_gauss: jax.Array, entry_mask: jax.Array,
                     n_gauss: int, cfg: "RasterizeConfig"):
    """Segment-reduction plan for the pack BACKWARD, built once per
    cached binning (amortized across an optimization segment like the
    bins themselves).

    The pack forward is one row gather ``raw[entry_gauss]``; its backward
    is the entry -> Gaussian gradient reduction, which XLA lowers to a
    scatter-add that re-sorts its indices on EVERY call (~7.6 ms at the
    bench load — the single slowest stage of the round-4 kernel profile).
    Since the binning is frozen for a whole optimization segment, the
    sort can be hoisted here: a permutation of the flat entry positions
    grouped by Gaussian id plus per-Gaussian segment bounds turn the
    per-step reduction into gather + per-segment sum (no per-step sort,
    see gs_raster_pallas._gather_entries_planned).

    Also fixes the occupancy-sorted tile order for the segment (the sort
    key — bin-time entry counts — only changes marginally under fresh
    per-render validity, and the order only affects batch balance, not
    results).

    Returns (order, inv_order, perm, bounds):
      order (n_tiles,)      occupancy-descending tile permutation
      inv_order (n_tiles,)  its inverse
      perm (n_tiles * K,)   flat entry positions IN SORTED-TILE LAYOUT,
                            grouped by Gaussian id (masked entries last)
      bounds (n_gauss + 1,) segment boundaries into perm per Gaussian
    """
    counts = jnp.sum(entry_mask.astype(jnp.int32), axis=1)
    order = jnp.argsort(-counts)
    inv_order = jnp.argsort(order)
    eg_s = entry_gauss[order]
    em_s = entry_mask[order]
    # masked entries -> sentinel segment n_gauss (falls outside bounds)
    flat_g = jnp.where(em_s, eg_s, n_gauss).reshape(-1)
    perm = jnp.argsort(flat_g)
    g_sorted = flat_g[perm]
    bounds = jnp.searchsorted(
        g_sorted, jnp.arange(n_gauss + 1, dtype=flat_g.dtype))
    return order, inv_order, perm.astype(jnp.int32), \
        bounds.astype(jnp.int32)


# ---------------------------------------------------------------------------
# blending
# ---------------------------------------------------------------------------

def _blend_tiles(pre, colors, entry_gauss, entry_mask, bg, cfg: RasterizeConfig):
    """Per-tile chunked front-to-back blending (renderCUDA semantics)."""
    n_tiles, K = entry_gauss.shape
    C = min(cfg.chunk, K)
    n_chunks = (K + C - 1) // C
    if n_chunks * C != K:
        # pad the entry axis to a chunk multiple with masked-off entries
        # so any (max_per_tile, chunk) combination is valid
        pad = n_chunks * C - K
        entry_gauss = jnp.pad(entry_gauss, ((0, 0), (0, pad)))
        entry_mask = jnp.pad(entry_mask, ((0, 0), (0, pad)))
        K = n_chunks * C
    px_per_tile = TILE * TILE

    # pixel coordinates per tile (n_tiles, 256, 2)
    ty = jnp.arange(cfg.tiles_y)
    txs = jnp.arange(cfg.tiles_x)
    tgy, tgx = jnp.meshgrid(ty, txs, indexing="ij")
    base = jnp.stack([tgx.reshape(-1) * TILE, tgy.reshape(-1) * TILE], axis=-1)
    oy, ox = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)
    pix = (base[:, None, :] + offs[None, :, :]).astype(jnp.float32)

    # gather per-entry Gaussian attributes, grouped into chunks
    def gather(x):
        g = x[entry_gauss]  # (n_tiles, K, ...)
        return g.reshape((n_tiles, n_chunks, C) + x.shape[1:]).swapaxes(0, 1)

    g_mean2d = gather(pre["mean2d"])
    g_conic = gather(pre["conic"])
    g_opac = gather(pre["opacity"])
    g_color = gather(colors)
    g_t = gather(pre["t_center"])
    g_rayp = gather(pre["ray_plane"])
    g_camp = gather(pre["cam_plane"])
    g_norm = gather(pre["normal"])
    g_vp = gather(pre["view_point"])
    g_mask = entry_mask.reshape(n_tiles, n_chunks, C).swapaxes(0, 1)

    def chunk_step(carry, xs):
        (T, wsum, Csum, Dsum, Coordsum, Nsum, mDepth, mCoord, anyc, done) = carry
        mean2d, conic, opac, color, tc, rayp, camp, norm, vp, mask = xs

        d = mean2d[:, None, :, :] - pix[:, :, None, :]  # (tiles, px, C, 2)
        dx = d[..., 0]
        dy = d[..., 1]
        power = (-0.5 * (conic[:, None, :, 0] * dx * dx
                         + conic[:, None, :, 2] * dy * dy)
                 - conic[:, None, :, 1] * dx * dy)
        alpha = jnp.minimum(0.99, opac[:, None, :] * jnp.exp(power))
        ok = (power <= 0) & (alpha >= ALPHA_MIN) & mask[:, None, :] \
            & ~done[..., None]
        alpha = jnp.where(ok, alpha, 0.0)

        # transmittance before each gaussian: T * prod_{k'<k} (1 - a_k')
        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=-1)
        Tb = T[..., None] * jnp.concatenate(
            [jnp.ones_like(cum[..., :1]), cum[..., :-1]], axis=-1)
        # early termination: gaussian k kept only while Tb*(1-a) >= T_MIN;
        # once tripped the pixel stays done for all later chunks
        keep = jnp.cumprod((Tb * one_m >= T_MIN).astype(alpha.dtype), axis=-1)
        done = done | (keep[..., -1] < 0.5)
        alpha = alpha * keep
        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=-1)
        Tb = T[..., None] * jnp.concatenate(
            [jnp.ones_like(cum[..., :1]), cum[..., :-1]], axis=-1)
        aT = alpha * Tb  # (tiles, px, C)

        contrib = aT > 0
        Csum = Csum + jnp.einsum("tpc,tcf->tpf", aT, color)
        wsum = wsum + aT.sum(-1)

        # depth along ray: t = t_center + ray_plane . d
        t_all = (tc[:, None, :] + rayp[:, None, :, 0] * dx
                 + rayp[:, None, :, 1] * dy)
        Dsum = Dsum + (aT * t_all).sum(-1)

        coord = jnp.stack([
            vp[:, None, :, 0] + camp[:, None, :, 0] * dx + camp[:, None, :, 1] * dy,
            vp[:, None, :, 1] + camp[:, None, :, 2] * dx + camp[:, None, :, 3] * dy,
            vp[:, None, :, 2] + camp[:, None, :, 4] * dx + camp[:, None, :, 5] * dy,
        ], axis=-1)  # (tiles, px, C, 3)
        Coordsum = Coordsum + jnp.einsum("tpc,tpcf->tpf", aT, coord)
        Nsum = Nsum + jnp.einsum("tpc,tcf->tpf", aT, norm)

        # median: LAST contribution with Tb > 0.5. NOTE: bm is not
        # prefix-contiguous (mid-chunk entries can be rejected while
        # later ones contribute), so the index must be a masked max of
        # iota — sum(bm)-1 picks the wrong entry and its error depends
        # on the chunk size (which differs from the Pallas path).
        bm = median_gate(Tb) & contrib
        iota_e = jax.lax.broadcasted_iota(jnp.int32, bm.shape, bm.ndim - 1)
        idx = jnp.max(jnp.where(bm, iota_e, -1), axis=-1)  # (tiles, px)
        has = idx >= 0
        idx_c = jnp.maximum(idx, 0)
        md = jnp.take_along_axis(t_all, idx_c[..., None], axis=-1)[..., 0]
        mc = jnp.take_along_axis(coord, idx_c[..., None, None], axis=-2)[..., 0, :]
        mDepth = jnp.where(has, md, mDepth)
        mCoord = jnp.where(has[..., None], mc, mCoord)
        anyc = anyc | contrib.any(-1)

        T = T * cum[..., -1]
        return (T, wsum, Csum, Dsum, Coordsum, Nsum, mDepth, mCoord, anyc,
                done), None

    init = (
        jnp.ones((n_tiles, px_per_tile)),
        jnp.zeros((n_tiles, px_per_tile)),
        jnp.zeros((n_tiles, px_per_tile, colors.shape[-1])),
        jnp.zeros((n_tiles, px_per_tile)),
        jnp.zeros((n_tiles, px_per_tile, 3)),
        jnp.zeros((n_tiles, px_per_tile, 3)),
        jnp.zeros((n_tiles, px_per_tile)),
        jnp.zeros((n_tiles, px_per_tile, 3)),
        jnp.zeros((n_tiles, px_per_tile), bool),
        jnp.zeros((n_tiles, px_per_tile), bool),
    )
    xs = (g_mean2d, g_conic, g_opac, g_color, g_t, g_rayp, g_camp, g_norm,
          g_vp, g_mask)
    carry, _ = jax.lax.scan(jax.checkpoint(chunk_step), init, xs)
    return carry, pix


def _untile(x, cfg: RasterizeConfig):
    """(n_tiles, 256, ...) -> (H, W, ...) cropping the padded border."""
    trail = x.shape[2:]
    x = x.reshape((cfg.tiles_y, cfg.tiles_x, TILE, TILE) + trail)
    x = x.swapaxes(1, 2).reshape(
        (cfg.tiles_y * TILE, cfg.tiles_x * TILE) + trail)
    return x[: cfg.height, : cfg.width]


@partial(jax.jit, static_argnames=("cfg",))
def rasterize(means_cam: jax.Array, quats_wxyz: jax.Array, scales: jax.Array,
              opacities: jax.Array, colors: jax.Array, K4: jax.Array,
              cfg: RasterizeConfig, bg: Optional[jax.Array] = None,
              means2d_probe: Optional[jax.Array] = None,
              bins=None) -> Dict[str, jax.Array]:
    """Render one view. All Gaussian quantities in CAMERA frame.

    means_cam (P,3); quats_wxyz (P,4) normalized; scales (P,3) positive;
    opacities (P,) in [0,1]; colors (P,3); K4 = [fx, fy, cx, cy].
    means2d_probe: optional (P,2) zeros added to the projected centers —
    its cotangent is the viewspace positional gradient used by the
    densification criterion (replaces the CUDA screenspace_points hack).
    bins: optional (entry_gauss, entry_mask) from ``compute_bins`` — a
    cached binning reused across an optimization segment's iterations
    (fresh per-render validity is re-applied; see compute_bins).

    Returns H x W maps: color (H,W,3), alpha, depth, mdepth, coord,
    mcoord, normal, plus per-Gaussian radii and visibility.
    """
    if bg is None:
        bg = jnp.zeros(3, means_cam.dtype)
    pre = _preprocess(means_cam, quats_wxyz, scales, opacities, K4, cfg)
    if means2d_probe is not None:
        pre["mean2d"] = pre["mean2d"] + means2d_probe
    if bins is None:
        entry_gauss, entry_mask = _bin_gaussians(pre, cfg)
    else:
        entry_gauss, entry_mask = bins[0], bins[1]
        entry_mask = entry_mask & pre["valid"][entry_gauss]
    carry, _ = _blend_tiles(pre, colors, entry_gauss, entry_mask, bg, cfg)
    (T, wsum, Csum, Dsum, Coordsum, Nsum, mDepth, mCoord, anyc, _done) = carry

    fx, fy, cx, cy = K4[0], K4[1], K4[2], K4[3]
    color = _untile(Csum, cfg) + _untile(T, cfg)[..., None] * bg
    alpha = _untile(wsum, cfg)
    anyc2 = _untile(anyc, cfg)
    w = _untile(wsum, cfg)
    w_safe = jnp.where(anyc2, jnp.maximum(w, 1e-12), 1.0)

    # per-pixel ray norm ln (renderCUDA:465: uses W/2, H/2 centers)
    yy, xx = jnp.meshgrid(jnp.arange(cfg.height, dtype=jnp.float32),
                          jnp.arange(cfg.width, dtype=jnp.float32),
                          indexing="ij")
    pnx = (xx - cfg.width / 2.0) / fx
    pny = (yy - cfg.height / 2.0) / fy
    ln = jnp.sqrt(pnx * pnx + pny * pny + 1.0)

    depth = jnp.where(anyc2, _untile(Dsum, cfg) / ln / w_safe, 0.0)
    mdepth = _untile(mDepth, cfg) / ln
    coord = jnp.where(anyc2[..., None], _untile(Coordsum, cfg) / w_safe[..., None], 0.0)
    mcoord = _untile(mCoord, cfg)
    nsum = _untile(Nsum, cfg)
    # eps inside sqrt: norm() has NaN grad at 0 (empty pixels)
    nlen = jnp.sqrt(jnp.sum(nsum * nsum, axis=-1, keepdims=True)
                    + NORMALIZE_EPS ** 2)
    normal = jnp.where(anyc2[..., None], nsum / nlen, 0.0)

    return {
        "color": color, "alpha": alpha, "depth": depth, "mdepth": mdepth,
        "coord": coord, "mcoord": mcoord, "normal": normal,
        "radii": pre["radius"], "visibility": pre["valid"] & (pre["radius"] > 0),
    }
