"""Pallas TPU kernel for the 3DGS tile blending forward pass.

The XLA formulation in ops/gs_raster.py materializes the per-tile gathered
Gaussian attributes in HBM and streams them through a lax.scan. This
kernel fuses the whole per-tile front-to-back blend into one VMEM-resident
program: grid = (n_tiles,), each program blends its tile's ``K`` depth-
sorted entries in chunks — alphas on the VPU, accumulations as
(pixels x chunk) @ (chunk x c) MXU contractions, transmittance as a
log-space cumulative product — writing color / alpha-weight / expected +
median ray depth / normals for its 16x16 pixels.

Forward-only (rendering, eval, data_update, viz). Training paths keep the
autodiff XLA implementation; a custom-VJP Pallas backward is the natural
next step.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gs_raster import (RasterizeConfig, TILE, ALPHA_MIN, T_MIN,
                        NORMALIZE_EPS, _preprocess, _bin_gaussians, _untile)

__all__ = ["rasterize_pallas_forward"]

PX = TILE * TILE  # 256 pixels per tile


def _blend_tile_kernel(pix_ref, mean2d_ref, conic_ref, opac_ref, color_ref,
                       t_ref, rayp_ref, norm_ref, mask_ref,
                       color_out, weight_out, depth_out, mdepth_out,
                       norm_out, tleft_out, *, chunk: int, k_entries: int):
    """One grid step = one tile.

    pix: (PX, 2) pixel coords; per-entry attrs (K, ...) depth-sorted;
    outputs (PX, c).
    """
    n_chunks = k_entries // chunk
    pix = pix_ref[:]  # (PX, 2)

    def chunk_body(ci, carry):
        T, wsum, csum, dsum, nsum, mdep = carry
        sl = pl.ds(ci * chunk, chunk)
        mean2d = mean2d_ref[sl, :]          # (C, 2)
        conic = conic_ref[sl, :]            # (C, 3)
        opac = opac_ref[sl, 0]              # (C,)
        color = color_ref[sl, :]            # (C, 3)
        tc = t_ref[sl, 0]                   # (C,)
        rayp = rayp_ref[sl, :]              # (C, 2)
        norm = norm_ref[sl, :]              # (C, 3)
        mask = mask_ref[sl, 0]              # (C,)

        dx = mean2d[None, :, 0] - pix[:, 0:1]   # (PX, C)
        dy = mean2d[None, :, 1] - pix[:, 1:2]
        power = (-0.5 * (conic[None, :, 0] * dx * dx
                         + conic[None, :, 2] * dy * dy)
                 - conic[None, :, 1] * dx * dy)
        alpha = jnp.minimum(0.99, opac[None, :] * jnp.exp(power))
        ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & (mask[None, :] > 0)
        alpha = jnp.where(ok, alpha, 0.0)

        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=-1)
        Tb = T * jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=-1)
        keep = jnp.cumprod((Tb * one_m >= T_MIN).astype(alpha.dtype), axis=-1)
        alpha = alpha * keep
        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=-1)
        Tb = T * jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=-1)
        aT = alpha * Tb  # (PX, C)

        csum = csum + jnp.dot(aT, color, preferred_element_type=jnp.float32)
        wsum = wsum + jnp.sum(aT, axis=-1, keepdims=True)
        t_all = tc[None, :] + rayp[None, :, 0] * dx + rayp[None, :, 1] * dy
        dsum = dsum + jnp.sum(aT * t_all, axis=-1, keepdims=True)
        nsum = nsum + jnp.dot(aT, norm, preferred_element_type=jnp.float32)

        contrib = aT > 0.0
        bm = (Tb > 0.5) & contrib
        idx = jnp.sum(bm.astype(jnp.int32), axis=-1, keepdims=True) - 1
        has = idx >= 0
        take = jnp.sum(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, bm.shape, 1) == idx,
            t_all, 0.0), axis=-1, keepdims=True)
        mdep = jnp.where(has, take, mdep)

        T = T * cum[:, -1:]
        return T, wsum, csum, dsum, nsum, mdep

    init = (jnp.ones((PX, 1), jnp.float32),
            jnp.zeros((PX, 1), jnp.float32),
            jnp.zeros((PX, 3), jnp.float32),
            jnp.zeros((PX, 1), jnp.float32),
            jnp.zeros((PX, 3), jnp.float32),
            jnp.zeros((PX, 1), jnp.float32))
    T, wsum, csum, dsum, nsum, mdep = jax.lax.fori_loop(
        0, n_chunks, chunk_body, init)

    color_out[:] = csum
    weight_out[:] = wsum
    depth_out[:] = dsum
    mdepth_out[:] = mdep
    norm_out[:] = nsum
    tleft_out[:] = T


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def rasterize_pallas_forward(means_cam, quats_wxyz, scales, opacities,
                             colors, K4, cfg: RasterizeConfig,
                             bg=None, interpret: bool = False):
    """Forward-only render using the Pallas tile kernel.

    Same preprocess + binning as ops/gs_raster.rasterize; the per-tile
    blend runs as a Pallas program. Returns the same output dict minus
    coord/mcoord (unused outside training losses).
    """
    if bg is None:
        bg = jnp.zeros(3, means_cam.dtype)
    pre = _preprocess(means_cam, quats_wxyz, scales, opacities, K4, cfg)
    entry_gauss, entry_mask = _bin_gaussians(pre, cfg)
    n_tiles, K = entry_gauss.shape

    # pre-gather entry attributes (HBM-resident, tiled into the kernel)
    g_mean2d = pre["mean2d"][entry_gauss]
    g_conic = pre["conic"][entry_gauss]
    g_opac = pre["opacity"][entry_gauss][..., None]
    g_color = colors[entry_gauss]
    g_t = pre["t_center"][entry_gauss][..., None]
    g_rayp = pre["ray_plane"][entry_gauss]
    g_norm = pre["normal"][entry_gauss]
    g_mask = entry_mask.astype(jnp.float32)[..., None]

    # per-tile pixel coordinates
    ty = jnp.arange(cfg.tiles_y)
    txs = jnp.arange(cfg.tiles_x)
    tgy, tgx = jnp.meshgrid(ty, txs, indexing="ij")
    base = jnp.stack([tgx.reshape(-1) * TILE, tgy.reshape(-1) * TILE], -1)
    oy, ox = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], -1)
    pix = (base[:, None, :] + offs[None, :, :]).astype(jnp.float32)

    entry_spec = lambda c: pl.BlockSpec((1, K, c), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM)
    out_spec = lambda c: pl.BlockSpec((1, PX, c), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM)

    def kernel(pix_ref, m2d, con, opa, col, tt, rp, nr, mk,
               c_out, w_out, d_out, md_out, n_out, t_out):
        _blend_tile_kernel(
            pix_ref.at[0], m2d.at[0], con.at[0], opa.at[0], col.at[0],
            tt.at[0], rp.at[0], nr.at[0], mk.at[0],
            c_out.at[0], w_out.at[0], d_out.at[0], md_out.at[0],
            n_out.at[0], t_out.at[0],
            chunk=cfg.chunk, k_entries=K)

    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[out_spec(2), entry_spec(2), entry_spec(3), entry_spec(1),
                  entry_spec(3), entry_spec(1), entry_spec(2), entry_spec(3),
                  entry_spec(1)],
        out_specs=(out_spec(3), out_spec(1), out_spec(1), out_spec(1),
                   out_spec(3), out_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, PX, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 1), jnp.float32),
        ),
        interpret=interpret,
    )(pix, g_mean2d, g_conic, g_opac, g_color, g_t, g_rayp, g_norm, g_mask)

    csum, wsum, dsum, mdep, nsum, T = outs
    fx, fy = K4[0], K4[1]
    color_img = _untile(csum, cfg) + _untile(T, cfg) * bg
    w = _untile(wsum, cfg)[..., 0]
    anyc = w > 0
    w_safe = jnp.where(anyc, jnp.maximum(w, 1e-12), 1.0)
    yy, xx = jnp.meshgrid(jnp.arange(cfg.height, dtype=jnp.float32),
                          jnp.arange(cfg.width, dtype=jnp.float32),
                          indexing="ij")
    pnx = (xx - cfg.width / 2.0) / fx
    pny = (yy - cfg.height / 2.0) / fy
    ln = jnp.sqrt(pnx * pnx + pny * pny + 1.0)
    depth = jnp.where(anyc, _untile(dsum, cfg)[..., 0] / ln / w_safe, 0.0)
    mdepth = _untile(mdep, cfg)[..., 0] / ln
    nsum_img = _untile(nsum, cfg)
    nlen = jnp.sqrt(jnp.sum(nsum_img ** 2, -1, keepdims=True)
                    + NORMALIZE_EPS ** 2)
    normal = jnp.where(anyc[..., None], nsum_img / nlen, 0.0)
    return {"color": color_img, "alpha": w, "depth": depth,
            "mdepth": mdepth, "normal": normal,
            "radii": pre["radius"],
            "visibility": pre["valid"] & (pre["radius"] > 0)}
