"""Pallas TPU kernels for the 3DGS tile blending — forward AND backward.

The XLA formulation in ops/gs_raster.py materializes the per-tile gathered
Gaussian attributes in HBM and streams them through a lax.scan. These
kernels fuse the whole per-tile front-to-back blend into VMEM-resident
programs: grid = (n_tiles,), each program blends its tile's ``K`` depth-
sorted entries in chunks — alphas on the VPU, accumulations as
(pixels x chunk) @ (chunk x c) MXU contractions, transmittance as a
cumulative product — writing color / alpha-weight / expected + median ray
depth / normals for its 16x16 pixels.

The backward mirrors the CUDA backward (/root/reference/thirdparty/
diff-gaussian-rasterization/cuda_rasterizer/backward.cu:145-632): where
the CUDA kernel walks entries back-to-front carrying suffix accumulators,
this kernel runs TWO forward chunk passes — pass 1 recomputes the blend
and reduces the per-pixel totals (Σ aT·b, contributor count, final T);
pass 2 recomputes each chunk again, turning running prefix sums into the
suffix terms  dL/dα_i = T_i·b_i − (S_i + g_T·T_final)/(1−α_i)  fully
vectorized over (pixels × chunk). All chunk math is identical to the
forward, so gradients match JAX AD of ops/gs_raster.py to float tolerance
(verified by tests/test_gs_raster_pallas.py).

``rasterize_pallas`` is the differentiable drop-in for ops/gs_raster.
rasterize (minus the coord/mcoord maps, unused by the mapping losses);
``rasterize_pallas_forward`` remains the forward-only entry.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gs_raster import (RasterizeConfig, TILE, ALPHA_MIN, T_MIN,
                        NORMALIZE_EPS, _preprocess, _bin_gaussians, _untile)

__all__ = ["rasterize_pallas_forward", "rasterize_pallas"]

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


def _blend_tile_bwd_kernel(pix_ref, mean2d_ref, conic_ref, opac_ref,
                           color_ref, t_ref, rayp_ref, norm_ref, mask_ref,
                           gc_ref, gw_ref, gd_ref, gmd_ref, gn_ref, gT_ref,
                           dm2d_out, dcon_out, dopa_out, dcol_out,
                           dt_out, drp_out, dnrm_out,
                           *, chunk: int, k_entries: int):
    """Backward for one tile: two forward chunk passes (see module doc).

    g*_ref are the (PX, c) output cotangents of this tile; d*_out are the
    (K, c) per-entry gradients.
    """
    n_chunks = k_entries // chunk
    pix = pix_ref[:]
    gc = gc_ref[:]          # (PX, 3) color cotangent
    gw = gw_ref[:]          # (PX, 1) weight/alpha cotangent
    gd = gd_ref[:]          # (PX, 1) expected-depth-sum cotangent
    gmd = gmd_ref[:]        # (PX, 1) median-depth cotangent
    gn = gn_ref[:]          # (PX, 3) normal-sum cotangent
    gT = gT_ref[:]          # (PX, 1) final-transmittance cotangent

    def chunk_vals(ci, T_in):
        """Recompute the forward chunk quantities (identical arithmetic)."""
        sl = pl.ds(ci * chunk, chunk)
        mean2d = mean2d_ref[sl, :]
        conic = conic_ref[sl, :]
        opac = opac_ref[sl, 0]
        color = color_ref[sl, :]
        tc = t_ref[sl, 0]
        rayp = rayp_ref[sl, :]
        norm = norm_ref[sl, :]
        mask = mask_ref[sl, 0]

        dx = mean2d[None, :, 0] - pix[:, 0:1]
        dy = mean2d[None, :, 1] - pix[:, 1:2]
        power = (-0.5 * (conic[None, :, 0] * dx * dx
                         + conic[None, :, 2] * dy * dy)
                 - conic[None, :, 1] * dx * dy)
        epow = jnp.exp(power)
        alpha_raw = opac[None, :] * epow
        alpha_c = jnp.minimum(0.99, alpha_raw)
        ok = (power <= 0.0) & (alpha_c >= ALPHA_MIN) & (mask[None, :] > 0)
        alpha0 = jnp.where(ok, alpha_c, 0.0)
        one_m0 = 1.0 - alpha0
        cum0 = jnp.cumprod(one_m0, axis=-1)
        Tb0 = T_in * jnp.concatenate(
            [jnp.ones_like(cum0[:, :1]), cum0[:, :-1]], axis=-1)
        keep = jnp.cumprod((Tb0 * one_m0 >= T_MIN).astype(jnp.float32),
                           axis=-1)
        alpha = alpha0 * keep
        one_m = 1.0 - alpha
        cum = jnp.cumprod(one_m, axis=-1)
        Tb = T_in * jnp.concatenate(
            [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=-1)
        aT = alpha * Tb
        t_all = tc[None, :] + rayp[None, :, 0] * dx + rayp[None, :, 1] * dy
        # per-(pixel,entry) cotangent of aT
        b = (jax.lax.dot_general(gc, color, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + gw + gd * t_all
             + jax.lax.dot_general(gn, norm, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32))
        # chain gate for dα -> (opacity, power): masked / terminated /
        # 0.99-clamped entries receive zero gradient (AD semantics)
        gate = jnp.where(ok & (alpha_raw < 0.99), keep, 0.0)
        T_out = T_in * cum[:, -1:]
        return dict(dx=dx, dy=dy, conic=conic, rayp=rayp, epow=epow,
                    alpha_raw=alpha_raw, alpha=alpha, Tb=Tb, aT=aT,
                    t_all=t_all, b=b, gate=gate, T_out=T_out)

    # ---- pass 1: per-pixel totals ------------------------------------
    def p1(ci, carry):
        T, tot_ab, last_chunk = carry
        v = chunk_vals(ci, T)
        tot_ab = tot_ab + jnp.sum(v["aT"] * v["b"], axis=-1, keepdims=True)
        bm = (v["Tb"] > 0.5) & (v["aT"] > 0.0)
        has = jnp.any(bm, axis=-1, keepdims=True)
        last_chunk = jnp.where(has, ci, last_chunk)
        return v["T_out"], tot_ab, last_chunk

    T_final, tot_ab, last_chunk = jax.lax.fori_loop(
        0, n_chunks, p1,
        (jnp.ones((PX, 1), jnp.float32), jnp.zeros((PX, 1), jnp.float32),
         jnp.full((PX, 1), -1, jnp.int32)))

    gTT = gT * T_final  # (PX, 1)

    # ---- pass 2: per-entry gradients via prefix -> suffix ------------
    def p2(ci, carry):
        T, pre_ab = carry
        v = chunk_vals(ci, T)
        ab = v["aT"] * v["b"]
        ab_inc = pre_ab + jnp.cumsum(ab, axis=-1)
        S = tot_ab - ab_inc  # suffix sum over later entries
        dalpha = v["Tb"] * v["b"] - (S + gTT) / (1.0 - v["alpha"])
        bm = (v["Tb"] > 0.5) & (v["aT"] > 0.0)
        # median grad target mirrors the forward's chunked formulation:
        # within the LAST chunk holding any bm entry, the slot at local
        # position count(bm)-1 receives the median-depth cotangent
        local_idx = jnp.sum(bm.astype(jnp.int32), axis=-1,
                            keepdims=True) - 1
        is_med = ((last_chunk == ci)
                  & (jax.lax.broadcasted_iota(jnp.int32, bm.shape, 1)
                     == local_idx))
        dt_all = gd * v["aT"] + gmd * jnp.where(is_med, 1.0, 0.0)

        dalpha_raw = dalpha * v["gate"]            # (PX, C)
        dpower = dalpha_raw * v["alpha_raw"]
        dx, dy = v["dx"], v["dy"]
        conic, rayp = v["conic"], v["rayp"]
        ddx = (dpower * (-(conic[None, :, 0] * dx + conic[None, :, 1] * dy))
               + dt_all * rayp[None, :, 0])
        ddy = (dpower * (-(conic[None, :, 2] * dy + conic[None, :, 1] * dx))
               + dt_all * rayp[None, :, 1])

        sl = pl.ds(ci * chunk, chunk)
        dm2d_out[sl, :] = jnp.stack(
            [jnp.sum(ddx, axis=0), jnp.sum(ddy, axis=0)], axis=-1)
        dcon_out[sl, :] = jnp.stack(
            [jnp.sum(dpower * (-0.5 * dx * dx), axis=0),
             jnp.sum(dpower * (-dx * dy), axis=0),
             jnp.sum(dpower * (-0.5 * dy * dy), axis=0)], axis=-1)
        dopa_out[sl, :] = jnp.sum(dalpha_raw * v["epow"], axis=0)[:, None]
        dcol_out[sl, :] = jax.lax.dot_general(
            v["aT"], gc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dt_out[sl, :] = jnp.sum(dt_all, axis=0)[:, None]
        drp_out[sl, :] = jnp.stack(
            [jnp.sum(dt_all * dx, axis=0),
             jnp.sum(dt_all * dy, axis=0)], axis=-1)
        dnrm_out[sl, :] = jax.lax.dot_general(
            v["aT"], gn, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        return v["T_out"], ab_inc[:, -1:]

    jax.lax.fori_loop(
        0, n_chunks, p2,
        (jnp.ones((PX, 1), jnp.float32), jnp.zeros((PX, 1), jnp.float32)))


def _tile_pixels(cfg: RasterizeConfig):
    ty = jnp.arange(cfg.tiles_y)
    txs = jnp.arange(cfg.tiles_x)
    tgy, tgx = jnp.meshgrid(ty, txs, indexing="ij")
    base = jnp.stack([tgx.reshape(-1) * TILE, tgy.reshape(-1) * TILE], -1)
    oy, ox = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], -1)
    return (base[:, None, :] + offs[None, :, :]).astype(jnp.float32)


def _entry_spec(K, c):
    return pl.BlockSpec((1, K, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _px_spec(c):
    return pl.BlockSpec((1, PX, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# custom-VJP blend over gathered per-tile entries
# ---------------------------------------------------------------------------

def _blend_call(meta, pix, m2d, con, opa, col, tt, rp, nr, mk):
    chunk, K, interpret = meta
    n_tiles = m2d.shape[0]

    def kernel(pix_ref, m2d_r, con_r, opa_r, col_r, tt_r, rp_r, nr_r, mk_r,
               c_out, w_out, d_out, md_out, n_out, t_out):
        _blend_tile_kernel(
            pix_ref.at[0], m2d_r.at[0], con_r.at[0], opa_r.at[0],
            col_r.at[0], tt_r.at[0], rp_r.at[0], nr_r.at[0], mk_r.at[0],
            c_out.at[0], w_out.at[0], d_out.at[0], md_out.at[0],
            n_out.at[0], t_out.at[0],
            chunk=chunk, k_entries=K)

    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[_px_spec(2), _entry_spec(K, 2), _entry_spec(K, 3),
                  _entry_spec(K, 1), _entry_spec(K, 3), _entry_spec(K, 1),
                  _entry_spec(K, 2), _entry_spec(K, 3), _entry_spec(K, 1)],
        out_specs=(_px_spec(3), _px_spec(1), _px_spec(1), _px_spec(1),
                   _px_spec(3), _px_spec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, PX, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PX, 1), jnp.float32),
        ),
        interpret=interpret,
    )(pix, m2d, con, opa, col, tt, rp, nr, mk)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _blend_entries(meta, pix, m2d, con, opa, col, tt, rp, nr, mk):
    """Differentiable per-tile blend. meta = (chunk, K, interpret)."""
    return _blend_call(meta, pix, m2d, con, opa, col, tt, rp, nr, mk)


def _blend_entries_fwd(meta, pix, m2d, con, opa, col, tt, rp, nr, mk):
    outs = _blend_call(meta, pix, m2d, con, opa, col, tt, rp, nr, mk)
    return outs, (pix, m2d, con, opa, col, tt, rp, nr, mk)


def _blend_entries_bwd(meta, res, cots):
    chunk, K, interpret = meta
    pix, m2d, con, opa, col, tt, rp, nr, mk = res
    gc, gw, gd, gmd, gn, gT = cots
    n_tiles = m2d.shape[0]

    def kernel(pix_ref, m2d_r, con_r, opa_r, col_r, tt_r, rp_r, nr_r, mk_r,
               gc_r, gw_r, gd_r, gmd_r, gn_r, gT_r,
               dm2d_o, dcon_o, dopa_o, dcol_o, dt_o, drp_o, dnrm_o):
        _blend_tile_bwd_kernel(
            pix_ref.at[0], m2d_r.at[0], con_r.at[0], opa_r.at[0],
            col_r.at[0], tt_r.at[0], rp_r.at[0], nr_r.at[0], mk_r.at[0],
            gc_r.at[0], gw_r.at[0], gd_r.at[0], gmd_r.at[0], gn_r.at[0],
            gT_r.at[0],
            dm2d_o.at[0], dcon_o.at[0], dopa_o.at[0], dcol_o.at[0],
            dt_o.at[0], drp_o.at[0], dnrm_o.at[0],
            chunk=chunk, k_entries=K)

    grads = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[_px_spec(2), _entry_spec(K, 2), _entry_spec(K, 3),
                  _entry_spec(K, 1), _entry_spec(K, 3), _entry_spec(K, 1),
                  _entry_spec(K, 2), _entry_spec(K, 3), _entry_spec(K, 1),
                  _px_spec(3), _px_spec(1), _px_spec(1), _px_spec(1),
                  _px_spec(3), _px_spec(1)],
        out_specs=(_entry_spec(K, 2), _entry_spec(K, 3), _entry_spec(K, 1),
                   _entry_spec(K, 3), _entry_spec(K, 1), _entry_spec(K, 2),
                   _entry_spec(K, 3)),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, K, 2), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, K, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, K, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, K, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, K, 2), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, K, 3), jnp.float32),
        ),
        interpret=interpret,
    )(pix, m2d, con, opa, col, tt, rp, nr, mk, gc, gw, gd, gmd, gn, gT)

    dm2d, dcon, dopa, dcol, dt, drp, dnrm = grads
    return (jnp.zeros_like(pix), dm2d, dcon, dopa, dcol, dt, drp, dnrm,
            jnp.zeros_like(mk))


_blend_entries.defvjp(_blend_entries_fwd, _blend_entries_bwd)


# ---------------------------------------------------------------------------
# full rasterize entries
# ---------------------------------------------------------------------------

def _rasterize_pallas_impl(means_cam, quats_wxyz, scales, opacities, colors,
                           K4, cfg: RasterizeConfig, bg, means2d_probe,
                           interpret: bool):
    if bg is None:
        bg = jnp.zeros(3, means_cam.dtype)
    pre = _preprocess(means_cam, quats_wxyz, scales, opacities, K4, cfg)
    if means2d_probe is not None:
        pre["mean2d"] = pre["mean2d"] + means2d_probe
    entry_gauss, entry_mask = _bin_gaussians(pre, cfg)
    _, K = entry_gauss.shape

    # gather entry attributes (differentiable: XLA scatter-adds on the
    # transpose route the per-entry grads back to per-Gaussian grads)
    g_mean2d = pre["mean2d"][entry_gauss]
    g_conic = pre["conic"][entry_gauss]
    g_opac = pre["opacity"][entry_gauss][..., None]
    g_color = colors[entry_gauss]
    g_t = pre["t_center"][entry_gauss][..., None]
    g_rayp = pre["ray_plane"][entry_gauss]
    g_norm = pre["normal"][entry_gauss]
    g_mask = entry_mask.astype(jnp.float32)[..., None]

    pix = _tile_pixels(cfg)
    outs = _blend_entries((cfg.chunk, K, interpret), pix, g_mean2d, g_conic,
                          g_opac, g_color, g_t, g_rayp, g_norm, g_mask)

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


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def rasterize_pallas(means_cam, quats_wxyz, scales, opacities, colors, K4,
                     cfg: RasterizeConfig, bg=None, means2d_probe=None,
                     interpret: bool = False):
    """Differentiable Pallas render — drop-in for ops/gs_raster.rasterize
    on the outputs the mapping losses consume (no coord/mcoord maps).
    Gradients flow to all Gaussian attributes, the probe, and (through
    means_cam / quats) the camera pose deltas.
    """
    return _rasterize_pallas_impl(means_cam, quats_wxyz, scales, opacities,
                                  colors, K4, cfg, bg, means2d_probe,
                                  interpret)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def rasterize_pallas_forward(means_cam, quats_wxyz, scales, opacities,
                             colors, K4, cfg: RasterizeConfig,
                             bg=None, interpret: bool = False):
    """Forward-only render using the Pallas tile kernel (rendering, eval,
    data_update, viz)."""
    return _rasterize_pallas_impl(means_cam, quats_wxyz, scales, opacities,
                                  colors, K4, cfg, bg, None, interpret)
