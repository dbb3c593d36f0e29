"""Attribute the fused multi-view render BACKWARD cost (V=10 bench load).

profile_window_breakdown measured render fwd 111 ms vs fwd+bwd 461 ms;
the blend kernel bwd (~69 ms) + pack scatter (~74 ms) explain less than
half of the 350 ms backward. This isolates, all at V=10, N=2^17:

  pre_fb        vmapped _preprocess fwd+bwd (sum of outputs)
  xform_fb      vmapped transform_to_frame fwd+bwd
  raw_fb        vmapped _build_raw(pre) fwd+bwd (incl preprocess)
  gather_fb     batched raw[eg] gather fwd+bwd (the scatter-add)
  assemble_fb   _assemble_A from gathered G fwd+bwd
  pack_full_fb  preprocess+raw+gather+assemble fwd+bwd (no blend)
  blend_fb      _blend_entries fwd+bwd GIVEN packed A
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cut3r_slam_tpu.ops.gs_raster import (  # noqa: E402
    RasterizeConfig, _preprocess, _bin_gaussians)
from cut3r_slam_tpu.ops import gs_raster_pallas as gp  # noqa: E402
from cut3r_slam_tpu.slam.renderer import transform_to_frame  # noqa: E402
from cut3r_slam_tpu.geometry.lie import se3_exp, se3_matrix  # noqa: E402


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])


def timed(name, fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    print(f"{name:<13}: {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
          flush=True)


def main():
    V, H, W = 10, 384, 512
    N = 2 ** 17
    K4 = jnp.asarray([0.9 * W, 0.9 * W, W / 2, H / 2], jnp.float32)
    cfg = RasterizeConfig(height=H, width=W, max_per_tile=512)
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} V={V} N={N}", flush=True)

    params = {
        "xyz": jnp.asarray(rng.uniform(-2, 2, (N, 3)), jnp.float32)
               .at[:, 2].add(4.0),
        "f_dc": jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32),
        "opacity_logit": jnp.zeros((N,)),
        "log_scales": jnp.full((N, 3), -4.0),
        "quat": jnp.tile(jnp.asarray([1., 0, 0, 0]), (N, 1)),
    }
    w2c = jnp.stack([
        se3_matrix(se3_exp(jnp.asarray(
            [0.02 * i, -0.01 * i, 0.015 * i, 0.005 * i, 0.0, 0.003 * i],
            jnp.float32))) for i in range(V)])
    scales = jnp.exp(params["log_scales"])
    opac = jax.nn.sigmoid(params["opacity_logit"])
    colors = params["f_dc"]

    def mv_pre(params):
        mc, qc = jax.vmap(lambda w: transform_to_frame(params, w))(w2c)
        return jax.vmap(lambda m, q: _preprocess(
            m, q, jnp.exp(params["log_scales"]),
            jax.nn.sigmoid(params["opacity_logit"]), K4, cfg))(mc, qc)

    @jax.jit
    def pre_fb(params):
        def f(p):
            pre = mv_pre(p)
            return sum(jnp.sum(v.astype(jnp.float32))
                       for v in jax.tree.leaves(pre))
        return jax.grad(f)(params)

    timed("pre_fb", pre_fb, params)

    @jax.jit
    def xform_fb(params):
        def f(p):
            mc, qc = jax.vmap(lambda w: transform_to_frame(p, w))(w2c)
            return mc.sum() + qc.sum()
        return jax.grad(f)(params)

    timed("xform_fb", xform_fb, params)

    @jax.jit
    def raw_fb(params):
        def f(p):
            pre = mv_pre(p)
            raw = jax.vmap(lambda pr: gp._build_raw(pr, p["f_dc"]))(pre)
            return raw.sum()
        return jax.grad(f)(params)

    timed("raw_fb", raw_fb, params)

    # fixed bins from current geometry
    pre0 = jax.jit(mv_pre)(params)
    eg, em = jax.jit(jax.vmap(lambda p: _bin_gaussians(p, cfg)))(pre0)
    eg = jax.block_until_ready(eg)

    @jax.jit
    def gather_fb(params):
        def f(p):
            pre = mv_pre(p)
            raw = jax.vmap(lambda pr: gp._build_raw(pr, p["f_dc"]))(pre)
            G = jax.vmap(lambda r, e: r[e])(raw, eg)
            return G.sum()
        return jax.grad(f)(params)

    timed("gather_fb", gather_fb, params)

    @jax.jit
    def gather_mv_fb(params):
        def f(p):
            pre = mv_pre(p)
            raw = jax.vmap(lambda pr: gp._build_raw(pr, p["f_dc"]))(pre)
            return gp._gather_mv(raw, eg).sum()
        return jax.grad(f)(params)

    timed("gather_mv_fb", gather_mv_fb, params)

    ox1, oy1 = gp._tile_origins(cfg)

    @jax.jit
    def pack_full_fb(params):
        def f(p):
            pre = mv_pre(p)
            raw = jax.vmap(lambda pr: gp._build_raw(pr, p["f_dc"]))(pre)
            G = gp._gather_mv(raw, eg)
            A = gp._assemble_A(
                G.reshape(V * cfg.n_tiles, cfg.max_per_tile, gp.NCH),
                jnp.tile(ox1, (V,)), jnp.tile(oy1, (V,)),
                em.reshape(V * cfg.n_tiles, cfg.max_per_tile))
            return A.sum()
        return jax.grad(f)(params)

    timed("pack_full_fb", pack_full_fb, params)

    # blend alone given packed A
    @jax.jit
    def mk_A(params):
        pre = mv_pre(params)
        raw = jax.vmap(lambda pr: gp._build_raw(pr, params["f_dc"]))(pre)
        G = jax.vmap(lambda r, e: r[e])(raw, eg)
        A = gp._assemble_A(
            G.reshape(V * cfg.n_tiles, cfg.max_per_tile, gp.NCH),
            jnp.tile(ox1, (V,)), jnp.tile(oy1, (V,)),
            em.reshape(V * cfg.n_tiles, cfg.max_per_tile))
        _, chunk = gp._pick_tb_chunk(V * cfg.n_tiles, cfg.chunk)
        return gp._pad_entries(A, chunk), \
            jnp.sum(em.astype(jnp.int32), axis=2).reshape(-1)

    A, counts = jax.block_until_ready(mk_A(params))

    @jax.jit
    def blend_fb(A):
        def f(a):
            outs = gp._blend_entries((cfg.chunk, False), counts, a)
            return sum(o.sum() for o in outs)
        return jax.grad(f)(A)

    timed("blend_fb", blend_fb, A)


if __name__ == "__main__":
    main()
