"""Component breakdown of ONE fused window-optimization grad step.

The fused V-view grad step measured ~556 ms (55.6 ms/view) at the bench
load while the rasterizer alone is ~22 ms/view fwd+bwd — this script
attributes the remainder:

  render_fwd       fused V-view render, forward only (cached bins)
  render_fwd+bwd   grad of sum(color)+sum(depth) wrt params — raster
                   fwd+bwd without any loss math
  loss_on_maps     grad of the full per-view loss terms wrt the RENDERED
                   MAPS (maps treated as inputs) — SSIM + depth_to_normal
                   + exposure + iso cost, no raster
  full_step        value_and_grad of the real window loss (the
                   production program)

Usage: python scripts/profile_window_breakdown.py [V=10]
"""
import dataclasses
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

from cut3r_slam_tpu.slam.mapping import MappingBackend, MappingConfig  # noqa
from cut3r_slam_tpu.slam.gaussian_map import GaussianArena  # noqa
from cut3r_slam_tpu.slam.renderer import render_window  # noqa
from cut3r_slam_tpu.geometry.lie import se3_exp, se3_matrix  # noqa


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])


def timed(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    H, W = 384, 512
    N = 2 ** 17
    K4 = jnp.asarray([0.9 * W, 0.9 * W, W / 2, H / 2], jnp.float32)
    rng = np.random.default_rng(0)
    on_tpu = jax.devices()[0].platform == "tpu"
    print(f"backend={jax.devices()[0].platform} V={V} N={N}", flush=True)

    cfg = MappingConfig(height=H, width=W, capacity=N, cam_capacity=32,
                        window_size=V,
                        raster_backend="pallas" if on_tpu else "xla")
    be = MappingBackend(cfg, np.asarray(K4))
    arena = GaussianArena.empty(N)
    arena = dataclasses.replace(
        arena,
        xyz=jnp.asarray(rng.uniform(-2, 2, (N, 3)), jnp.float32)
            .at[:, 2].add(4.0),
        f_dc=jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32),
        opacity_logit=jnp.zeros((N,)),
        log_scales=jnp.full((N, 3), -4.0),
        quat=jnp.tile(jnp.asarray([1., 0, 0, 0]), (N, 1)),
        alive=jnp.ones((N,), bool))
    params = arena.params()
    w2c = jnp.stack([
        se3_matrix(se3_exp(jnp.asarray(
            [0.02 * i, -0.01 * i, 0.015 * i, 0.005 * i, 0.0, 0.003 * i],
            jnp.float32))) for i in range(V)])
    images = jnp.asarray(rng.uniform(0, 1, (V, H, W, 3)), jnp.float32)
    depths = jnp.asarray(rng.uniform(2, 6, (V, H, W)), jnp.float32)
    weights = jnp.ones((V,))
    pd = {"t": jnp.zeros((V, 3)), "r": jnp.zeros((V, 3))}
    ex = {"a": jnp.stack([jnp.eye(3)] * V), "b": jnp.zeros((V, 3))}
    bins = jax.block_until_ready(
        jax.jit(be._bin_window)(params, arena.alive, w2c))
    rcfg = be.raster_cfg

    @jax.jit
    def render_fwd(params):
        return render_window(params, arena.alive, w2c, K4, rcfg,
                             trans_deltas=pd["t"], rot_deltas=pd["r"],
                             bins=bins)["color"]

    print(f"render_fwd     : {timed(render_fwd, params):8.2f} ms",
          flush=True)

    @jax.jit
    def render_fb(params):
        def f(p):
            o = render_window(p, arena.alive, w2c, K4, rcfg,
                              trans_deltas=pd["t"], rot_deltas=pd["r"],
                              bins=bins)
            return o["color"].sum() + o["depth"].sum()
        return jax.grad(f)(params)

    print(f"render_fwd+bwd : {timed(render_fb, params):8.2f} ms",
          flush=True)

    # loss terms on the maps alone (no raster in the graph)
    maps = jax.block_until_ready(jax.jit(
        lambda p: render_window(p, arena.alive, w2c, K4, rcfg,
                                bins=bins))(params))
    vis = maps["visibility"]

    @jax.jit
    def loss_on_maps(color, depth, params, ex):
        # direct re-implementation: same math as mapping._view_terms
        from cut3r_slam_tpu.ops.ssim import ssim
        from cut3r_slam_tpu.geometry.pointmap import depth_to_normal

        def view_terms(img, d, ea, eb, image, gt_d, v):
            img = img @ ea + eb
            rgb_l = 0.8 * jnp.abs(image - img).mean() \
                + 0.2 * (1 - ssim(img, image))
            dmask = jax.lax.stop_gradient((gt_d > 1e-3) & (d > 1e-3))
            inv_d = jnp.where(dmask, 1.0 / jnp.maximum(d, 1e-6)
                              - 1.0 / jnp.maximum(gt_d, 1e-6), 0.0)
            depth_l = jnp.abs(inv_d).sum() / jnp.maximum(dmask.sum(), 1.0)
            dn = depth_to_normal(d, K4)
            gdn = depth_to_normal(gt_d, K4)
            norm_l = ((1 - (dn * gdn).sum(-1)) * dmask).sum() \
                / jnp.maximum(dmask.sum(), 1.0)
            scales = jnp.exp(params["log_scales"])
            iso = (jnp.abs(scales - scales.mean(1, keepdims=True)).mean(1)
                   * v).sum() / jnp.maximum(v.sum(), 1.0)
            return rgb_l + 0.5 * depth_l + 0.05 * norm_l + 10.0 * iso

        def total(c, d, e):
            ls = jax.vmap(view_terms)(c, d, e["a"], e["b"], images,
                                      depths, vis)
            return (ls * weights).sum()

        return jax.grad(total, argnums=(0, 1, 2))(color, depth, ex)

    print(f"loss_on_maps   : "
          f"{timed(loss_on_maps, maps['color'], maps['depth'], params, ex):8.2f}"
          f" ms", flush=True)

    def loss(params, pd, ex):
        tot, _ = be._window_loss_raw(params, pd, ex, arena.alive,
                                     images, depths, w2c, weights,
                                     True, bins)
        return tot

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    print(f"full_step      : {timed(step, params, pd, ex):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
