"""Measure the fused multi-view window render vs V sequential renders.

Chip microbench for slam/mapping.py window_loss_fused (ops/
gs_raster_pallas.rasterize_pallas_multi): times one window-optimization
gradient step — value_and_grad of the weighted V-view loss wrt Gaussian
params + pose deltas + exposure — through (a) the fused ONE-blend path
and (b) the sequential rematerialized scan, at the e2e bench load
(2^17 Gaussians, 512x384, V = window_size = 10, cached bins).

Usage: python scripts/profile_fused_window.py [V]
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

from cut3r_slam_tpu.slam.mapping import MappingBackend, MappingConfig
from cut3r_slam_tpu.slam.gaussian_map import GaussianArena
from cut3r_slam_tpu.geometry.lie import se3_exp, se3_matrix


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    H, W = 384, 512
    N = 2 ** 17
    K4 = np.asarray([0.9 * W, 0.9 * W, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(0)

    on_tpu = jax.devices()[0].platform == "tpu"
    print(f"backend={jax.devices()[0].platform} V={V} N={N}")

    results = {}
    for fused in (True, False):
        cfg = MappingConfig(
            height=H, width=W, capacity=N, cam_capacity=32, window_size=V,
            raster_backend="pallas" if on_tpu else "xla",
            fused_window_render=fused)
        be = MappingBackend(cfg, K4)
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
        bins = jax.jit(be._bin_window)(params, arena.alive, w2c)

        def loss(params, pd, ex):
            tot, _ = be._window_loss_raw(params, pd, ex, arena.alive,
                                         images, depths, w2c, weights,
                                         True, bins)
            return tot

        step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        t0 = time.perf_counter()
        out = jax.block_until_ready(step(params, pd, ex))
        t_compile = time.perf_counter() - t0
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(params, pd, ex)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        name = "fused" if fused else "seq_scan"
        results[name] = dt
        print(f"{name}: {dt * 1e3:.2f} ms per grad step "
              f"({dt * 1e3 / V:.2f} ms/view; compile+first {t_compile:.1f}s)")

    if len(results) == 2:
        print(f"speedup: {results['seq_scan'] / results['fused']:.2f}x")


if __name__ == "__main__":
    main()
