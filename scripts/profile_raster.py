"""Stage-level timing of the Gaussian rasterizer at the bench load.

Times (on the default backend — run on the TPU):
  bin      preprocess + tile binning (the per-render sort)
  pack     entry gather/packing (+ basis planes)
  blend    the tile-blend alone (Pallas kernel or XLA scan)
  fwd/bwd  full rasterize forward / gradient
for both binning key modes (fused uint32 vs exact 2-key) and both
backends (XLA, Pallas), so the per-render budget of the mapping loop
(slam/mapping.py optimize: renders = iters x window) is attributable.

Usage:  python scripts/profile_raster.py [N_pow2=17] [H=384] [W=512]
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

from cut3r_slam_tpu.ops.gs_raster import (  # noqa: E402
    RasterizeConfig, rasterize, _preprocess, _bin_gaussians)


def timed(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    n_pow = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    N = 2 ** n_pow
    print(f"backend={jax.default_backend()} N={N} {W}x{H}", flush=True)

    rng = np.random.default_rng(0)
    means = jnp.asarray(np.concatenate(
        [rng.uniform(-2, 2, (N, 2)), rng.uniform(2, 6, (N, 1))], 1),
        jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N, 1))
    scales = jnp.asarray(rng.uniform(-5.0, -3.5, (N, 3)), jnp.float32)
    scales = jnp.exp(scales)
    opac = jnp.full((N,), 0.7)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    K4 = jnp.asarray([0.9 * W, 0.9 * W, W / 2, H / 2], jnp.float32)

    for fused in (True, False):
        cfg = RasterizeConfig(height=H, width=W, max_per_tile=512,
                              fused_bin_key=fused)

        @jax.jit
        def bin_only(m, q, s, o):
            pre = _preprocess(m, q, s, o, K4, cfg)
            eg, em = _bin_gaussians(pre, cfg)
            return eg.sum(), em.sum()

        ms, _ = timed(bin_only, means, quats, scales, opac)
        print(f"fused={int(fused)}  preprocess+bin: {ms:8.3f} ms",
              flush=True)

    for use_pallas in ((False, True) if jax.default_backend() == "tpu"
                       else (False,)):
        cfg = RasterizeConfig(height=H, width=W, max_per_tile=512,
                              use_pallas=use_pallas)
        name = "pallas" if use_pallas else "xla"
        if use_pallas:
            from cut3r_slam_tpu.ops.gs_raster_pallas import rasterize_pallas
            rfn = lambda *a: rasterize_pallas(*a, K4, cfg)  # noqa: E731
        else:
            rfn = lambda *a: rasterize(*a, K4, cfg)  # noqa: E731

        fwd = jax.jit(lambda m, q, s, o, c: rfn(m, q, s, o, c)["color"])
        ms, _ = timed(fwd, means, quats, scales, opac, colors)
        print(f"{name:6s} fwd: {ms:8.3f} ms", flush=True)

        bwd = jax.jit(jax.grad(
            lambda m, q, s, o, c: rfn(m, q, s, o, c)["color"].mean(),
            argnums=(0, 4)))
        ms, _ = timed(bwd, means, quats, scales, opac, colors)
        print(f"{name:6s} fwd+bwd: {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
