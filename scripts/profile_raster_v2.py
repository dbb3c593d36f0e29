"""Timing of the round-4 rasterizer: new Pallas kernels (lane-major A,
roll-scan transmittance, merged bwd contraction, occupancy-sorted tiles)
with and without cached bins.

Usage:  python scripts/profile_raster_v2.py [N_pow2=17] [H=384] [W=512]
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
    RasterizeConfig, compute_bins)
from cut3r_slam_tpu.ops.gs_raster_pallas import rasterize_pallas  # noqa


def timed(fn, *args, iters=10):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n_pow = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    N = 2 ** n_pow
    cfg = RasterizeConfig(height=H, width=W, max_per_tile=512)
    print(f"backend={jax.default_backend()} N={N} {W}x{H}", flush=True)

    rng = np.random.default_rng(0)
    means = jnp.asarray(np.concatenate(
        [rng.uniform(-2, 2, (N, 2)), rng.uniform(2, 6, (N, 1))], 1),
        jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N, 1))
    scales = jnp.exp(jnp.asarray(rng.uniform(-5.0, -3.5, (N, 3)),
                                 jnp.float32))
    opac = jnp.full((N,), 0.7)
    colors = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    K4 = jnp.asarray([0.9 * W, 0.9 * W, W / 2, H / 2], jnp.float32)

    binf = jax.jit(lambda m, q, s, o: compute_bins(m, q, s, o, K4, cfg))
    ms = timed(binf, means, quats, scales, opac)
    bins = jax.block_until_ready(binf(means, quats, scales, opac))
    print(f"bins          : {ms:8.3f} ms", flush=True)

    fwd = jax.jit(lambda m, q, s, o, c, b: rasterize_pallas(
        m, q, s, o, c, K4, cfg, bins=b)["color"])
    ms = timed(fwd, means, quats, scales, opac, colors, None)
    print(f"fwd (self-bin): {ms:8.3f} ms", flush=True)
    ms = timed(fwd, means, quats, scales, opac, colors, bins)
    print(f"fwd (cached)  : {ms:8.3f} ms", flush=True)

    def loss(m, q, s, o, c, b):
        out = rasterize_pallas(m, q, s, o, c, K4, cfg, bins=b)
        return (out["color"].mean() + out["depth"].mean()
                + out["alpha"].mean() + out["normal"].mean())

    bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    ms = timed(bwd, means, quats, scales, opac, colors, None)
    print(f"fwd+bwd (self): {ms:8.3f} ms", flush=True)
    ms = timed(bwd, means, quats, scales, opac, colors, bins)
    print(f"fwd+bwd (cach): {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
