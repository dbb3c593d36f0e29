"""Fine-grained stage timing of the Pallas rasterizer at the bench load.

Splits the render into:
  pre        _preprocess alone
  pre+bin    preprocess + tile binning (sort)
  pack       _pack_entries gather/packing GIVEN precomputed bins
  blend_f    the Pallas forward blend GIVEN packed A
  blend_b    the Pallas backward kernel GIVEN packed A + cotangents
  pack_bwd   d(pack)/d(attrs) scatter GIVEN dA  (via jax.vjp)
so the 36 ms of "pack+blend" in profile_raster.py is attributable.

Usage:  python scripts/profile_raster_stages.py [N_pow2=17] [H=384] [W=512]
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


def _sync(out):
    """Device sync via a 1-element host readback — the axon tunnel does
    NOT honor block_until_ready (measured: chained-dependency timings
    are ~1000x the block_until_ready ones for small ops), so every
    timing loop must end in an actual readback. The device executes its
    queue serially, so syncing the last result syncs the whole loop."""
    leaf = jax.tree.leaves(out)[0]
    _ = np.asarray(leaf.ravel()[0])


def timed(fn, *args, iters=10):
    out = fn(*args)
    _sync(out)  # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    n_pow = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    N = 2 ** n_pow
    cfg = RasterizeConfig(height=H, width=W, max_per_tile=512)
    print(f"backend={jax.default_backend()} N={N} {W}x{H} "
          f"tiles={cfg.n_tiles}", flush=True)

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

    @jax.jit
    def pre_only(m, q, s, o):
        pre = _preprocess(m, q, s, o, K4, cfg)
        return pre["mean2d"].sum()

    ms, _ = timed(pre_only, means, quats, scales, opac)
    print(f"pre      : {ms:8.3f} ms", flush=True)

    @jax.jit
    def bins_fn(m, q, s, o):
        pre = _preprocess(m, q, s, o, K4, cfg)
        eg, em, _ = _bin_gaussians(pre, cfg, return_inverse=True)
        return eg, em

    ms, (eg, em) = timed(bins_fn, means, quats, scales, opac)
    eg = jax.block_until_ready(eg)
    cnts = np.asarray(em.sum(1))
    print(f"pre+bin  : {ms:8.3f} ms   counts mean={cnts.mean():.0f} "
          f"max={cnts.max()} zero_tiles={(cnts == 0).sum()}", flush=True)

    @jax.jit
    def pack_fn(m, q, s, o, c, eg, em):
        pre = _preprocess(m, q, s, o, K4, cfg)
        A = gp._pack_entries(pre, c, eg, em, cfg)
        _, chunk = gp._pick_tb_chunk(cfg.n_tiles, cfg.chunk)
        return gp._pad_entries(A, chunk)

    ms, A = timed(pack_fn, means, quats, scales, opac, colors, eg, em)
    A = jax.block_until_ready(A)
    print(f"pre+pack : {ms:8.3f} ms   A {A.shape}", flush=True)

    counts = jnp.sum(em.astype(jnp.int32), axis=1)

    @jax.jit
    def blend_f(counts, A):
        return gp._blend_call((cfg.chunk, False), counts, A)

    ms, outs = timed(blend_f, counts, A)
    print(f"blend_f  : {ms:8.3f} ms", flush=True)

    # residual-emitting forward (the VJP's forward: + per-chunk T_in)
    @jax.jit
    def blend_fres(counts, A):
        return gp._blend_call((cfg.chunk, False), counts, A,
                              with_residuals=True)

    ms, (outs, tchk) = timed(blend_fres, counts, A)
    print(f"blend_fr : {ms:8.3f} ms  (+T checkpoints)", flush=True)

    # backward kernel alone (one reverse pass over the chunks)
    gO = jnp.ones_like(outs[0])
    gd = jnp.ones_like(outs[1])
    gmd = jnp.ones_like(outs[2])
    gT = jnp.ones_like(outs[3])

    @jax.jit
    def blend_b(counts, A, tchk, tleft):
        return gp._blend_entries_bwd(
            (cfg.chunk, False), (counts, A, tchk, tleft),
            (gO, gd, gmd, gT))[1]

    ms, dA = timed(blend_b, counts, A, tchk, outs[3])
    print(f"blend_b  : {ms:8.3f} ms", flush=True)

    # pack backward: vjp of pack wrt gaussian attrs given dA
    def pack_for_vjp(m, q, s, o, c):
        pre = _preprocess(m, q, s, o, K4, cfg)
        A = gp._pack_entries(pre, c, eg, em, cfg)
        _, chunk = gp._pick_tb_chunk(cfg.n_tiles, cfg.chunk)
        return gp._pad_entries(A, chunk)

    @jax.jit
    def pack_bwd(m, q, s, o, c, dA):
        _, vjp = jax.vjp(pack_for_vjp, m, q, s, o, c)
        return vjp(dA)[0]

    ms, _ = timed(pack_bwd, means, quats, scales, opac, colors, dA)
    print(f"pack_bwd : {ms:8.3f} ms  (incl pack fwd re-run; scatter-add)",
          flush=True)

    # pack backward THROUGH THE INVERSE-MAP GATHER (_gather_entries) —
    # the path rasterize_pallas actually takes since round 4
    @jax.jit
    def inv_fn(m, q, s, o):
        pre = _preprocess(m, q, s, o, K4, cfg)
        return _bin_gaussians(pre, cfg, return_inverse=True)[2]

    inv = jax.block_until_ready(inv_fn(means, quats, scales, opac))

    def pack_inv_for_vjp(m, q, s, o, c):
        pre = _preprocess(m, q, s, o, K4, cfg)
        A = gp._pack_entries(pre, c, eg, em, cfg, inv_map=inv)
        _, chunk = gp._pick_tb_chunk(cfg.n_tiles, cfg.chunk)
        return gp._pad_entries(A, chunk)

    @jax.jit
    def pack_bwd_inv(m, q, s, o, c, dA):
        _, vjp = jax.vjp(pack_inv_for_vjp, m, q, s, o, c)
        return vjp(dA)[0]

    ms, _ = timed(pack_bwd_inv, means, quats, scales, opac, colors, dA)
    print(f"pack_bwd : {ms:8.3f} ms  (incl pack fwd re-run; inv gather)",
          flush=True)

    # ---- end-to-end differentiable render, cached bins (the mapping
    # optimizer's steady-state path) --------------------------------------
    from cut3r_slam_tpu.ops.gs_raster_pallas import rasterize_pallas
    from cut3r_slam_tpu.ops.gs_raster import compute_bins, compute_bin_plan

    bins = jax.block_until_ready(jax.jit(
        lambda m, q, s, o: compute_bins(m, q, s, o, K4, cfg)
    )(means, quats, scales, opac))

    @jax.jit
    def e2e_fwd(m, q, s, o, c):
        return rasterize_pallas(m, q, s, o, c, K4, cfg,
                                bins=bins)["color"].mean()

    ms, _ = timed(e2e_fwd, means, quats, scales, opac, colors)
    print(f"e2e_fwd  : {ms:8.3f} ms  (cached bins)", flush=True)

    @jax.jit
    def e2e_bwd(m, q, s, o, c):
        return jax.grad(
            lambda mm, cc: rasterize_pallas(
                mm, q, s, o, cc, K4, cfg, bins=bins)["color"].mean(),
            argnums=(0, 1))(m, c)

    ms, _ = timed(e2e_bwd, means, quats, scales, opac, colors)
    print(f"e2e_f+b  : {ms:8.3f} ms  (cached bins, grad means+colors)",
          flush=True)

    # ---- planned bins (round-5): bin-time segment-reduction plan
    # replaces the per-step scatter index sort in the pack backward ------
    import cut3r_slam_tpu.ops.gs_raster_pallas as _gp

    plan_t = jax.block_until_ready(jax.jit(
        lambda eg, em: compute_bin_plan(eg, em, N, cfg))(*bins))
    binsP = tuple(bins) + tuple(plan_t)

    @jax.jit
    def plan_ms(eg, em):
        return compute_bin_plan(eg, em, N, cfg)

    ms, _ = timed(plan_ms, *bins)
    print(f"bin_plan : {ms:8.3f} ms  (one-time per segment)", flush=True)

    for mode in ("segsum", "cumsum", "take"):
        _gp._PLAN_BWD_MODE = mode

        @jax.jit
        def e2e_bwd_plan(m, q, s, o, c):
            return jax.grad(
                lambda mm, cc: rasterize_pallas(
                    mm, q, s, o, cc, K4, cfg,
                    bins=binsP)["color"].mean(),
                argnums=(0, 1))(m, c)

        ms, _ = timed(e2e_bwd_plan, means, quats, scales, opac, colors)
        print(f"e2e_f+b  : {ms:8.3f} ms  (PLANNED bins, {mode})",
              flush=True)
    _gp._PLAN_BWD_MODE = "segsum"


if __name__ == "__main__":
    main()
