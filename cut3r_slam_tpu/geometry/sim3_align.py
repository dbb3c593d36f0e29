"""Weighted / robust Sim3 point-set alignment (Umeyama with confidence
weights and Huber IRLS).

TPU-native rebuild of /root/reference/hislam2/util/utils.py:913-1050
(weighted_estimate_sim3, huber_loss, robust_weighted_estimate_sim3,
weighted_align_point_maps). Differences from the numpy reference, by
design:

* shape-static: invalid points are handled by ZERO WEIGHTS instead of
  boolean indexing, so the whole pipeline jits and vmaps;
* the IRLS loop is a fixed-length ``lax.scan`` (the reference breaks
  early on convergence — extra iterations at the fixed point change the
  estimate only at float tolerance, verified in
  tests/test_sim3_align.py against a literal numpy oracle);
* everything is f64-free; the 3x3 SVD stays f32 (TPU native).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["weighted_estimate_sim3", "huber_loss",
           "robust_weighted_estimate_sim3", "weighted_align_point_maps"]


def weighted_estimate_sim3(src: jax.Array, tgt: jax.Array,
                           weights: jax.Array):
    """Closed-form weighted Sim3: returns (s, R, t) with
    tgt ≈ s · R @ src + t  (utils.py:913-948 semantics).

    src/tgt (N, 3); weights (N,) >= 0 (zeros = ignored points). The
    reference raises on total weight < 1e-6; here the scale/rotation
    degrade gracefully (identity-ish) — callers gate on weight mass.
    """
    w = weights / jnp.maximum(weights.sum(), 1e-12)
    mu_s = jnp.sum(w[:, None] * src, axis=0)
    mu_t = jnp.sum(w[:, None] * tgt, axis=0)
    sc = src - mu_s
    tc = tgt - mu_t
    scale_s = jnp.sqrt(jnp.sum(w * jnp.sum(sc * sc, axis=1)) + 1e-24)
    scale_t = jnp.sqrt(jnp.sum(w * jnp.sum(tc * tc, axis=1)) + 1e-24)
    s = scale_t / scale_s
    H = (s * sc * w[:, None]).T @ tc
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    # det<0 reflection fix (utils.py:941-943) without data-dependent
    # python control flow: flip the last row of Vt by sign(det)
    Vt = Vt.at[2, :].multiply(jnp.where(det < 0, -1.0, 1.0))
    R = Vt.T @ U.T
    t = mu_t - s * R @ mu_s
    return s, R, t


def huber_loss(r: jax.Array, delta: float) -> jax.Array:
    """utils.py:952-954."""
    a = jnp.abs(r)
    return jnp.where(a <= delta, 0.5 * r * r, delta * (a - 0.5 * delta))


@partial(jax.jit, static_argnames=("max_iters",))
def robust_weighted_estimate_sim3(src: jax.Array, tgt: jax.Array,
                                  init_weights: jax.Array,
                                  delta: float = 0.1,
                                  max_iters: int = 20):
    """Huber-IRLS Sim3 (utils.py:956-1000): reweight by delta/|residual|
    above the Huber threshold, re-solve, repeat. Fixed iteration count
    (a converged solve is a fixed point, so extra iterations are no-ops
    at float tolerance). Returns (s, R, t).
    """
    s0, R0, t0 = weighted_estimate_sim3(src, tgt, init_weights)

    def step(carry, _):
        s, R, t = carry
        transformed = s * (src @ R.T) + t
        res = jnp.sqrt(jnp.sum((tgt - transformed) ** 2, axis=1) + 1e-24)
        hub = jnp.where(res > delta, delta / jnp.maximum(res, 1e-12), 1.0)
        cw = init_weights * hub
        cw = cw / (cw.sum() + 1e-12)
        s, R, t = weighted_estimate_sim3(src, tgt, cw)
        return (s, R, t), None

    (s, R, t), _ = jax.lax.scan(step, (s0, R0, t0), None, length=max_iters)
    return s, R, t


def weighted_align_point_maps(pm1, conf1, pm2, conf2,
                              conf_threshold: float,
                              delta: float = 0.1, max_iters: int = 5):
    """Align point_map2 -> point_map1 (utils.py:1002-1050).

    pm1/pm2: (B, H, W, 3) world pointmaps; conf1/conf2: (B, H, W).
    The reference boolean-indexes the B x H x W grid; here invalid pixels
    get weight 0 (shape-static, jittable). Returns (s, R, t).
    """
    pm1 = jnp.asarray(pm1).reshape(-1, 3)
    pm2 = jnp.asarray(pm2).reshape(-1, 3)
    c1 = jnp.asarray(conf1).reshape(-1)
    c2 = jnp.asarray(conf2).reshape(-1)
    valid = (c1 > conf_threshold) & (c2 > conf_threshold)
    w = jnp.where(valid, jnp.sqrt(jnp.maximum(c1 * c2, 0.0)), 0.0)
    return robust_weighted_estimate_sim3(pm2, pm1, w, delta=delta,
                                         max_iters=max_iters)
