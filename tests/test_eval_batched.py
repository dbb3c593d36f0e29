"""Batched terminate-time eval rendering (slam/system.py
_render_views_batched): one lax.map dispatch per 16-view bucket must
reproduce the per-view render_view path exactly (same programs, just
fewer host round-trips), including exposure and tail-bucket padding.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from cut3r_slam_tpu.slam.mapping import MappingBackend, MappingConfig
from cut3r_slam_tpu.slam.renderer import render_view
from cut3r_slam_tpu.slam.system import SLAMSystem

H, W = 32, 48
N_GAUSS = 256


def _make_backend(n_cams):
    K4 = np.asarray([0.9 * W, 0.9 * W, W / 2, H / 2], np.float32)
    cfg = MappingConfig(height=H, width=W, capacity=N_GAUSS,
                        cam_capacity=max(8, n_cams), window_size=4,
                        opt_segment=4, max_per_tile=64,
                        raster_backend="xla")
    mb = MappingBackend(cfg, K4)
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-1.5, 1.5, (N_GAUSS, 3)).astype(np.float32)
    xyz[:, 2] += 3.0
    mb.arena = dataclasses.replace(
        mb.arena, xyz=jnp.asarray(xyz),
        f_dc=jnp.asarray(rng.uniform(-0.3, 0.3, (N_GAUSS, 3)), jnp.float32),
        opacity_logit=jnp.zeros((N_GAUSS,)),
        log_scales=jnp.full((N_GAUSS, 3), -2.5),
        quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N_GAUSS, 1)),
        alive=jnp.ones((N_GAUSS,), bool))
    for i in range(n_cams):
        img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        depth = rng.uniform(2.0, 4.0, (H, W)).astype(np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = 0.05 * i
        w2c[1, 3] = -0.03 * i
        mb.add_keyframe(i, img, depth, w2c)
    return mb


def _bare_system(mapper):
    """SLAMSystem shell with just the fields _render_views_batched uses."""
    s = SLAMSystem.__new__(SLAMSystem)
    s.mapper = mapper
    return s


def test_batched_matches_per_view():
    """Exact match vs per-view render_view incl. a non-full tail bucket
    (5 views with _EVAL_BATCH=4)."""
    mb = _make_backend(5)
    s = _bare_system(mb)
    s._EVAL_BATCH = 4  # force a padded tail bucket (5 = 4 + 1)
    rng = np.random.default_rng(1)
    ea = np.stack([np.eye(3, dtype=np.float32)
                   + 0.01 * rng.normal(size=(3, 3)).astype(np.float32)
                   for _ in range(5)])
    eb = 0.01 * rng.normal(size=(5, 3)).astype(np.float32)
    w2cs = np.asarray(mb.cams.w2c)[:5]

    imgs, depths = s._render_views_batched(w2cs, ea, eb)
    assert imgs.shape == (5, H, W, 3) and depths.shape == (5, H, W)

    for i in range(5):
        out = render_view(mb.arena.params(), mb.arena.alive,
                          jnp.asarray(w2cs[i]), mb.K4, mb.raster_cfg)
        ref_img = np.clip(np.asarray(out["color"]) @ ea[i] + eb[i], 0, 1)
        np.testing.assert_allclose(imgs[i], ref_img, atol=1e-5,
                                   err_msg=f"view {i} color diverged")
        np.testing.assert_allclose(depths[i], np.asarray(out["depth"]),
                                   atol=1e-5,
                                   err_msg=f"view {i} depth diverged")


def test_batched_identity_exposure_default():
    mb = _make_backend(2)
    s = _bare_system(mb)
    w2cs = np.asarray(mb.cams.w2c)[:2]
    imgs, _ = s._render_views_batched(w2cs)
    out = render_view(mb.arena.params(), mb.arena.alive,
                      jnp.asarray(w2cs[1]), mb.K4, mb.raster_cfg)
    np.testing.assert_allclose(imgs[1],
                               np.clip(np.asarray(out["color"]), 0, 1),
                               atol=1e-5)
