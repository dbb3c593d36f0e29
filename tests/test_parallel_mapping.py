"""View-parallel mapping optimization (parallel/mapping.py) vs the
sequential single-chip scan: same math, different device layout.

The windowed loss is a weighted sum over independent per-view render
losses (slam/mapping.py window_loss_raw), so sharding the views over a
mesh axis and psum'ing the Gaussian grads must reproduce the sequential
optimize to float tolerance — including when the window needs weight-0
padding to reach a device multiple.
"""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cut3r_slam_tpu.parallel import make_mesh
from cut3r_slam_tpu.slam.mapping import MappingBackend, MappingConfig
from cut3r_slam_tpu.slam.gaussian_map import GaussianArena

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

H, W = 32, 48
N_GAUSS = 256
N_CAMS = 4


def _cfg(window_size):
    return MappingConfig(height=H, width=W, capacity=N_GAUSS,
                         cam_capacity=8, window_size=window_size,
                         opt_segment=4, max_per_tile=64,
                         raster_backend="xla")


def _seed_arena(backend, rng):
    xyz = rng.uniform(-1.5, 1.5, (N_GAUSS, 3)).astype(np.float32)
    xyz[:, 2] += 3.0
    arena = dataclasses.replace(
        backend.arena,
        xyz=jnp.asarray(xyz),
        f_dc=jnp.asarray(rng.uniform(-0.3, 0.3, (N_GAUSS, 3)), jnp.float32),
        opacity_logit=jnp.zeros((N_GAUSS,)),
        log_scales=jnp.full((N_GAUSS, 3), -2.5),
        quat=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (N_GAUSS, 1)),
        alive=jnp.ones((N_GAUSS,), bool))
    backend.arena = arena


def _add_views(backend, rng):
    for i in range(N_CAMS):
        img = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
        depth = rng.uniform(2.0, 4.0, (H, W)).astype(np.float32)
        w2c = np.eye(4, dtype=np.float32)
        w2c[0, 3] = 0.05 * i
        backend.add_keyframe(i, img, depth, w2c)


def _make_pair(window_size, mv):
    """(sequential backend, parallel backend) with identical state."""
    K4 = np.asarray([0.9 * W, 0.9 * W, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(0)
    seq = MappingBackend(_cfg(window_size), K4)
    _seed_arena(seq, rng)
    _add_views(seq, rng)

    mesh = make_mesh(mv, axes=("mv",), shape=(mv,))
    rng = np.random.default_rng(0)
    par = MappingBackend(_cfg(window_size), K4, mesh=mesh)
    _seed_arena(par, rng)
    _add_views(par, rng)
    return seq, par


@pytest.mark.parametrize("window_size,mv", [(4, 4), (3, 2)])
def test_parallel_optimize_matches_sequential(window_size, mv):
    """(3, 2) exercises the weight-0 padding path (3 -> 4 view slots)."""
    seq, par = _make_pair(window_size, mv)
    window = list(range(min(window_size, 3)))
    loss_seq = seq.optimization(4, window)
    loss_par = par.optimization(4, window)

    assert np.isfinite(loss_seq) and np.isfinite(loss_par)
    np.testing.assert_allclose(loss_par, loss_seq, rtol=2e-4, atol=2e-5)
    for k in seq.arena.params():
        np.testing.assert_allclose(
            np.asarray(par.arena.params()[k]),
            np.asarray(seq.arena.params()[k]), rtol=2e-3, atol=2e-5,
            err_msg=f"arena param {k} diverged")
    # refined poses + exposure agree view-by-view
    np.testing.assert_allclose(np.asarray(par.cams.w2c[:3]),
                               np.asarray(seq.cams.w2c[:3]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(par.cams.exposure_a[:3]),
                               np.asarray(seq.cams.exposure_a[:3]),
                               rtol=1e-4, atol=1e-5)


def test_parallel_optimize_no_pose():
    """optimize_pose=False variant (the reference's per-KF refinement
    pass, gs_backend_per_frame.py:862) through the parallel path."""
    seq, par = _make_pair(4, 4)
    window = [0, 1]
    loss_seq = seq.optimization(4, window, optimize_pose=False)
    loss_par = par.optimization(4, window, optimize_pose=False)
    np.testing.assert_allclose(loss_par, loss_seq, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(par.arena.params()["xyz"]),
        np.asarray(seq.arena.params()["xyz"]), rtol=2e-3, atol=2e-5)
