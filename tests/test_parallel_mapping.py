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

pytestmark = [pytest.mark.slow,  # integration tier (VERDICT r4 #9)
              pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")]

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


def test_parallel_gba_batch_matches_sequential():
    """Batched global BA (gba_views_per_iter > 1) sharded over the mesh
    vs the same batch on one device: identical math up to psum float
    reassociation (VERDICT r3 #3)."""
    K4 = np.asarray([0.9 * W, 0.9 * W, W / 2, H / 2], np.float32)
    cfg = dataclasses.replace(_cfg(4), gba_views_per_iter=4,
                              gba_segment=3)
    rng = np.random.default_rng(0)
    seq = MappingBackend(cfg, K4)
    _seed_arena(seq, rng)
    _add_views(seq, rng)

    mesh = make_mesh(4, axes=("mv",), shape=(4,))
    rng = np.random.default_rng(0)
    par = MappingBackend(cfg, K4, mesh=mesh)
    _seed_arena(par, rng)
    _add_views(par, rng)

    # same RNG stream -> identical (seg, k) view draws
    seq.global_ba(12, densify=False)
    par.global_ba(12, densify=False)
    for k in seq.arena.params():
        np.testing.assert_allclose(
            np.asarray(par.arena.params()[k]),
            np.asarray(seq.arena.params()[k]), rtol=2e-3, atol=2e-5,
            err_msg=f"arena param {k} diverged")
    np.testing.assert_allclose(np.asarray(par.cams.w2c[:N_CAMS]),
                               np.asarray(seq.cams.w2c[:N_CAMS]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(par.arena.grad_accum), np.asarray(seq.arena.grad_accum),
        rtol=2e-3, atol=2e-6)


def test_gba_batch_k1_matches_reference_loop():
    """gba_views_per_iter=1 must reproduce the one-view-per-iteration
    reference semantics (the pre-batching implementation) bit-for-bit in
    structure: one Adam step per view render."""
    K4 = np.asarray([0.9 * W, 0.9 * W, W / 2, H / 2], np.float32)
    cfg = dataclasses.replace(_cfg(4), gba_segment=3)
    rng = np.random.default_rng(0)
    be = MappingBackend(cfg, K4)
    _seed_arena(be, rng)
    _add_views(be, rng)
    xyz_before = np.asarray(be.arena.xyz).copy()
    be.global_ba(6, densify=False)
    # six renders -> six Gaussian Adam steps (2 segments x 3 iters)
    assert int(be.adam[2]) == 6
    assert np.abs(np.asarray(be.arena.xyz) - xyz_before).max() > 0


def test_parallel_pose_refine_matches_sequential():
    """Batched pose refinement sharded over the mesh vs per-view
    sequential calls: the per-view problems are independent, so results
    must agree to float tolerance — including the pad-to-device-multiple
    path (3 views on 4 devices)."""
    seq, par = _make_pair(4, 4)
    idxs = [0, 1, 2]
    # sequential: one view at a time through the single-view jit
    pm_seq, val_seq = [], []
    for i in idxs:
        pm, val = seq.pose_refine(i)
        pm_seq.append(np.asarray(pm))
        val_seq.append(np.asarray(val))
    # parallel: one batched sharded program
    pm_par, val_par = par.pose_refine_multi(idxs)
    np.testing.assert_allclose(np.asarray(par.cams.w2c[:3]),
                               np.asarray(seq.cams.w2c[:3]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pm_par), np.stack(pm_seq),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(val_par), np.stack(val_seq))


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
