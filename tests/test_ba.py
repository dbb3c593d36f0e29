"""Dense BA + correlation pyramid tests on tiny synthetic problems."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.ops.ba import bundle_adjust, moba, schur_solve, block_solve
from cut3r_slam_tpu.ops.corr import build_corr_pyramid, corr_lookup, corr_volume
from cut3r_slam_tpu.geometry import lie, projective

RNG = np.random.default_rng(0)


def test_block_solve_matches_direct():
    D, N = 6, 3
    A = RNG.normal(size=(1, N * D, N * D)).astype(np.float32)
    H_full = A @ A.transpose(0, 2, 1) + 10 * np.eye(N * D, dtype=np.float32)
    b = RNG.normal(size=(1, N, D)).astype(np.float32)
    # undo the damping inside block_solve for the comparison
    H5 = H_full.reshape(1, N, D, N, D).transpose(0, 1, 3, 2, 4)
    x = np.asarray(block_solve(jnp.asarray(H5), jnp.asarray(b),
                               ep=0.0, lm=0.0))
    x_ref = np.linalg.solve(H_full, b.reshape(1, -1, 1)).reshape(1, N, D)
    np.testing.assert_allclose(x, x_ref, rtol=1e-3, atol=1e-4)


def test_schur_matches_full_solve():
    """Schur-complement solve == direct solve of the full KKT system."""
    B, P, M, D, HW = 1, 2, 3, 6, 4
    E = jnp.asarray(RNG.normal(size=(B, P, M, D, HW)), jnp.float32) * 0.1
    A = RNG.normal(size=(B, P * D, P * D)).astype(np.float32)
    Hf = A @ A.transpose(0, 2, 1) + 5 * np.eye(P * D, dtype=np.float32)
    H = jnp.asarray(Hf.reshape(B, P, D, P, D).transpose(0, 1, 3, 2, 4))
    C = jnp.asarray(RNG.uniform(1.0, 2.0, size=(B, M, HW)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(B, P, D)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(B, M, HW)), jnp.float32)

    dx, dz, dzcov = schur_solve(H, E, C, v, w, ep=0.0, lm=0.0)

    # build the full system
    Ef = np.asarray(E).transpose(0, 1, 3, 2, 4).reshape(B, P * D, M * HW)
    full = np.zeros((B, P * D + M * HW, P * D + M * HW), np.float32)
    full[:, :P * D, :P * D] = Hf
    full[:, :P * D, P * D:] = Ef
    full[:, P * D:, :P * D] = Ef.transpose(0, 2, 1)
    full[:, P * D:, P * D:] = np.stack([np.diag(np.asarray(C).reshape(B, -1)[b])
                                        for b in range(B)])
    rhs = np.concatenate([np.asarray(v).reshape(B, -1),
                          np.asarray(w).reshape(B, -1)], axis=1)
    sol = np.linalg.solve(full, rhs[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(dx).reshape(B, -1),
                               sol[:, :P * D], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dz).reshape(B, -1),
                               sol[:, P * D:], rtol=1e-3, atol=1e-4)


def _synthetic_problem(n=4, h=12, w=16):
    """Frames looking at a plane; ground-truth poses + disparities."""
    intr = jnp.asarray([[20.0, 20.0, w / 2, h / 2]] * n)
    xi = jnp.asarray(RNG.normal(size=(n, 6)) * 0.03, jnp.float32)
    poses_gt = lie.se3_exp(xi)
    disps_gt = jnp.asarray(
        RNG.uniform(0.45, 0.55, size=(n, h, w)), jnp.float32)
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    m = (np.abs(ii - jj) == 1)
    ii = jnp.asarray(ii[m])
    jj = jnp.asarray(jj[m])
    target, valid = projective.projective_transform(
        poses_gt, disps_gt, intr, ii, jj)
    return poses_gt, disps_gt, intr, ii, jj, target, valid


def test_bundle_adjust_reduces_error():
    poses_gt, disps_gt, intr, ii, jj, target, valid = _synthetic_problem()
    n = poses_gt.shape[0]
    h, w = disps_gt.shape[-2:]
    # perturb poses and disps
    noise = jnp.asarray(RNG.normal(size=(n, 6)) * 0.01, jnp.float32)
    noise = noise.at[0].set(0.0)
    poses0 = lie.se3_retr(poses_gt, noise)
    disps0 = disps_gt + jnp.asarray(
        RNG.normal(size=disps_gt.shape) * 0.02, jnp.float32)
    weight = jnp.ones_like(target)
    eta = jnp.full((n, h, w), 1e-2)
    edge_valid = jnp.ones(ii.shape[0])

    def flow_err(p, d):
        c, v = projective.projective_transform(p, d, intr, ii, jj)
        return float((jnp.abs(c - target) * v).sum() / v.sum())

    e0 = flow_err(poses0, disps0)
    poses1, disps1, dzcov = bundle_adjust(
        target, weight, eta, poses0, disps0, intr, ii, jj, edge_valid,
        fixedp=1, steps=4)
    e1 = flow_err(poses1, disps1)
    assert e1 < 0.3 * e0, (e0, e1)
    assert np.all(np.asarray(dzcov) > 0)


def test_moba_pose_only():
    poses_gt, disps_gt, intr, ii, jj, target, valid = _synthetic_problem()
    n = poses_gt.shape[0]
    noise = jnp.asarray(RNG.normal(size=(n, 6)) * 0.01, jnp.float32)
    noise = noise.at[0].set(0.0)
    poses0 = lie.se3_retr(poses_gt, noise)
    weight = jnp.ones_like(target)
    edge_valid = jnp.ones(ii.shape[0])

    def pose_err(p):
        return float(jnp.abs(lie.se3_log(
            lie.se3_mul(p, lie.se3_inv(poses_gt)))).mean())

    e0 = pose_err(poses0)
    poses1 = moba(target, weight, poses0, disps_gt, intr, ii, jj,
                  edge_valid, fixedp=1, steps=4)
    e1 = pose_err(poses1)
    assert e1 < 0.5 * e0, (e0, e1)


def test_corr_volume_and_lookup():
    N, H, W, C = 1, 8, 8, 16
    f1 = jnp.asarray(RNG.normal(size=(N, H, W, C)), jnp.float32)
    f2 = jnp.asarray(RNG.normal(size=(N, H, W, C)), jnp.float32)
    vol = corr_volume(f1, f2)
    # definition check at one pixel pair
    v = float(vol[0, 2, 3, 4, 5])
    ref = float(jnp.dot(f1[0, 2, 3] / 4, f2[0, 4, 5] / 4))
    assert abs(v - ref) < 1e-4

    pyr = build_corr_pyramid(f1, f2, num_levels=3)
    assert pyr[1].shape == (N, H, W, H // 2, W // 2)
    # integer coords at level 0 reproduce the volume values
    grid = jnp.stack(jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                  jnp.arange(H, dtype=jnp.float32),
                                  indexing="xy"), -1)[None]
    out = corr_lookup(pyr, grid, radius=1)
    assert out.shape == (N, H, W, 3 * 9)
    # center of the first-level window (dy=0, dx=0) = vol[..., y, x]
    center = out[0, 3, 4, 4]  # radius 1: window idx 4 = center
    assert abs(float(center) - float(vol[0, 3, 4, 3, 4])) < 1e-4


def test_droid_net_smoke():
    from cut3r_slam_tpu.models.droid_net import DroidNet
    n, H8, W8 = 3, 8, 8
    H, W = H8 * 8, W8 * 8
    net = DroidNet()
    images = jnp.asarray(RNG.uniform(0, 255, (n, H, W, 3)), jnp.float32)
    poses = lie.se3_identity((n,))
    disps = jnp.full((n, H8, W8), 0.5)
    intr = jnp.asarray([[10.0, 10.0, W8 / 2, H8 / 2]] * n)
    ii = jnp.asarray([0, 1, 1, 2])
    jj = jnp.asarray([1, 0, 2, 1])
    ev = jnp.ones(4)
    params = net.init(jax.random.PRNGKey(0), poses, images, disps, intr,
                      ii, jj, ev, 1, 1)
    poses1, disps1, resid = net.apply(params, poses, images, disps, intr,
                                      ii, jj, ev, 2, 1)
    assert poses1.shape == poses.shape
    assert np.all(np.isfinite(np.asarray(poses1)))
    assert np.all(np.isfinite(np.asarray(disps1)))
