"""JDSA, raymap inference_step, and linear-head tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.geometry import lie, projective
from cut3r_slam_tpu.ops.ba import jdsa, _bilinear_upsample_with_jacobian

RNG = np.random.default_rng(7)


def test_bilinear_jacobian():
    scales = jnp.asarray(RNG.normal(size=(2, 3, 4)), jnp.float32)
    vals, J = _bilinear_upsample_with_jacobian(scales, 12, 16)
    assert vals.shape == (2, 12, 16)
    # J reproduces the upsample: vals == J @ scales_flat
    v2 = (np.asarray(J) @ np.asarray(scales).reshape(2, -1).T).T
    np.testing.assert_allclose(v2.reshape(2, 12, 16), np.asarray(vals),
                               atol=1e-5)
    # rows sum to 1 (convex weights)
    np.testing.assert_allclose(np.asarray(J).sum(1), 1.0, atol=1e-5)


def test_jdsa_recovers_prior_scale():
    """Disparities drift from a scaled prior; JDSA pulls them together by
    adjusting depths + per-frame scale grids."""
    n, h, w = 3, 12, 16
    intr = jnp.asarray([[20.0, 20.0, w / 2, h / 2]] * n)
    poses = lie.se3_exp(jnp.asarray(RNG.normal(size=(n, 6)) * 0.02,
                                    jnp.float32))
    disps_gt = jnp.asarray(RNG.uniform(0.4, 0.6, (n, h, w)), jnp.float32)
    ii = jnp.asarray([0, 1, 1, 2])
    jj = jnp.asarray([1, 0, 2, 1])
    target, _ = projective.projective_transform(poses, disps_gt, intr, ii, jj)
    weight = jnp.ones_like(target)
    ev = jnp.ones(4)
    eta = jnp.full((n, h, w), 1e-2)

    # prior = gt/1.25 (scale off by 1.25); start disps perturbed
    disps_prior = disps_gt / 1.25
    disps0 = disps_gt + jnp.asarray(RNG.normal(size=(n, h, w)) * 0.03,
                                    jnp.float32)
    dscales = jnp.ones((n, 3, 4))

    d, s, cov = disps0, dscales, None
    for _ in range(5):
        d, s, cov = jdsa(target, weight, eta, poses, d, intr,
                         disps_prior, s, ii, jj, ev, alpha=0.05)
    # the scale grids should move toward 1.25 and the prior-consistency
    # residual should shrink
    vals, _ = _bilinear_upsample_with_jacobian(s, h, w)
    resid = float(jnp.abs(d - disps_prior * vals).mean())
    resid0 = float(jnp.abs(disps0 - disps_prior * jnp.ones((n, h, w))).mean())
    assert resid < 0.5 * resid0, (resid0, resid)
    assert np.all(np.isfinite(np.asarray(cov)))


def test_inference_step_raymap():
    from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
    cfg = CUT3RConfig.tiny()
    model = CUT3R(cfg)
    V, B, H, W = 2, 1, 32, 48
    imgs = jnp.asarray(RNG.uniform(-1, 1, (V, B, H, W, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs, None, None, True)
    state_feat, mem = out["state"]
    ray_map = jnp.asarray(RNG.normal(size=(B, H, W, 6)), jnp.float32)
    res = model.apply(params, ray_map, state_feat, mem,
                      method=CUT3R.inference_step)
    assert res["pts3d_in_self_view"].shape == (B, H, W, 3)
    assert np.all(np.isfinite(np.asarray(res["pts3d_in_other_view"])))


def test_linear_head_variant():
    from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
    import dataclasses
    cfg = dataclasses.replace(CUT3RConfig.tiny(), head_type="linear")
    model = CUT3R(cfg)
    V, B, H, W = 2, 1, 32, 48
    imgs = jnp.asarray(RNG.uniform(-1, 1, (V, B, H, W, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    out = model.apply(params, imgs)
    assert out["pts3d_in_self_view"].shape == (V, B, H, W, 3)
    assert out["camera_pose"].shape == (V, B, 7)
    assert np.all(np.asarray(out["conf"]) > 1.0)
