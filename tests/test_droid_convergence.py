"""DROID stack convergence evidence (VERDICT r3 #8).

The topology smoke tests prove shapes; these prove BEHAVIOR:

1. the dense-BA solver, fed oracle correspondences (known flow from GT
   poses/depth), drives a perturbed pose back to ground truth (>=10x
   error reduction) — this is the convergence property the reference's
   update loop relies on (/root/reference/hislam2/modules/droid_net.py:
   175-225, where BA consumes the GRU's predicted targets);
2. a from-scratch DroidNet is TRAINABLE: a few Adam steps on a synthetic
   two-frame flow problem reduce the self-supervised reprojection
   residual (gradients flow through GRU + BA + correlation lookups).

Full training-to-accuracy is out of scope for a 1-core CPU test; the
pair (solver converges given good targets) + (targets learnable by
gradient descent) is the decomposition of the reference's behavior.
"""
import numpy as np
import jax
import jax.numpy as jnp

from cut3r_slam_tpu.geometry.projective import projective_transform
from cut3r_slam_tpu.geometry.lie import se3_exp
from cut3r_slam_tpu.ops.ba import bundle_adjust
import pytest

pytestmark = pytest.mark.slow  # integration tier (VERDICT r4 #9: compile-heavy)

HT, WD = 12, 16  # 1/8-resolution grid


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    # textured smooth disparity in [0.4, 0.8] (depth ~1.2-2.5)
    d = 0.6 + 0.2 * np.sin(np.arange(WD) / 3.0)[None, :] \
        + 0.05 * rng.standard_normal((HT, WD))
    disps = jnp.asarray(np.stack([d, d]), jnp.float32)
    intr = jnp.asarray([WD * 1.2, WD * 1.2, WD / 2, HT / 2], jnp.float32)
    intr = jnp.broadcast_to(intr, (2, 4))
    # GT relative motion: small translation + rotation
    xi = jnp.asarray([0.04, -0.02, 0.03, 0.02, -0.015, 0.01], jnp.float32)
    identity = jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32)
    gt_poses = jnp.stack([identity, se3_exp(xi)])
    return disps, intr, gt_poses


def test_oracle_ba_recovers_pose_10x():
    disps, intr, gt_poses = _scene()
    ii = jnp.asarray([0, 1], jnp.int32)
    jj = jnp.asarray([1, 0], jnp.int32)
    ev = jnp.ones(2, jnp.float32)

    # oracle targets: where pixels land under the TRUE geometry
    target, _ = projective_transform(gt_poses, disps, intr, ii, jj)

    # perturb frame 1's pose (frame 0 fixed)
    xi_bad = jnp.asarray([0.03, 0.025, -0.02, -0.015, 0.02, 0.012],
                         jnp.float32)
    from cut3r_slam_tpu.geometry.lie import se3_mul
    poses = gt_poses.at[1].set(se3_mul(se3_exp(xi_bad), gt_poses[1]))

    def pose_err(p):
        dt = np.asarray(p[1, :3] - gt_poses[1, :3])
        dq = np.asarray(p[1, 3:]) - np.asarray(gt_poses[1, 3:])
        return float(np.sqrt((dt ** 2).sum() + (dq ** 2).sum()))

    err0 = pose_err(poses)
    weight = jnp.ones((2, HT, WD, 2), jnp.float32)
    eta = jnp.full((2, HT, WD), 1e-4, jnp.float32)
    cur_disps = disps
    for _ in range(8):
        poses, cur_disps, _ = bundle_adjust(
            target, weight, eta, poses, cur_disps, intr, ii, jj, ev,
            fixedp=1, n_frames=2, steps=2)
    err1 = pose_err(poses)
    assert np.isfinite(err1)
    assert err1 < err0 / 10.0, (err0, err1)


def test_droid_net_trains_on_two_frame_flow():
    from cut3r_slam_tpu.models.droid_net import DroidNet

    rng = np.random.default_rng(1)
    H8, W8 = 8, 8
    H, W = H8 * 8, W8 * 8
    # textured image pair (same texture, shifted view)
    tex = rng.uniform(0, 255, (H + 8, W + 8, 3)).astype(np.float32)
    for _ in range(2):
        tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, 1, 1)) / 3.0
    images = jnp.asarray(np.stack([tex[:H, :W], tex[4:H + 4, 4:W + 4]]))

    d = 0.5 + 0.1 * rng.standard_normal((H8, W8))
    disps = jnp.asarray(np.stack([d, d]), jnp.float32)
    intr = jnp.broadcast_to(
        jnp.asarray([W8 * 1.2, W8 * 1.2, W8 / 2, H8 / 2], jnp.float32),
        (2, 4))
    identity = jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32)
    poses = jnp.stack([identity,
                       se3_exp(jnp.asarray([0.05, 0, 0, 0, 0, 0]))])
    ii = jnp.asarray([0, 1], jnp.int32)
    jj = jnp.asarray([1, 0], jnp.int32)
    ev = jnp.ones(2, jnp.float32)

    net = DroidNet()
    params = net.init(jax.random.PRNGKey(0), poses, images, disps, intr,
                      ii, jj, ev, num_steps=1, fixedp=1)

    def loss_fn(p):
        _, _, residual = net.apply(p, poses, images, disps, intr,
                                   ii, jj, ev, num_steps=2, fixedp=1)
        return jnp.abs(residual).mean()

    vg = jax.jit(jax.value_and_grad(loss_fn))
    l0, g = vg(params)
    assert np.isfinite(float(l0))
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert gnorm > 0, "no gradient reaches the update network"

    # a few SGD steps must reduce the self-supervised residual
    lr = 1e-4
    cur = params
    losses = [float(l0)]
    for _ in range(4):
        l, g = vg(cur)
        cur = jax.tree.map(lambda p, gg: p - lr * gg, cur, g)
        losses.append(float(l))
    l_final, _ = vg(cur)
    assert float(l_final) < losses[0], losses + [float(l_final)]
