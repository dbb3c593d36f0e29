"""ManyAR portrait support (VERDICT r3 #10).

The reference stores portrait images TRANSPOSED inside the landscape
batch container, with ``true_shape`` recording the real orientation
(ManyAR_PatchEmbed, /root/reference/src/dust3r/patch_embed.py:35-93;
transpose_to_landscape, src/dust3r/heads/__init__.py). Our TPU version
runs BOTH orientations at static shapes and selects per sample.

Equivariance oracle: a portrait sample fed through the ManyAR path must
produce EXACTLY the transposed outputs of a plain run at its native
portrait resolution (same params, same ops — equality up to float
noise), and must not perturb landscape rows of the same batch.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
from cut3r_slam_tpu.train import make_optimizer, make_train_step

H, W, V = 32, 48, 2  # landscape container; portrait native = (48, 32)
DENSE = ("pts3d_in_self_view", "conf_self", "pts3d_in_other_view",
         "conf", "rgb")


@pytest.fixture(scope="module")
def model_and_params():
    cfg = CUT3RConfig.tiny()
    model = CUT3R(cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=(V, 1, H, W, 3)),
        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    return model, params


def _portrait_native(seed):
    """(V, 1, W, H, 3) portrait-orientation sequence."""
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, size=(V, 1, W, H, 3)),
                       dtype=jnp.float32)


def test_portrait_matches_native_run(model_and_params):
    model, params = model_and_params
    native = _portrait_native(1)

    # plain run at native portrait resolution (conv/DPT params are
    # shape-agnostic, so the same params apply)
    out_native = jax.jit(model.apply)(params, native)

    # ManyAR run: same images transposed into the landscape container
    container = native.swapaxes(2, 3)
    true_shape = jnp.broadcast_to(jnp.asarray([W, H], jnp.int32), (V, 1, 2))
    out_many = jax.jit(model.apply)(params, container,
                                    true_shape=true_shape)

    for k in DENSE:
        want = np.asarray(out_native[k]).swapaxes(2, 3)
        got = np.asarray(out_many[k])
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=k)
    np.testing.assert_allclose(np.asarray(out_many["camera_pose"]),
                               np.asarray(out_native["camera_pose"]),
                               atol=1e-5)


def test_mixed_batch_keeps_landscape_rows_intact(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(2)
    land = jnp.asarray(rng.uniform(-1, 1, size=(V, 1, H, W, 3)),
                       jnp.float32)
    port = _portrait_native(3).swapaxes(2, 3)  # transposed into container
    imgs = jnp.concatenate([land, port], axis=1)          # (V, 2, H, W, 3)
    true_shape = jnp.asarray(
        np.broadcast_to(np.int32([[H, W], [W, H]]), (V, 2, 2)))

    out_mixed = jax.jit(model.apply)(params, imgs, true_shape=true_shape)
    out_land = jax.jit(model.apply)(params, land)

    for k in DENSE + ("camera_pose",):
        # batch-size change (B=2 vs B=1) perturbs XLA fusion order;
        # expm1 postprocess amplifies — tolerance is numeric, not
        # semantic (observed maxdiff ~9e-5)
        np.testing.assert_allclose(np.asarray(out_mixed[k][:, :1]),
                                   np.asarray(out_land[k]),
                                   atol=5e-4, rtol=5e-3, err_msg=k)


def test_all_landscape_true_shape_is_noop(model_and_params):
    """true_shape present but all-landscape must equal the plain path."""
    model, params = model_and_params
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.uniform(-1, 1, size=(V, 1, H, W, 3)), jnp.float32)
    ts = jnp.broadcast_to(jnp.asarray([H, W], jnp.int32), (V, 1, 2))
    out_a = jax.jit(model.apply)(params, imgs)
    out_b = jax.jit(model.apply)(params, imgs, true_shape=ts)
    for k in DENSE:
        np.testing.assert_allclose(np.asarray(out_a[k]),
                                   np.asarray(out_b[k]), atol=1e-6,
                                   err_msg=k)


def test_portrait_sample_flows_through_train_step(model_and_params):
    """VERDICT r3 #10 'Done' criterion: a portrait sample trains."""
    model, params = model_and_params
    rng = np.random.default_rng(5)
    imgs = _portrait_native(6).swapaxes(2, 3)              # (V, 1, H, W, 3)
    batch = {
        "imgs": imgs,
        "true_shape": jnp.broadcast_to(jnp.asarray([W, H], jnp.int32),
                                       (V, 1, 2)),
        "pts3d": jnp.asarray(rng.normal(size=(V, 1, H, W, 3)), jnp.float32),
        "camera_pose": jnp.broadcast_to(jnp.eye(4), (V, 1, 4, 4)),
        "valid_mask": jnp.ones((V, 1, H, W), bool),
    }
    tx = make_optimizer(lr=1e-3, warmup_steps=0, accum_steps=1)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, tx))
    new_params, _, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["total"]))
    delta = max(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree.leaves(params), jax.tree.leaves(new_params)))
    assert delta > 0.0
