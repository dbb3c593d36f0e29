"""Smoke + semantics tests for the CUT3R model on a tiny config (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # integration tier (VERDICT r4 #9: compile-heavy)

from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
from cut3r_slam_tpu.models.rope import apply_rope2d

H, W, V, B = 32, 48, 3, 1


@pytest.fixture(scope="module")
def tiny_model():
    cfg = CUT3RConfig.tiny()
    model = CUT3R(cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=(V, B, H, W, 3)),
        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)
    return model, params, imgs


def test_forward_shapes(tiny_model):
    model, params, imgs = tiny_model
    out = jax.jit(model.apply)(params, imgs)
    assert out["pts3d_in_self_view"].shape == (V, B, H, W, 3)
    assert out["pts3d_in_other_view"].shape == (V, B, H, W, 3)
    assert out["conf"].shape == (V, B, H, W)
    assert out["conf_self"].shape == (V, B, H, W)
    assert out["camera_pose"].shape == (V, B, 7)
    assert out["rgb"].shape == (V, B, H, W, 3)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


def test_conf_and_pose_activations(tiny_model):
    model, params, imgs = tiny_model
    out = jax.jit(model.apply)(params, imgs)
    # conf = 1 + exp(x) > 1
    assert np.all(np.asarray(out["conf"]) > 1.0)
    assert np.all(np.asarray(out["conf_self"]) > 1.0)
    # pose quat normalized, w >= 0 (wxyz layout)
    q = np.asarray(out["camera_pose"])[..., 3:]
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    assert np.all(q[..., 0] >= 0)
    # rgb in (-1, 1)
    assert np.all(np.abs(np.asarray(out["rgb"])) < 1.0)


def test_recurrence_state_changes(tiny_model):
    """Same image twice: second view's prediction differs (state evolved)."""
    model, params, _ = tiny_model
    img = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, size=(1, B, H, W, 3)),
                      dtype=jnp.float32)
    imgs = jnp.concatenate([img, img], axis=0)
    out = jax.jit(model.apply)(params, imgs)
    p0 = np.asarray(out["pts3d_in_other_view"][0])
    p1 = np.asarray(out["pts3d_in_other_view"][1])
    assert not np.allclose(p0, p1)


def test_update_false_freezes_state(tiny_model):
    """A view with update=False must not change downstream predictions."""
    model, params, imgs = tiny_model
    update = jnp.asarray([[True], [False], [True]])
    out_frozen = jax.jit(model.apply)(params, imgs, update)
    # Replace view 1 with random noise: since update=False, view 2's output
    # should be identical (state untouched by view 1).
    imgs2 = imgs.at[1].set(jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, size=(B, H, W, 3)), jnp.float32))
    out2 = jax.jit(model.apply)(params, imgs2, update)
    np.testing.assert_allclose(
        np.asarray(out_frozen["pts3d_in_other_view"][2]),
        np.asarray(out2["pts3d_in_other_view"][2]), atol=1e-5)


def test_reset_restores_initial_state(tiny_model):
    """reset=True at view i makes the state as if the sequence restarted."""
    model, params, imgs = tiny_model
    reset = jnp.asarray([[False], [False], [True]])
    out = jax.jit(lambda p, x, r: model.apply(p, x, None, r, ret_state=True))(
        params, imgs, reset)
    state_feat, mem = out["state"]
    # state after reset-view == init state (reset overrides the update)
    model_init = model.bind(params)
    sf0, _, mem0 = model_init.init_state(B)
    np.testing.assert_allclose(np.asarray(state_feat), np.asarray(sf0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mem), np.asarray(mem0), atol=1e-5)


def test_encode_image_method(tiny_model):
    model, params, imgs = tiny_model
    feat, pos = jax.jit(
        lambda p, x: model.apply(p, x, method=CUT3R.encode_image)
    )(params, imgs[0])
    assert feat.shape == (B, (H // 16) * (W // 16), 64)
    assert pos.shape == (B, (H // 16) * (W // 16), 2)


def test_rope_parity_with_torch_fallback():
    """apply_rope2d must match the reference's pure-torch RoPE2D math."""
    import torch

    class TorchRoPE2D(torch.nn.Module):
        # transcribed semantics of croco/models/pos_embed.py:126-179
        def __init__(self, freq=100.0):
            super().__init__()
            self.base = freq

        def get_cos_sin(self, D, positions):
            inv_freq = 1.0 / (self.base ** (torch.arange(0, D, 2).float() / D))
            freqs = positions.float()[..., None] * inv_freq
            freqs = torch.cat((freqs, freqs), dim=-1)
            return freqs.cos(), freqs.sin()

        @staticmethod
        def rotate_half(x):
            x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2:]
            return torch.cat((-x2, x1), dim=-1)

        def apply_rope1d(self, tokens, pos1d, cos, sin):
            cos = cos[:, None]
            sin = sin[:, None]
            return (tokens * cos) + (self.rotate_half(tokens) * sin)

        def forward(self, tokens, positions):
            D = tokens.size(3) // 2
            y, x = tokens.chunk(2, dim=-1)
            cy, sy = self.get_cos_sin(D, positions[:, :, 0])
            cx, sx = self.get_cos_sin(D, positions[:, :, 1])
            y = self.apply_rope1d(y, positions[:, :, 0], cy, sy)
            x = self.apply_rope1d(x, positions[:, :, 1], cx, sx)
            return torch.cat((y, x), dim=-1)

    rng = np.random.default_rng(3)
    tokens = rng.normal(size=(2, 4, 12, 16)).astype(np.float32)
    pos = rng.integers(0, 20, size=(2, 12, 2)).astype(np.int64)
    ours = np.asarray(apply_rope2d(jnp.asarray(tokens), jnp.asarray(pos)))
    theirs = TorchRoPE2D()(torch.from_numpy(tokens), torch.from_numpy(pos)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
