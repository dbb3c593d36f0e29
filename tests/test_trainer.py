"""Training-harness tests (VERDICT r1 #9): gradient accumulation via
optax.MultiSteps, resume-from-checkpoint, and the TBPTT no-grad encoder
pass (reference src/dust3r/inference.py:90-216 + src/train.py:112)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # integration tier (VERDICT r4 #9: compile-heavy)

from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
from cut3r_slam_tpu.train import make_optimizer, make_train_step
from cut3r_slam_tpu.train.train_step import make_tbptt_train_step
from cut3r_slam_tpu.train.trainer import (TrainerConfig, train,
                                          _save_ckpt, _load_latest_ckpt)

V, B, H, W = 4, 1, 32, 48


def _model():
    return CUT3R(CUT3RConfig.tiny())


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "imgs": jnp.asarray(rng.uniform(-1, 1, (V, B, H, W, 3)), jnp.float32),
        "pts3d": jnp.asarray(rng.normal(size=(V, B, H, W, 3)), jnp.float32),
        "camera_pose": jnp.broadcast_to(jnp.eye(4), (V, B, 4, 4)),
        "valid_mask": jnp.ones((V, B, H, W), bool),
    }


def _leaf_delta(a, b):
    return max(float(jnp.abs(x - y).max())
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


class TestGradAccumulation:
    def test_multisteps_applies_every_k(self):
        model = _model()
        batch = _batch()
        params = model.init(jax.random.PRNGKey(0), batch["imgs"])
        tx = make_optimizer(lr=1e-3, warmup_steps=0, accum_steps=2)
        opt_state = tx.init(params)
        step = jax.jit(make_train_step(model, tx))
        # micro-step 1: gradients accumulate, params must NOT move
        p1, opt_state, _ = step(params, opt_state, batch)
        assert _leaf_delta(params, p1) == 0.0
        # micro-step 2: the accumulated update applies
        p2, opt_state, _ = step(p1, opt_state, batch)
        # (first applied update may ride a 0-LR warmup point; take one
        # more full accumulation cycle before asserting movement)
        p3, opt_state, _ = step(p2, opt_state, batch)
        assert _leaf_delta(p2, p3) == 0.0  # accumulating again
        p4, opt_state, _ = step(p3, opt_state, batch)
        assert _leaf_delta(p1, p4) > 0.0


class TestTBPTTNoGradEncoder:
    def test_encoder_params_frozen_decoder_moves(self):
        """The no-grad encoder pass must yield zero encoder gradients
        (inference.py:100-117): with weight decay 0, encoder params stay
        bitwise identical after a step while decoder params move."""
        model = _model()
        batch = _batch()
        params = model.init(jax.random.PRNGKey(0), batch["imgs"])
        tx = make_optimizer(lr=1e-3, weight_decay=0.0, warmup_steps=0)
        opt_state = tx.init(params)
        step = jax.jit(make_tbptt_train_step(model, tx, chunk=2,
                                             grad_chunks=2))
        p1, _, aux = step(params, opt_state, batch)
        assert np.isfinite(float(aux["total"]))
        enc_before = {k: v for k, v in params["params"].items()
                      if k.startswith("enc_") or k == "patch_embed"}
        enc_after = {k: v for k, v in p1["params"].items()
                     if k.startswith("enc_") or k == "patch_embed"}
        assert _leaf_delta(enc_before, enc_after) == 0.0
        dec_before = {k: v for k, v in params["params"].items()
                      if k.startswith("dec_blocks")}
        dec_after = {k: v for k, v in p1["params"].items()
                     if k.startswith("dec_blocks")}
        assert _leaf_delta(dec_before, dec_after) > 0.0


class TestResume:
    def test_ckpt_roundtrip(self, tmp_path):
        model = _model()
        batch = _batch()
        params = model.init(jax.random.PRNGKey(0), batch["imgs"])
        tx = make_optimizer()
        opt_state = tx.init(params)
        _save_ckpt(str(tmp_path), params, opt_state, 7)
        loaded = _load_latest_ckpt(str(tmp_path))
        assert loaded is not None
        p2, o2, step = loaded
        assert step == 7
        assert _leaf_delta(params, jax.tree.map(jnp.asarray, p2)) == 0.0

    def test_train_resumes_from_latest(self, tmp_path):
        model = _model()

        def it():
            i = 0
            while True:
                yield _batch(i)
                i += 1

        logs = []
        cfg = TrainerConfig(lr=1e-3, warmup_steps=1, total_steps=2,
                            log_every=1, ckpt_every=1,
                            ckpt_dir=str(tmp_path), fsdp=8)
        train(model, it(), cfg, log_fn=logs.append)
        assert _load_latest_ckpt(str(tmp_path))[2] == 2

        logs2 = []
        cfg2 = TrainerConfig(lr=1e-3, warmup_steps=1, total_steps=4,
                             log_every=1, ckpt_every=1,
                             ckpt_dir=str(tmp_path), fsdp=8, resume=True)
        train(model, it(), cfg2, log_fn=logs2.append)
        assert any("resumed_from_step" in m for m in logs2)
        assert [m for m in logs2 if "resumed_from_step" in m][0][
            "resumed_from_step"] == 2
        assert _load_latest_ckpt(str(tmp_path))[2] == 4
