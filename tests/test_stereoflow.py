"""Stereoflow downstream harness tests (VERDICT r2 missing #5).

Synthetic constant-shift flow: img2 is img1 rolled by (dy, dx), so the
GT flow is a constant field — a tiny model must drive the Laplacian NLL
down and beat the zero-flow EPE after a short fine-tune.
"""
import numpy as np
import pytest

from cut3r_slam_tpu.models.croco_pretrain import CroCoConfig
from cut3r_slam_tpu.train.stereoflow import (
    StereoFlowConfig, train_stereoflow, tiled_predict, flow_metrics,
    evaluate_stereoflow)

H = W = 32
DX, DY = 3.0, 1.0


def _pair(rng, h=H, w=W):
    img = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
    for _ in range(2):
        img = (img + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3.0
    img2 = np.roll(img, (int(DY), int(DX)), axis=(0, 1))
    gt = np.broadcast_to(np.asarray([DX, DY], np.float32), (h, w, 2))
    return img, img2, gt.copy()


def _iter(batch=2, seed=0):
    rng = np.random.default_rng(seed)
    while True:
        ims1, ims2, gts = zip(*[_pair(rng) for _ in range(batch)])
        yield {"img1": np.stack(ims1), "img2": np.stack(ims2),
               "gt": np.stack(gts)}


@pytest.fixture(scope="module")
def trained():
    cfg = CroCoConfig(enc_embed_dim=48, enc_depth=2, enc_num_heads=2,
                      dec_embed_dim=32, dec_depth=2, dec_num_heads=2,
                      patch_size=16)
    tcfg = StereoFlowConfig(task="flow", total_steps=60, lr=2e-3,
                            crop=(H, W), log_every=20)
    model, params, losses = train_stereoflow(cfg, _iter(), tcfg,
                                             log_fn=lambda d: None)
    return model, params, losses


class TestStereoFlow:
    def test_loss_decreases(self, trained):
        _, _, losses = trained
        assert losses[-1] < losses[0] * 0.8, losses

    def test_beats_zero_flow(self, trained):
        model, params, _ = trained
        rng = np.random.default_rng(9)
        i1, i2, gt = _pair(rng)
        pred = tiled_predict(model, params, i1, i2, crop=(H, W))
        m = flow_metrics(pred, gt)
        zero = flow_metrics(np.zeros_like(gt), gt)
        assert m["epe"] < zero["epe"], (m, zero)

    def test_tiled_predict_large_image(self, trained):
        model, params, _ = trained
        rng = np.random.default_rng(4)
        i1, i2, gt = _pair(rng, h=48, w=80)   # forces a tile grid
        pred = tiled_predict(model, params, i1, i2, crop=(H, W),
                             overlap=0.5)
        assert pred.shape == (48, 80, 2)
        assert np.all(np.isfinite(pred))

    def test_evaluate_aggregates(self, trained):
        model, params, _ = trained
        rng = np.random.default_rng(5)
        pairs = []
        for _ in range(2):
            i1, i2, gt = _pair(rng)
            pairs.append({"img1": i1, "img2": i2, "gt": gt})
        out = evaluate_stereoflow(model, params, pairs, crop=(H, W))
        for k in ("epe", "bad@1px", "bad@3px", "bad@5px", "d1_all"):
            assert k in out
