"""Stereo / optical-flow downstream harness for the CroCo backbone.

Counterpart of /root/reference/src/croco/stereoflow/train.py (455 LoC
trainer) and test.py (303 LoC tiled evaluator): fine-tune
CroCoDownstreamBinocular on dense correspondence with the Laplacian NLL
(criterion.py), evaluate with EPE / bad-pixel rates / D1, and run
full-resolution inference by tiled overlapping crops blended by
predicted confidence (test.py's ``tiled_pred``).

TPU-first: one jitted train step (donated params/opt), fixed crop sizes
so every tile shares a single compiled program, conf-weighted tile
blending as pure jnp.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.croco_pretrain import (CroCoConfig, CroCoDownstreamBinocular,
                                     laplacian_nll)

__all__ = ["StereoFlowConfig", "train_stereoflow", "evaluate_stereoflow",
           "tiled_predict", "flow_metrics"]


@dataclasses.dataclass
class StereoFlowConfig:
    task: str = "flow"              # "stereo" (1ch) | "flow" (2ch)
    lr: float = 3e-5
    weight_decay: float = 0.05
    total_steps: int = 100
    warmup_steps: int = 10
    crop: Tuple[int, int] = (224, 224)   # train/inference tile (HxW)
    tile_overlap: float = 0.5
    log_every: int = 10

    @property
    def num_channels(self) -> int:
        return 1 if self.task == "stereo" else 2


def make_stereoflow_step(model: CroCoDownstreamBinocular, tx):
    def loss_fn(params, batch):
        pred, conf = model.apply(params, batch["img1"], batch["img2"])
        return laplacian_nll(pred, batch["gt"], conf,
                             batch.get("valid")), pred

    def step(params, opt_state, batch):
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def train_stereoflow(model_cfg: CroCoConfig, data_iter: Iterator[Dict],
                     tcfg: StereoFlowConfig,
                     init_params=None,
                     log_fn: Callable[[Dict], None] = print):
    """Fine-tune loop (stereoflow/train.py:1-455 semantics: AdamW +
    cosine schedule with warmup, Laplacian NLL, periodic logging).

    data_iter yields {img1, img2 (B,H,W,3) in [-1,1], gt (B,H,W,C),
    valid (B,H,W)?}. Returns (model, params, losses).
    """
    model = CroCoDownstreamBinocular(model_cfg,
                                     num_channels=tcfg.num_channels,
                                     with_conf=True)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, tcfg.lr, tcfg.warmup_steps, max(tcfg.total_steps, 2))
    tx = optax.adamw(sched, weight_decay=tcfg.weight_decay)
    batch0 = next(data_iter)
    if init_params is None:
        init_params = model.init(jax.random.PRNGKey(0),
                                 jnp.asarray(batch0["img1"]),
                                 jnp.asarray(batch0["img2"]))
    params = init_params
    opt_state = tx.init(params)
    step = jax.jit(make_stereoflow_step(model, tx),
                   donate_argnums=(0, 1))
    losses = []
    for i in range(tcfg.total_steps):
        batch = batch0 if i == 0 else next(data_iter)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        params, opt_state, loss = step(params, opt_state, batch)
        if i % tcfg.log_every == 0 or i == tcfg.total_steps - 1:
            losses.append(float(loss))
            log_fn({"step": i, "loss": round(float(loss), 5)})
    return model, params, losses


# ---------------------------------------------------------------------------
# tiled full-resolution inference (stereoflow/test.py tiled_pred)
# ---------------------------------------------------------------------------

def _tile_starts(full: int, crop: int, overlap: float):
    if full <= crop:
        return [0]
    stride = max(1, int(crop * (1.0 - overlap)))
    starts = list(range(0, full - crop, stride)) + [full - crop]
    return sorted(set(starts))


def tiled_predict(model, params, img1: np.ndarray, img2: np.ndarray,
                  crop: Tuple[int, int] = (224, 224),
                  overlap: float = 0.5) -> np.ndarray:
    """Full-image prediction by overlapping crops, blended by the
    predicted confidence (test.py:tiled_pred conf-argmax semantics,
    relaxed to conf-weighted averaging for seam smoothness).

    img1/img2: (H, W, 3) in [-1, 1]. Returns (H, W, C).
    """
    H, W = img1.shape[:2]
    ch, cw = crop
    ys = _tile_starts(H, ch, overlap)
    xs = _tile_starts(W, cw, overlap)
    tiles1, tiles2, boxes = [], [], []
    for y in ys:
        for x in xs:
            tiles1.append(img1[y:y + ch, x:x + cw])
            tiles2.append(img2[y:y + ch, x:x + cw])
            boxes.append((y, x))
    t1 = jnp.asarray(np.stack(tiles1))
    t2 = jnp.asarray(np.stack(tiles2))
    pred, conf = jax.jit(model.apply)(params, t1, t2)
    pred = np.asarray(pred, np.float32)
    conf = np.asarray(conf, np.float32)
    C = pred.shape[-1]
    acc = np.zeros((H, W, C), np.float32)
    wacc = np.zeros((H, W, 1), np.float32)
    for p, c, (y, x) in zip(pred, conf, boxes):
        w = 1.0 / np.maximum(c, 1e-3)[..., None]  # low s = confident
        acc[y:y + ch, x:x + cw] += p * w
        wacc[y:y + ch, x:x + cw] += w
    return acc / np.maximum(wacc, 1e-12)


def flow_metrics(pred: np.ndarray, gt: np.ndarray,
                 valid: Optional[np.ndarray] = None) -> Dict[str, float]:
    """EPE + bad-pixel rates (stereoflow/test.py metrics: bad@{1,3,5},
    D1 = err > 3px AND > 5% of magnitude)."""
    err = np.linalg.norm(pred - gt, axis=-1)
    mag = np.linalg.norm(gt, axis=-1)
    if valid is None:
        valid = np.ones(err.shape, bool)
    v = valid.astype(bool)
    e = err[v]
    m = mag[v]
    out = {"epe": float(e.mean()) if e.size else 0.0,
           "n_valid": int(v.sum())}
    for t in (1.0, 3.0, 5.0):
        out[f"bad@{int(t)}px"] = float((e > t).mean()) if e.size else 0.0
    out["d1_all"] = float(((e > 3.0) & (e > 0.05 * np.maximum(m, 1e-6)))
                          .mean()) if e.size else 0.0
    return out


def evaluate_stereoflow(model, params, pairs, crop=(224, 224),
                        overlap: float = 0.5) -> Dict[str, float]:
    """Evaluate over an iterable of {img1, img2, gt[, valid]} samples
    at full resolution via tiled inference; returns mean metrics."""
    agg: Dict[str, list] = {}
    for s in pairs:
        pred = tiled_predict(model, params, np.asarray(s["img1"]),
                             np.asarray(s["img2"]), crop, overlap)
        m = flow_metrics(pred, np.asarray(s["gt"]), s.get("valid"))
        for k, val in m.items():
            agg.setdefault(k, []).append(val)
    return {k: float(np.mean(v)) for k, v in agg.items()}
