"""Jitted CUT3R training step (data-parallel / FSDP over a Mesh).

Replaces the reference's Accelerate-DDP trainer step (src/train.py:109-916):
under `jit` with sharded params/batch, XLA inserts the gradient psums
(DDP's all-reduce) or reduce-scatters (FSDP) over ICI automatically.
TBPTT chunking (inference.py:90-216) maps to the `lax.scan` recurrence
already inside the model; gradient flow across the scan carry is the
full-backprop variant, with `jax.checkpoint` available for memory.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import optax

from ..models import CUT3R
from .losses import cut3r_total_loss

__all__ = ["make_optimizer", "make_train_step", "init_train_state"]


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.05,
                   warmup_steps: int = 100, total_steps: int = 100_000,
                   accum_steps: int = 1):
    """AdamW + clip (+ gradient accumulation via optax.MultiSteps — the
    reference's Accelerator(gradient_accumulation_steps), src/train.py:112)."""
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def init_train_state(model: CUT3R, rng, sample_batch, tx):
    params = model.init(rng, sample_batch["imgs"])
    opt_state = tx.init(params)
    return params, opt_state


def make_train_step(model: CUT3R, tx):
    """Returns a jittable (params, opt_state, batch) -> (params, opt_state, aux).

    batch: imgs (V,B,H,W,3) in [-1,1]; pts3d (V,B,H,W,3) world;
    camera_pose (V,B,4,4) c2w; valid_mask (V,B,H,W); img optional.
    """

    def loss_fn(params, batch):
        # true_shape: optional (V, B, 2) ManyAR orientation rows — the
        # multi-aspect dataset convention (portrait samples stored
        # transposed; see models/patch_embed.py)
        pred = model.apply(params, batch["imgs"],
                           true_shape=batch.get("true_shape"))
        gt = {"pts3d": batch["pts3d"], "camera_pose": batch["camera_pose"],
              "valid_mask": batch["valid_mask"]}
        if "img" in batch:
            gt["img"] = batch["img"]
        return cut3r_total_loss(pred, gt)

    def train_step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return train_step


def make_tbptt_train_step(model: CUT3R, tx, chunk: int = 4,
                          grad_chunks: int = 4):
    """Truncated-BPTT step (inference.py:90-216 semantics): ALL views are
    encoded once WITHOUT gradient (the reference's no-grad encoder pass,
    inference.py:100-117 — encoder params receive no update and encoder
    activations are not kept for backprop); the view axis is then split
    into decoder chunks of ``chunk``; the recurrent (state, mem) carry is
    stop-gradient'ed between chunks, and only the losses of the last
    ``grad_chunks`` chunks contribute gradients.
    """

    def loss_fn(params, batch):
        imgs = batch["imgs"]
        V, B, H, W, _ = imgs.shape
        # no-grad encoder pass over all views at once
        feat, pos = model.apply(params, imgs.reshape(V * B, H, W, 3),
                                method=CUT3R.encode_image)
        feat = jax.lax.stop_gradient(feat)
        pos = jax.lax.stop_gradient(pos)
        N = feat.shape[1]
        feat = feat.reshape(V, B, N, -1)
        pos = pos.reshape(V, B, N, 2)
        n_chunks = (V + chunk - 1) // chunk
        carry = None
        total = 0.0
        n_loss = 0.0
        for c in range(n_chunks):
            s, e = c * chunk, min((c + 1) * chunk, V)
            out, carry = model.apply(
                params, feat[s:e], pos[s:e], H, W, carry, jnp.int32(s),
                method=CUT3R.decode_views)
            carry = jax.tree.map(jax.lax.stop_gradient, carry)
            if c >= n_chunks - grad_chunks:
                gt = {"pts3d": batch["pts3d"][s:e],
                      "camera_pose": batch["camera_pose"][s:e],
                      "valid_mask": batch["valid_mask"][s:e]}
                if "img" in batch:
                    gt["img"] = batch["img"][s:e]
                li, _ = cut3r_total_loss(out, gt)
                total = total + li
                n_loss += 1.0
            else:
                out = jax.tree.map(jax.lax.stop_gradient, out)
        loss = total / max(n_loss, 1.0)
        return loss, {"total": loss}

    def train_step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return train_step
