"""CUT3R training loop (data-parallel / FSDP over a TPU mesh).

Counterpart of /root/reference/src/train.py (Hydra+Accelerate DDP trainer)
mapped to jax.distributed + pjit: one jitted train step with sharded
params/batch (XLA inserts the gradient collectives), checkpointing via
orbax, metrics to stdout/JSONL. TBPTT (inference.py:90-216) corresponds to
a `jax.checkpoint`-wrapped model scan plus `stop_gradient` on the carried
state between chunks — here the recurrence lives inside the model's
lax.scan and full backprop through it is the default; `tbptt_chunk`
truncates by splitting the view axis and stopping gradients between
chunks at the loss level.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import CUT3R
from ..parallel import make_mesh, shard_batch, fsdp_shard_params
from .train_step import make_optimizer, make_train_step

__all__ = ["TrainerConfig", "train"]


@dataclasses.dataclass
class TrainerConfig:
    lr: float = 1e-4
    weight_decay: float = 0.05
    warmup_steps: int = 1000
    total_steps: int = 100_000
    log_every: int = 50
    ckpt_every: int = 1000
    ckpt_dir: str = "outputs/ckpt"
    fsdp: int = 1
    seed: int = 0
    accum_steps: int = 1          # gradient accumulation (train.py:112)
    resume: bool = False          # resume from latest ckpt in ckpt_dir
    tbptt_chunk: int = 0          # >0: TBPTT with no-grad encoder pass
    tbptt_grad_chunks: int = 4
    eval_every: int = 0           # >0: run eval_fn every N steps


def _save_ckpt(path: str, params, opt_state, step: int):
    """Full train-state checkpoint (params + optimizer state + step) so a
    crashed run resumes exactly (reference resumes epoch ckpts,
    src/train.py:229-268)."""
    import pickle
    os.makedirs(path, exist_ok=True)
    host = jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "ndim") else x,
        {"params": params, "opt_state": opt_state, "step": step})
    tmp = os.path.join(path, f"step_{step}.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(host, f)
    os.replace(tmp, os.path.join(path, f"step_{step}.pkl"))


def _load_latest_ckpt(path: str):
    """Returns (params, opt_state, step) of the newest ckpt, or None."""
    import glob
    import pickle
    cands = glob.glob(os.path.join(path, "step_*.pkl"))
    if not cands:
        return None
    latest = max(cands, key=lambda p: int(
        os.path.basename(p).split("_")[1].split(".")[0]))
    with open(latest, "rb") as f:
        state = pickle.load(f)
    return state["params"], state["opt_state"], int(state["step"])


def train(model: CUT3R, data_iter: Iterator[Dict[str, np.ndarray]],
          tcfg: TrainerConfig = TrainerConfig(),
          init_params: Optional[Any] = None,
          log_fn: Callable[[Dict], None] = lambda m: print(json.dumps(m)),
          eval_fn: Optional[Callable[[Any, int], Dict]] = None):
    """Run the training loop. ``data_iter`` yields batches with keys
    imgs (V,B,H,W,3) in [-1,1], pts3d, camera_pose (V,B,4,4),
    valid_mask (V,B,H,W) [, img].
    """
    from .train_step import make_tbptt_train_step
    n_dev = len(jax.devices())
    fsdp = tcfg.fsdp if n_dev % max(tcfg.fsdp, 1) == 0 else 1
    mesh = make_mesh(n_dev, axes=("dp", "fsdp"),
                     shape=(n_dev // max(fsdp, 1), max(fsdp, 1)))

    tx = make_optimizer(tcfg.lr, tcfg.weight_decay, tcfg.warmup_steps,
                        tcfg.total_steps, accum_steps=tcfg.accum_steps)
    batch0 = next(data_iter)
    start_step = 0
    resumed = None
    if tcfg.resume:
        resumed = _load_latest_ckpt(tcfg.ckpt_dir)
    if resumed is not None:
        init_params, resumed_opt, start_step = resumed
        log_fn({"resumed_from_step": start_step})
    elif init_params is None:
        init_params = model.init(jax.random.PRNGKey(tcfg.seed),
                                 jnp.asarray(batch0["imgs"]))

    with mesh:
        params = fsdp_shard_params(mesh, jax.tree.map(jnp.asarray,
                                                      init_params),
                                   axis="fsdp")
        opt_state = tx.init(params)
        if resumed is not None:
            # restore leaf VALUES but keep the freshly-init'd state's
            # shardings, so with fsdp>1 the resumed optimizer state comes
            # back sharded like params (not fully replicated). Leaves
            # whose fresh sharding is single-device (opt counters) stay
            # UNCOMMITTED — committing them would conflict with the
            # multi-device params placement inside the jitted step.
            def _restore(ref, x):
                x = jnp.asarray(x)
                sh = getattr(ref, "sharding", None)
                if sh is not None and getattr(sh, "num_devices", 1) > 1:
                    return jax.device_put(x, sh)
                return x

            opt_state = jax.tree.map(_restore, opt_state,
                                     jax.tree.map(jnp.asarray, resumed_opt))
        if tcfg.tbptt_chunk > 0:
            step_fn = jax.jit(make_tbptt_train_step(
                model, tx, chunk=tcfg.tbptt_chunk,
                grad_chunks=tcfg.tbptt_grad_chunks), donate_argnums=(0, 1))
        else:
            step_fn = jax.jit(make_train_step(model, tx),
                              donate_argnums=(0, 1))

        t0 = time.time()
        for step in range(start_step, tcfg.total_steps):
            batch = batch0 if step == start_step else next(data_iter)
            batch = shard_batch(mesh, jax.tree.map(jnp.asarray, batch),
                                axis="dp", dim=1)
            params, opt_state, aux = step_fn(params, opt_state, batch)
            if step % tcfg.log_every == 0:
                loss = float(aux["total"])
                log_fn({"step": step, "loss": round(loss, 5),
                        "sec_per_step": round(
                            (time.time() - t0)
                            / max(step - start_step, 1), 3)})
            if eval_fn is not None and tcfg.eval_every > 0 \
                    and step > 0 and step % tcfg.eval_every == 0:
                log_fn({"step": step, **(eval_fn(params, step) or {})})
            if step > 0 and step % tcfg.ckpt_every == 0:
                _save_ckpt(tcfg.ckpt_dir, params, opt_state, step)
        _save_ckpt(tcfg.ckpt_dir, params, opt_state, tcfg.total_steps)
    return params
