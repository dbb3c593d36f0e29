"""Non-keyframe pose filling by render-based pose optimization.

Counterpart of /root/reference/hislam2/util/trajectory_filler.py +
GSBackEnd.pose_estimator (gs_backend_per_frame.py:123-177): every non-KF
frame's pose is initialized from the nearest earlier keyframe and refined
with N Adam iterations of render RGB loss against the Gaussian map.
"""
from __future__ import annotations

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.pointmap import pose_vec_to_matrix
from ..geometry.lie import se3_from_matrix
from .camera import se3_delta_to_matrix
from .mapping import MappingBackend, _adam_init, _adam_step

__all__ = ["TrajectoryFiller"]


class TrajectoryFiller:
    def __init__(self, mapper: MappingBackend, iters: int = 100):
        self.mapper = mapper
        self.iters = iters
        cfg = mapper.cfg
        rcfg = mapper.raster_cfg
        K4 = mapper.K4

        def refine(params, alive, image, w2c0):
            from .renderer import render_view
            deltas = {"t": jnp.zeros(3), "r": jnp.zeros(3)}
            adam = _adam_init(deltas)
            lrs = {"t": cfg.pose_lr * 10, "r": cfg.pose_lr * 2}

            def loss_fn(d):
                out = render_view(params, alive, w2c0, K4, rcfg,
                                  trans_delta=d["t"], rot_delta=d["r"])
                a = jax.lax.stop_gradient(out["alpha"] > 0.5)
                return jnp.abs((image - out["color"]) * a[..., None]).sum() \
                    / jnp.maximum(a.sum() * 3, 1.0)

            def step(carry, _):
                d, adam = carry
                g = jax.grad(loss_fn)(d)
                d, adam = _adam_step(d, g, adam, lrs)
                return (d, adam), None

            (deltas, _), _ = jax.lax.scan(step, (deltas, adam), None,
                                          length=iters)
            return se3_delta_to_matrix(deltas["t"], deltas["r"]) @ w2c0

        self._refine = jax.jit(refine)

    def fill(self, images: List[np.ndarray], tstamps: List[int],
             kf_tstamps: np.ndarray, kf_poses: np.ndarray) -> np.ndarray:
        """images: non-KF frames; returns (N, 7) c2w [t, q xyzw] poses."""
        out = []
        params = self.mapper.arena.params()
        alive = self.mapper.arena.alive
        for img, t in zip(images, tstamps):
            k = int(np.searchsorted(kf_tstamps, t, side="right") - 1)
            k = max(k, 0)
            c2w0 = np.asarray(pose_vec_to_matrix(jnp.asarray(kf_poses[k])))
            w2c0 = jnp.asarray(np.linalg.inv(c2w0))
            w2c = self._refine(params, alive,
                               jnp.asarray(img, jnp.float32) / 255.0, w2c0)
            c2w = np.linalg.inv(np.asarray(w2c))
            out.append(np.asarray(se3_from_matrix(jnp.asarray(c2w))))
        return np.stack(out) if out else np.zeros((0, 7), np.float32)
