"""Fixed-capacity camera (viewpoint) buffer for the mapping backend.

Counterpart of /root/reference/hislam2/gaussian/utils/camera_utils.py: each
keyframe viewpoint holds a w2c pose, the RGB/depth observations, se3 pose
deltas (optimized by pose refinement), and a per-view affine exposure
(3x3 A + b). Here all viewpoints live in capacity-C arrays so every
mapping program is shape-static; windows are index vectors + weight masks.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..geometry.lie import se3_exp
from ..geometry.quaternion import xyzw_to_wxyz, matrix_to_quat

__all__ = ["CameraBuffer", "se3_delta_to_matrix"]


def se3_delta_to_matrix(trans_delta: jax.Array, rot_delta: jax.Array):
    """SE3_exp([trans, rot]) as 4x4 (slam_utils.py:26-106 tau-first order)."""
    from ..geometry.lie import se3_matrix
    return se3_matrix(se3_exp(jnp.concatenate([trans_delta, rot_delta], -1)))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CameraBuffer:
    """Capacity-C viewpoint arrays. Images uint8, depth bf16 to save HBM."""
    w2c: jax.Array        # (C, 4, 4)
    image: jax.Array      # (C, H, W, 3) uint8
    depth: jax.Array      # (C, H, W) bfloat16 (gt/tracked depth)
    exposure_a: jax.Array  # (C, 3, 3)
    exposure_b: jax.Array  # (C, 3)
    valid: jax.Array      # (C,) bool

    @staticmethod
    def empty(capacity: int, h: int, w: int) -> "CameraBuffer":
        return CameraBuffer(
            w2c=jnp.tile(jnp.eye(4)[None], (capacity, 1, 1)),
            image=jnp.zeros((capacity, h, w, 3), jnp.uint8),
            depth=jnp.zeros((capacity, h, w), jnp.bfloat16),
            exposure_a=jnp.tile(jnp.eye(3)[None], (capacity, 1, 1)),
            exposure_b=jnp.zeros((capacity, 3)),
            valid=jnp.zeros((capacity,), bool))

    def add(self, idx: int, image_u8, depth, w2c) -> "CameraBuffer":
        return dataclasses.replace(
            self,
            w2c=self.w2c.at[idx].set(w2c),
            image=self.image.at[idx].set(image_u8),
            depth=self.depth.at[idx].set(depth.astype(jnp.bfloat16)),
            valid=self.valid.at[idx].set(True))

    def cam_quat_wxyz(self, idx):
        """w2c rotation as wxyz quat (for Gaussian frame transforms)."""
        q = matrix_to_quat(self.w2c[idx, :3, :3])
        return xyzw_to_wxyz(q)
