"""Fixed-capacity keyframe store.

Counterpart of /root/reference/hislam2/keyframe.py (ring-buffer tensors
guarded by an mp.Value lock). The TPU-native design is single-controller:
one host loop owns the store, so no lock is needed. Small per-frame
metadata (poses, timestamps, intrinsics) lives in host numpy (cheap
mutation); bulky per-keyframe tensors used inside jitted stages (encoder
features, depths, submap pointmaps) live in device arrays updated through
donated `dynamic_update_slice` jits — in-place on device, no reallocation,
shapes never change.

Submap layout matches keyframe.py:28: ``submaps`` groups 5 keyframes + 1
overlap slot that mirrors the next submap's first frame (maintained by the
frontend, see hi2.py:91).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["KeyframeStore", "SUBMAP_SIZE"]

SUBMAP_SIZE = 5  # keyframes per submap (keyframe.py:28)


@partial(jax.jit, donate_argnums=0)
def _ring_write(buf: jax.Array, idx: jax.Array, val: jax.Array) -> jax.Array:
    return jax.lax.dynamic_update_index_in_dim(buf, val, idx, 0)


class KeyframeStore:
    """Preallocated keyframe buffers; `count` is a host int."""

    def __init__(self, capacity: int, img_hw, feat_tokens: int,
                 feat_dim: int, map_hw=None):
        H, W = img_hw
        self.capacity = int(capacity)
        self.img_hw = (H, W)
        self.map_hw = tuple(map_hw) if map_hw is not None else (H, W)
        self.count = 0

        # host-side metadata / imagery
        self.tstamp = np.full(capacity, -1, np.int64)
        self.pose = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32),
                            (capacity, 1))  # c2w [t, q xyzw]
        self.intrinsic = np.zeros((capacity, 4), np.float32)
        self.image = np.zeros((capacity, H, W, 3), np.uint8)
        mH, mW = self.map_hw
        self.image_map = np.zeros((capacity, mH, mW, 3), np.uint8)
        self.intrinsic_map = np.zeros((capacity, 4), np.float32)
        self.depth = np.zeros((capacity, H, W), np.float32)

        # device-side: encoder features for overlap tests (motion filter /
        # factor graph), submap pointmaps for loop closure
        self.featI = jnp.zeros((capacity, feat_tokens, feat_dim), jnp.float32)
        n_submaps = capacity // SUBMAP_SIZE + 1
        self.submap_pts = jnp.zeros(
            (n_submaps, SUBMAP_SIZE + 1, H // 2, W // 2, 3), jnp.float32)
        self.submap_conf = jnp.zeros(
            (n_submaps, SUBMAP_SIZE + 1, H // 2, W // 2), jnp.float32)
        # per-KF half-res world pointmaps for the factor graph's
        # reprojection-overlap kernels (written by the frontend after each
        # submap inference; rigidly re-transformed on loop closure)
        self.pts_ds = jnp.zeros((capacity, H // 2, W // 2, 3), jnp.float32)

        # mono-prior maps (Omnidata-style PriorNet, motion_filter.py:58-66
        # hook); allocated lazily by ensure_prior_buffers() when the
        # config enables the prior path
        self.prior_depth: Optional[np.ndarray] = None
        self.prior_normal: Optional[np.ndarray] = None

    def ensure_prior_buffers(self):
        if self.prior_depth is None:
            H, W = self.img_hw
            self.prior_depth = np.zeros((self.capacity, H, W), np.float32)
            self.prior_normal = np.zeros((self.capacity, H, W, 3),
                                         np.float32)

    # ------------------------------------------------------------------
    def append(self, tstamp: int, image: np.ndarray,
               feat: Optional[jax.Array] = None,
               pose: Optional[np.ndarray] = None,
               depth: Optional[np.ndarray] = None,
               intrinsic: Optional[np.ndarray] = None,
               image_map: Optional[np.ndarray] = None,
               intrinsic_map: Optional[np.ndarray] = None) -> int:
        i = self.count
        if i >= self.capacity:
            raise RuntimeError(f"keyframe buffer full ({self.capacity})")
        self.tstamp[i] = tstamp
        self.image[i] = image
        if pose is not None:
            self.pose[i] = pose
        if depth is not None:
            self.depth[i] = depth
        if intrinsic is not None:
            self.intrinsic[i] = intrinsic
        if image_map is not None:
            self.image_map[i] = image_map
        if intrinsic_map is not None:
            self.intrinsic_map[i] = intrinsic_map
        if feat is not None:
            self.featI = _ring_write(self.featI, jnp.int32(i), feat)
        self.count += 1
        return i

    def last_feat(self) -> jax.Array:
        return self.featI[self.count - 1]

    # ------------------------------------------------------------------
    def set_submap(self, submap_idx: int, pts: jax.Array, conf: jax.Array,
                   slot0: int = 0):
        """Write pointmaps/conf for slots [slot0, slot0+len) of a submap."""
        n = pts.shape[0]
        self.submap_pts = jax.lax.dynamic_update_slice(
            self.submap_pts, pts[None],
            (submap_idx, slot0, 0, 0, 0))
        self.submap_conf = jax.lax.dynamic_update_slice(
            self.submap_conf, conf[None], (submap_idx, slot0, 0, 0))

    def normalize_scale(self, scale: float):
        """Global rescale of translations/depths (keyframe.py:139-148)."""
        self.pose[:, :3] *= scale
        self.depth *= scale
        self.submap_pts = self.submap_pts * scale

    @property
    def n_submaps(self) -> int:
        return max(0, (self.count + SUBMAP_SIZE - 1) // SUBMAP_SIZE)
