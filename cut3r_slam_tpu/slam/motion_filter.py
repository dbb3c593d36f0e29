"""Keyframe selection by encoder-feature overlap.

Counterpart of /root/reference/hislam2/motion_filter.py: always keep frame
0 and the last two frames; every ``skip`` frames, encode the image with the
CUT3R ViT encoder and take it as a keyframe when the patch-feature overlap
with the previous keyframe drops below ``thresh``; alternatively a fixed
``kf_every`` interval. The overlap metric is util/utils.py:726-737:
normalized patch cosine similarity, max over rows, fraction matched > 0.7.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import CUT3R, normalize_images
from .keyframe import KeyframeStore

__all__ = ["MotionFilter", "patch_overlap_ratio"]


@jax.jit
def patch_overlap_ratio(feat0: jax.Array, feat1: jax.Array,
                        threshold: float = 0.7) -> jax.Array:
    """feat*: (N, D) encoder tokens. Skips token 0 like the reference."""
    f0 = feat0[1:]
    f1 = feat1[1:]
    f0 = f0 / jnp.maximum(jnp.linalg.norm(f0, axis=1, keepdims=True), 1e-12)
    f1 = f1 / jnp.maximum(jnp.linalg.norm(f1, axis=1, keepdims=True), 1e-12)
    sim = f0 @ f1.T
    max_sim = sim.max(axis=1)
    return (max_sim > threshold).astype(jnp.float32).mean()


class MotionFilter:
    def __init__(self, model: CUT3R, params, keyframes: KeyframeStore,
                 thresh: float = 0.9, skip: int = 5, kf_every: int = 0,
                 prior=None):
        self.model = model
        self.params = params
        self.keyframes = keyframes
        self.thresh = float(thresh)
        self.skip = int(skip)
        self.kf_every = int(kf_every)
        # optional mono-prior hook (the reference computes Omnidata
        # depth/normal priors per keyframe at this exact call-site,
        # motion_filter.py:58-66): prior = (depth_fn, normal_fn), each
        # (H, W, 3) u8 -> map; outputs stored in the KF prior buffers
        self.prior = prior
        if prior is not None:
            keyframes.ensure_prior_buffers()

        @jax.jit
        def _encode(params, img_u8):
            x = normalize_images(img_u8)[None]
            feat, pos = model.apply(params, x, method=CUT3R.encode_image)
            return feat[0], pos[0]

        self._encode = _encode

    def encode(self, image_u8: np.ndarray) -> jax.Array:
        feat, _ = self._encode(self.params, jnp.asarray(image_u8))
        return feat

    def __call__(self, tstamp: int, image_u8: np.ndarray,
                 intrinsic: Optional[np.ndarray] = None,
                 pose: Optional[np.ndarray] = None,
                 depth: Optional[np.ndarray] = None,
                 second_last: bool = False, last: bool = False,
                 image_map: Optional[np.ndarray] = None,
                 intrinsic_map: Optional[np.ndarray] = None) -> bool:
        """Run on every frame; returns True if a keyframe was added."""
        kf = self.keyframes
        force = kf.count == 0 or last or second_last
        if force:
            feat = self.encode(image_u8)
            i = kf.append(tstamp, image_u8, feat, pose, depth, intrinsic,
                          image_map, intrinsic_map)
            self._store_priors(i, image_u8)
            return True

        take = False
        feat = None
        if self.kf_every > 0:
            if tstamp % self.kf_every == 0:
                feat = self.encode(image_u8)
                take = True
        elif tstamp % self.skip == 0:
            feat = self.encode(image_u8)
            ratio = float(patch_overlap_ratio(kf.last_feat(), feat))
            take = ratio < self.thresh
        if take:
            i = kf.append(tstamp, image_u8, feat, pose, depth, intrinsic,
                          image_map, intrinsic_map)
            self._store_priors(i, image_u8)
        return take

    def _store_priors(self, idx: int, image_u8: np.ndarray):
        if self.prior is None:
            return
        depth_fn, normal_fn = self.prior
        kf = self.keyframes
        if depth_fn is not None:
            kf.prior_depth[idx] = np.asarray(depth_fn(image_u8), np.float32)
        if normal_fn is not None:
            kf.prior_normal[idx] = np.asarray(normal_fn(image_u8),
                                              np.float32)
