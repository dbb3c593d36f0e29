"""SLAM orchestrator — the Hi2 equivalent.

Counterpart of /root/reference/hislam2/hi2.py: wires the motion filter,
tracking frontend, loop-closure backend and Gaussian mapping backend and
drives them per frame:

``run(t, img, K, img_map, K_map, second_last, last)`` (hi2.py:101-135):
  keyframe filter -> frontend submap tracking -> (freeze-gated) loop
  backend -> on closure: mapper.gaussian_update + pose/submap writeback ->
  mapping update for the new keyframes + depth/pose writeback into the
  keyframe store (hi2.py:56-99, incl. the submap overlap row :91).

``terminate(...)`` (hi2.py:153-229): final global BA, optional per-gap
keyframe densification, trajectory dump and rendering eval.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from ..models import CUT3R
from ..geometry.pointmap import pose_vec_to_matrix
from .keyframe import KeyframeStore, SUBMAP_SIZE
from .motion_filter import MotionFilter
from .factor_graph import FactorGraph
from .frontend import TrackFrontend
from .backend import TrackBackend
from .mapping import MappingBackend, MappingConfig

__all__ = ["SLAMSystem"]


class SLAMSystem:
    def __init__(self, model: CUT3R, params, cfg: Dict,
                 buffer: int = 512, img_hw=(384, 512), map_hw=None,
                 enable_mapping: bool = True, enable_loop: bool = True,
                 output_dir: str = "outputs/run"):
        tcfg = cfg.get("Tracking", {})
        mcfg = cfg.get("Mapping", {})
        trcfg = cfg.get("Training", {})
        H, W = img_hw
        map_hw = tuple(map_hw) if map_hw is not None else (H, W)
        feat_tokens = (H // 16) * (W // 16)

        self.keyframes = KeyframeStore(
            buffer, img_hw, feat_tokens, model.cfg.enc_embed_dim,
            map_hw=map_hw)
        self.filter = MotionFilter(
            model, params, self.keyframes,
            thresh=tcfg.get("motion_filter", {}).get("thresh", 0.9),
            skip=tcfg.get("motion_filter", {}).get("skip", 5),
            kf_every=tcfg.get("motion_filter", {}).get("kf_every", 0))
        self.graph = FactorGraph()
        self.frontend = TrackFrontend(model, params, self.keyframes,
                                      self.graph)
        self.backend = TrackBackend(
            self.frontend, self.keyframes, self.graph,
            loop_iters=tcfg.get("backend", {}).get("loop_iters", 2000),
            loop_gap=tcfg.get("backend", {}).get("loop_gap", 8),
            nms_thresh=tcfg.get("backend", {}).get("nms_thresh", 0.4))
        self.enable_loop = enable_loop

        self.mapper: Optional[MappingBackend] = None
        self.enable_mapping = enable_mapping
        self._map_cfg_extra = dict(
            capacity=mcfg.get("arena_capacity", 2 ** 18),
            cam_capacity=buffer,
            window_size=mcfg.get("window_size", 10),
            lambda_depth=mcfg.get("lambda_depth", 0.5),
            lambda_normal=mcfg.get("lambda_normal", 0.05),
            lambda_iso=mcfg.get("lambda_iso", 10.0),
            pose_lr=trcfg.get("pose_lr", 0.0003))
        self.map_hw = map_hw
        self.output_dir = output_dir
        self.mapping_iters = mcfg.get("iterations", 100)
        self.keep_all_frames = bool(cfg.get("keep_all_frames", True))
        self.images: Dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------
    def _init_mapper(self, K4_map):
        mh, mw = self.map_hw
        self.mapper = MappingBackend(
            MappingConfig(height=mh, width=mw, **self._map_cfg_extra),
            np.asarray(K4_map, np.float32))

    def run(self, t: int, img: np.ndarray, K4: np.ndarray,
            img_map: Optional[np.ndarray] = None,
            K4_map: Optional[np.ndarray] = None,
            second_last: bool = False, last: bool = False):
        """Per-frame step (hi2.py:101-135)."""
        if self.keep_all_frames:
            # full-frame host store for terminate-time densification and
            # trajectory filling (hi2.py:103 self.images dict)
            self.images[t] = img_map if img_map is not None else img
        took = self.filter(t, img, intrinsic=K4, second_last=second_last,
                           last=last, image_map=img_map,
                           intrinsic_map=K4_map)
        run_backend, viz_range, submap_idx = self.frontend.run(t, last)

        if run_backend and self.enable_loop:
            updates = self.backend.run(self.frontend.t1)
            if updates is not None and self.mapper is not None:
                self.mapper.gaussian_update(
                    updates["submap_idx"], updates["pose_updates"],
                    list(updates["camera_idx"]),
                    [np.linalg.inv(np.asarray(pose_vec_to_matrix(
                        jnp.asarray(p)))) for p in updates["camera_pose"]])

        if viz_range is not None and self.enable_mapping:
            self.call_mapper(viz_range, submap_idx)
        return took, viz_range

    # ------------------------------------------------------------------
    def call_mapper(self, viz_range, submap_idx):
        """Build the mapping packet + writeback (hi2.py:56-99)."""
        kf = self.keyframes
        if self.mapper is None:
            if kf.intrinsic_map[0].sum() == 0:
                kf.intrinsic_map[:kf.count] = kf.intrinsic[:kf.count]
            self._init_mapper(kf.intrinsic_map[0])
        idxs = list(viz_range)
        mh, mw = self.map_hw
        ds = self.mapper.cfg.downsample

        imgs = kf.image_map[idxs] if kf.image_map[idxs].sum() else kf.image[idxs]
        depths = np.stack([_resize_f(kf.depth[i], mw, mh) for i in idxs])
        pts = np.asarray(kf.pts_ds[np.asarray(idxs)]) if hasattr(kf, "pts_ds") \
            else np.zeros((len(idxs), mh // ds, mw // ds, 3), np.float32)
        sub = submap_idx
        confs = np.asarray(kf.submap_conf[sub])[:len(idxs)] if sub is not None \
            else np.ones((len(idxs), mh // ds, mw // ds), np.float32)
        confs = np.stack([_resize_f(c, mw // ds, mh // ds) for c in confs])
        pts = np.stack([_resize_pts(p, mw // ds, mh // ds) for p in pts])
        w2cs = np.stack([np.linalg.inv(np.asarray(pose_vec_to_matrix(
            jnp.asarray(kf.pose[i])))) for i in idxs])

        packet = {"viz_idx": idxs, "images": imgs, "depths": depths,
                  "pointmaps": pts, "confs": confs, "w2c": w2cs,
                  "submap_idx": sub or 0,
                  "tstamp": kf.tstamp[idxs]}
        upd = self.mapper.run(packet, self.mapping_iters)

        # writeback refined poses/depths (hi2.py:84-91)
        for d, p, c2w, k in zip(upd["depths"], upd["pointmaps"],
                                upd["c2w"], upd["window"]):
            from ..geometry.lie import se3_from_matrix
            kf.pose[k] = np.asarray(se3_from_matrix(jnp.asarray(c2w)))
            th, tw = kf.img_hw
            kf.depth[k] = _resize_f(d, tw, th)

    # ------------------------------------------------------------------
    def add_kf_densify(self, gap: int = 30):
        """Terminate-time densification (hi2.py:177-214): for keyframe
        gaps > ``gap`` frames, track the middle frame against its
        predecessor KF (2-view CUT3R) and add it as a mapping view."""
        kf = self.keyframes
        if self.mapper is None or not self.images:
            return 0
        added = 0
        n = kf.count
        for i in range(n - 1):
            t0, t1 = int(kf.tstamp[i]), int(kf.tstamp[i + 1])
            if t1 - t0 <= gap:
                continue
            tm = (t0 + t1) // 2
            if tm not in self.images:
                continue
            # 2-view prediction padded into the fixed V=6 program
            import jax.numpy as jnp
            th, tw = kf.img_hw
            im_t = self.images[tm]
            if im_t.shape[:2] != (th, tw):
                im_t = np.stack([_resize_f(im_t[..., c], tw, th)
                                 for c in range(3)], -1).astype(np.uint8)
            imgs = np.stack([kf.image[i], im_t])
            pts_self, conf_self, c2w = self.frontend._infer(
                self.frontend.params,
                jnp.asarray(np.concatenate(
                    [imgs, np.repeat(imgs[-1:], 4, 0)])))
            from .frontend import submap_postprocess
            from ..geometry.pointmap import pose_vec_to_matrix
            anchor = jnp.asarray(np.asarray(pose_vec_to_matrix(
                jnp.asarray(kf.pose[i]))))
            poses, depths, _, _, _, _ = submap_postprocess(
                pts_self, conf_self, c2w, anchor,
                jnp.asarray(kf.depth[i]), init=False, ds=2)
            w2c_new = np.linalg.inv(np.asarray(poses[1]))
            new_idx = kf.count
            mh, mw = self.map_hw
            img_m = self.images[tm] if self.images[tm].shape[:2] == (mh, mw) \
                else np.stack([_resize_f(self.images[tm][..., c], mw, mh)
                               for c in range(3)], -1).astype(np.uint8)
            kf.append(tm, kf.image[i], None)  # reserve a KF slot
            self.mapper.add_keyframe(new_idx, img_m,
                                     _resize_f(np.asarray(depths[1]), mw, mh),
                                     w2c_new)
            pointmap, valid = self.mapper.pose_refine(new_idx)
            rgb_ds = img_m[::2, ::2].astype(np.float32) / 255.0
            self.mapper.seed(new_idx, np.asarray(pointmap), rgb_ds,
                             np.asarray(valid) > 0, i // SUBMAP_SIZE)
            self.mapper.optimization(20, [new_idx], optimize_pose=False)
            added += 1
        return added

    def fill_trajectory(self):
        """Non-KF pose filling -> traj_full rows (hi2 fill path)."""
        if self.mapper is None or not self.images:
            return None
        from .trajectory_filler import TrajectoryFiller
        filler = TrajectoryFiller(self.mapper, iters=50)
        kf_ts = self.keyframes.tstamp[: self.keyframes.count]
        kf_poses = self.keyframes.pose[: self.keyframes.count]
        mh, mw = self.map_hw
        ts = [t for t in sorted(self.images) if t not in set(kf_ts.tolist())]
        imgs = []
        for t in ts:
            im = self.images[t]
            if im.shape[:2] != (mh, mw):
                im = np.stack([_resize_f(im[..., c], mw, mh)
                               for c in range(3)], -1).astype(np.uint8)
            imgs.append(im)
        poses = filler.fill(imgs, ts, kf_ts, kf_poses)
        return ts, poses

    def terminate(self, t: int, eval_render: bool = True,
                  export_renders: bool = True, add_kf: bool = False,
                  fill: bool = False):
        """Final flush + global BA + eval (hi2.py:153-229)."""
        self.frontend.run(t, last_frame=True)
        result = {}
        if self.mapper is not None and add_kf:
            result["added_kf"] = self.add_kf_densify()
        if self.mapper is not None and fill:
            filled = self.fill_trajectory()
            if filled:
                ts, poses = filled
                path = os.path.join(self.output_dir, "traj_full.txt")
                os.makedirs(self.output_dir, exist_ok=True)
                with open(path, "w") as f:
                    for tt, p in zip(ts, poses):
                        f.write(f"{tt} " + " ".join(
                            f"{v:.9f}" for v in p) + "\n")
        if self.mapper is not None:
            self.mapper.finalize(iters=1000)
            if eval_render:
                psnrs = [self.mapper.eval_view(i)
                         for i in range(self.keyframes.count)
                         if bool(self.mapper.cams.valid[i])]
                result["psnr_kf"] = float(np.mean(psnrs)) if psnrs else 0.0
            if export_renders:
                self.export_renders(os.path.join(self.output_dir,
                                                 "renders_kf"))
            # checkpoint + final gaussian ply (gs_backend:1073, 3dgs_final)
            os.makedirs(self.output_dir, exist_ok=True)
            self.mapper.save(os.path.join(self.output_dir, "gaussians.npz"))
            from ..utils.viz import save_gaussians_ply
            save_gaussians_ply(os.path.join(self.output_dir,
                                            "3dgs_final.ply"), self.mapper.arena)
        return result

    def export_renders(self, outdir: str):
        """Save rendered KF color + uint16 depth x6553.5 for the TSDF
        pipeline (eval_utils.py:60-88 convention)."""
        from .renderer import render_view
        os.makedirs(outdir, exist_ok=True)
        m = self.mapper
        for i in range(self.keyframes.count):
            if not bool(m.cams.valid[i]):
                continue
            out = render_view(m.arena.params(), m.arena.alive,
                              m.cams.w2c[i], m.K4, m.raster_cfg)
            color = np.clip(np.asarray(out["color"]) * 255, 0, 255
                            ).astype(np.uint8)
            depth = np.clip(np.asarray(out["depth"]) * 6553.5, 0, 65535
                            ).astype(np.uint16)
            try:
                import cv2
                cv2.imwrite(os.path.join(outdir, f"color_{i:05d}.png"),
                            cv2.cvtColor(color, cv2.COLOR_RGB2BGR))
                cv2.imwrite(os.path.join(outdir, f"depth_{i:05d}.png"), depth)
            except ImportError:
                from PIL import Image
                Image.fromarray(color).save(
                    os.path.join(outdir, f"color_{i:05d}.png"))
                Image.fromarray(depth).save(
                    os.path.join(outdir, f"depth_{i:05d}.png"))

    def save_trajectory(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        kf = self.keyframes
        with open(path, "w") as f:
            for i in range(kf.count):
                t = kf.tstamp[i]
                p = kf.pose[i]
                f.write(f"{t} " + " ".join(f"{v:.9f}" for v in p) + "\n")
        np.save(os.path.join(os.path.dirname(path) or ".", "intrinsics.npy"),
                kf.intrinsic[: kf.count])


def _resize_f(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Bilinear resize of a float map."""
    if arr.shape[:2] == (h, w):
        return np.asarray(arr, np.float32)
    try:
        import cv2
        return cv2.resize(np.asarray(arr, np.float32), (w, h),
                          interpolation=cv2.INTER_LINEAR)
    except ImportError:
        import jax.image
        return np.asarray(jax.image.resize(jnp.asarray(arr, jnp.float32),
                                           (h, w), "linear"))


def _resize_pts(pts: np.ndarray, w: int, h: int) -> np.ndarray:
    if pts.shape[:2] == (h, w):
        return np.asarray(pts, np.float32)
    return np.stack([_resize_f(pts[..., c], w, h) for c in range(3)], -1)
