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
        mf_cfg = tcfg.get("motion_filter", {})
        prior = None
        if bool(mf_cfg.get("use_prior", False)):
            prior = self._build_prior_fns(mf_cfg, (H, W))
        self.filter = MotionFilter(
            model, params, self.keyframes,
            thresh=mf_cfg.get("thresh", 0.9),
            skip=mf_cfg.get("skip", 5),
            kf_every=mf_cfg.get("kf_every", 0),
            prior=prior)
        self.graph = FactorGraph()
        self.frontend = TrackFrontend(model, params, self.keyframes,
                                      self.graph)
        self.backend = TrackBackend(
            self.frontend, self.keyframes, self.graph,
            loop_iters=tcfg.get("backend", {}).get("loop_iters", 2000),
            loop_gap=tcfg.get("backend", {}).get("loop_gap", 8),
            nms_thresh=tcfg.get("backend", {}).get("nms_thresh", 0.4))
        self.enable_loop = enable_loop

        # live Sim(3) PGBA (pgo_buffer.py semantics), config-gated like the
        # ScanNet config's Tracking.pgba section
        pgba_cfg = tcfg.get("pgba", {})
        self.pgba = None
        self._pgba_args = None
        if bool(pgba_cfg.get("active", False)):
            from .sim3_pgo import PGBABuffer
            self._pgba_args = dict(
                loop_weight=float(pgba_cfg.get("loop_weight", 2.0)),
                iters=int(pgba_cfg.get("iters", 6)),
                conf_weighting=bool(pgba_cfg.get("conf_weighting", False)))
            self.pgba = PGBABuffer(**self._pgba_args)

        self.mapper: Optional[MappingBackend] = None
        self.enable_mapping = enable_mapping
        self._map_cfg_extra = dict(
            capacity=mcfg.get("arena_capacity", 2 ** 18),
            cam_capacity=buffer,
            window_size=mcfg.get("window_size", 10),
            lambda_depth=mcfg.get("lambda_depth", 0.5),
            lambda_normal=mcfg.get("lambda_normal", 0.05),
            lambda_iso=mcfg.get("lambda_iso", 10.0),
            window_opt_iters=int(mcfg.get("window_opt_iters", 20)),
            new_view_opt_iters=int(mcfg.get("new_view_opt_iters", 50)),
            gba_per_view=int(mcfg.get("gba_per_view", 10)),
            gba_views_per_iter=int(mcfg.get("gba_views_per_iter", 1)),
            gba_resample_every=int(mcfg.get("gba_resample_every", 1)),
            parallel_kf_refine=bool(mcfg.get("parallel_kf_refine", False)),
            opt_early_stop_rel=float(mcfg.get("opt_early_stop", 0.0)),
            pose_lr=trcfg.get("pose_lr", 0.0003))
        # view-parallel mapping: shard the window's renders over an
        # ``mv`` mesh axis (config Mapping.view_parallel = device count;
        # parallel/mapping.py). 0/1 = sequential single-chip scan.
        self.map_view_parallel = int(mcfg.get("view_parallel", 0))
        # interleaved mapping (VERDICT r4 #5): > 0 = run at most this
        # many mapping slices (optimization/GBA segments) per tracking
        # frame instead of draining a whole submap's mapping event in
        # one stop-the-world call; bounds worst-case frame latency at
        # ~the slice cost. 0 = drain immediately (reference behavior).
        # Any backlog is drained when the NEXT submap event arrives and
        # at terminate, so total work and final state match the drained
        # schedule — only the pose/depth writeback lands a few frames
        # later (the reference's asynchronous mapper process has the
        # same property).
        self.map_interleave = int(mcfg.get("interleave", 0))
        self._map_gen = None
        self.frame_map_slices = 0
        self.map_hw = map_hw
        self.output_dir = output_dir
        self.mapping_iters = mcfg.get("iterations", 100)
        self.finalize_iters = cfg.get("opt_params", {}).get(
            "position_lr_max_steps",
            trcfg.get("position_lr_max_steps", 2000))
        self.keep_all_frames = bool(cfg.get("keep_all_frames", True))
        # JPEG-compressed host frame store: bounds the ~1.2 GB the
        # reference's raw dict reaches on 2000-frame runs (hi2.py:103)
        from ..utils.image import CompressedFrameStore
        self.images = CompressedFrameStore()
        # optional per-stage profiler (utils/profiling.StageTimer)
        self.timer = None
        self.img_hw = img_hw
        self.last_t = -1

        # optional live browser viewer (replaces the reference's Open3D
        # GUI process, slam_gui.py; config: GUI: {active: true, port: N})
        self.viewer = None
        gui_cfg = cfg.get("GUI", {})
        if bool(gui_cfg.get("active", False)):
            from ..gui import ViewerServer
            self.viewer = ViewerServer(
                self, port=int(gui_cfg.get("port", 8080)),
                max_splats=int(gui_cfg.get("max_splats", 400_000)))

    # ------------------------------------------------------------------
    @staticmethod
    def _build_prior_fns(mf_cfg, img_hw):
        """Omnidata-style mono-prior hook (hislam2/motion_filter.py:58-66):
        PriorNet depth + normal per keyframe, stored in the KF buffers.
        Weights come from ``prior_ckpt`` (npz of flax params trained with
        train/) or random init when absent (architecture smoke path)."""
        import jax as _jax
        from ..models.priors import PriorNet, normalize_imagenet
        H, W = img_hw
        omni_d = mf_cfg.get("omnidata_ckpt_depth")
        omni_n = mf_cfg.get("omnidata_ckpt_normal")
        if omni_d or omni_n:
            # real Omnidata weights: the converter ingests the public
            # omnidata_dpt_{depth,normal}_v2.ckpt files the reference
            # loads at motion_filter.py:59-60
            from ..models.omnidata import load_omnidata_ckpt
            Hn, Wn = max(32, round(H / 32) * 32), max(32, round(W / 32) * 32)

            def _make(path, task):
                model, params = load_omnidata_ckpt(path, task)
                fn = _jax.jit(lambda img: _jax.image.resize(
                    model.apply(params, _jax.image.resize(
                        img[None].astype(jnp.float32) / 255.0,
                        (1, Hn, Wn, 3), "bilinear")),
                    (1, H, W) if task == "depth" else (1, H, W, 3),
                    "bilinear")[0])
                return lambda img: fn(jnp.asarray(img))

            d_fn = _make(omni_d, "depth") if omni_d else None
            n_fn = _make(omni_n, "normal") if omni_n else None
            zero_d = lambda img: jnp.zeros((H, W))
            zero_n = lambda img: jnp.zeros((H, W, 3))
            return (d_fn or zero_d, n_fn or zero_n)
        dim = int(mf_cfg.get("prior_dim", 384))
        depth_n = PriorNet(task="depth", embed_dim=dim,
                           depth=int(mf_cfg.get("prior_depth_blocks", 12)),
                           num_heads=max(dim // 64, 1))
        normal_n = PriorNet(task="normal", embed_dim=dim,
                            depth=int(mf_cfg.get("prior_depth_blocks", 12)),
                            num_heads=max(dim // 64, 1))
        dummy = jnp.zeros((1, H, W, 3))
        ckpt = mf_cfg.get("prior_ckpt")
        if ckpt:
            import flax
            raw = np.load(ckpt, allow_pickle=True)
            pd = flax.traverse_util.unflatten_dict(
                {tuple(k.split("/")): raw[k] for k in raw.files
                 if k.startswith("depth/")}, sep=None)
            pn = flax.traverse_util.unflatten_dict(
                {tuple(k.split("/")): raw[k] for k in raw.files
                 if k.startswith("normal/")}, sep=None)
            params_d = {"params": pd.get("depth", pd)}
            params_n = {"params": pn.get("normal", pn)}
        else:
            params_d = depth_n.init(_jax.random.PRNGKey(0), dummy)
            params_n = normal_n.init(_jax.random.PRNGKey(1), dummy)
        d_jit = _jax.jit(lambda img: depth_n.apply(
            params_d, normalize_imagenet(img)[None])[0])
        n_jit = _jax.jit(lambda img: normal_n.apply(
            params_n, normalize_imagenet(img)[None])[0])
        return (lambda img: d_jit(jnp.asarray(img)),
                lambda img: n_jit(jnp.asarray(img)))

    def _init_mapper(self, K4_map):
        mh, mw = self.map_hw
        mesh = None
        if self.map_view_parallel > 1:
            import jax
            if len(jax.devices()) >= self.map_view_parallel:
                from ..parallel import make_mesh
                mesh = make_mesh(self.map_view_parallel, axes=("mv",),
                                 shape=(self.map_view_parallel,))
        self.mapper = MappingBackend(
            MappingConfig(height=mh, width=mw, **self._map_cfg_extra),
            np.asarray(K4_map, np.float32), mesh=mesh)
        self.mapper.timer = self.timer  # mapping-phase breakdown (bench)

    def reset_state(self):
        """Reset every piece of mutable SLAM state while KEEPING all
        jitted closures, so a second sequence (bench.py's warm timing
        pass) reruns the exact compiled programs with zero retracing."""
        kf_old = self.keyframes
        new_kf = KeyframeStore(kf_old.capacity, kf_old.img_hw,
                               int(kf_old.featI.shape[1]),
                               int(kf_old.featI.shape[2]),
                               map_hw=kf_old.map_hw)
        if self.filter.prior is not None:
            new_kf.ensure_prior_buffers()
        self.keyframes = new_kf
        self.filter.keyframes = new_kf
        self.frontend.keyframes = new_kf
        self.backend.kf = new_kf
        self.graph = FactorGraph()
        self.frontend.graph = self.graph
        self.backend.graph = self.graph
        self.frontend.is_initialized = False
        self.frontend.t1 = 0
        if getattr(self, "_gt_store", None) is not None:
            self._gt_store.clear()
        self.backend.freeze_counter = 0
        self.backend.closed = []
        self.backend.closed_loop = {"idx_current": [], "idx_matched": [],
                                    "lc_fl": []}
        if self._pgba_args is not None:
            from .sim3_pgo import PGBABuffer
            self.pgba = PGBABuffer(**self._pgba_args)
        self._map_gen = None  # abandon any interleaved mapping backlog
        if self.mapper is not None:
            self.mapper.reset_state()
        from ..utils.image import CompressedFrameStore
        self.images = CompressedFrameStore()
        self.last_t = -1

    def run(self, t: int, img: np.ndarray, K4: np.ndarray,
            img_map: Optional[np.ndarray] = None,
            K4_map: Optional[np.ndarray] = None,
            second_last: bool = False, last: bool = False):
        """Per-frame step (hi2.py:101-135)."""
        self.last_t = t
        # bench/telemetry: mapping work units executed during THIS frame
        # (a whole drained event counts its slices too) — lets the bench
        # classify frames by actual mapping work under interleaving,
        # where viz_range is None on frames that still run map slices
        self.frame_map_slices = 0
        if self.keep_all_frames:
            # full-frame host store for terminate-time densification and
            # trajectory filling (hi2.py:103 self.images dict)
            self.images[t] = img_map if img_map is not None else img
        import contextlib
        tm = self.timer if self.timer is not None \
            else (lambda _s: contextlib.nullcontext())
        with tm("filter"):
            took = self.filter(t, img, intrinsic=K4, second_last=second_last,
                               last=last, image_map=img_map,
                               intrinsic_map=K4_map)
        with tm("frontend"):
            run_backend, viz_range, submap_idx = self.frontend.run(t, last)

        if run_backend and self.enable_loop:
            with tm("loop_backend"):
                updates = self.backend.run(self.frontend.t1)
            if updates is not None and self.mapper is not None:
                self.mapper.gaussian_update(
                    updates["submap_idx"], updates["pose_updates"],
                    list(updates["camera_idx"]),
                    [np.linalg.inv(np.asarray(pose_vec_to_matrix(
                        jnp.asarray(p)))) for p in updates["camera_pose"]])
            if updates is not None and self.pgba is not None:
                # loop edge from the LC-corrected poses, then a global
                # Sim(3) smoothing pass over all keyframes
                self.pgba.on_new_keyframes(self.keyframes,
                                           self.keyframes.count)
                self.pgba.on_loop(self.backend.closed_loop["idx_matched"][-1],
                                  self.backend.closed_loop["idx_current"][-1],
                                  self.keyframes)
                self.pgba.solve_and_writeback(self.keyframes)

        if viz_range is not None and self.pgba is not None:
            # accumulate odometry constraints for the new keyframes
            self.pgba.on_new_keyframes(self.keyframes, self.keyframes.count)
        if viz_range is not None and self.enable_mapping:
            with tm("mapping"):
                self.call_mapper(viz_range, submap_idx)
        elif self.enable_mapping and self._map_gen is not None:
            # no new submap this frame: advance the pending interleaved
            # mapping event by a bounded number of slices
            with tm("mapping"):
                self.step_mapper(self.map_interleave)
        return took, viz_range

    # ------------------------------------------------------------------
    def run_test(self, t: int, img: np.ndarray, K4: np.ndarray,
                 depth_gt: np.ndarray, c2w_gt: np.ndarray,
                 img_map: Optional[np.ndarray] = None,
                 K4_map: Optional[np.ndarray] = None,
                 second_last: bool = False, last: bool = False,
                 sigma_t: float = 0.05, sigma_r: float = 0.01):
        """GT-injection per-frame step (hi2.py:138-150 Hi2.test):
        keyframes store GT depth/pose, and the frontend + loop backend
        synthesize pointmaps from GT depth with perturbed poses instead
        of running CUT3R (TrackFrontend.test semantics). Drives the full
        filter -> frontend -> loop -> PGBA -> mapping chain with the
        network stubbed by ground truth."""
        from ..geometry.lie import se3_from_matrix
        if self.frontend.gt_inject is None:
            self._gt_store = {}
            self.frontend.set_gt_injection(
                lambda ts: self._gt_store[int(ts)],
                sigma_t=sigma_t, sigma_r=sigma_r)
        self._gt_store[int(t)] = (np.asarray(depth_gt, np.float32),
                                  np.asarray(c2w_gt, np.float32))
        self.frame_map_slices = 0
        if self.keep_all_frames:
            self.images[t] = img_map if img_map is not None else img
        pose_vec = np.asarray(se3_from_matrix(
            jnp.asarray(np.asarray(c2w_gt, np.float32))))
        took = self.filter(t, img, intrinsic=K4, pose=pose_vec,
                           depth=depth_gt, second_last=second_last,
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
            if updates is not None and self.pgba is not None:
                self.pgba.on_new_keyframes(self.keyframes,
                                           self.keyframes.count)
                self.pgba.on_loop(self.backend.closed_loop["idx_matched"][-1],
                                  self.backend.closed_loop["idx_current"][-1],
                                  self.keyframes)
                self.pgba.solve_and_writeback(self.keyframes)
        if viz_range is not None and self.pgba is not None:
            self.pgba.on_new_keyframes(self.keyframes, self.keyframes.count)
        if viz_range is not None and self.enable_mapping:
            self.call_mapper(viz_range, submap_idx)
        elif self.enable_mapping and self._map_gen is not None:
            self.step_mapper(self.map_interleave)
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
        pts = np.asarray(kf.pts_ds[np.asarray(idxs)])
        sub = submap_idx
        confs = np.asarray(kf.submap_conf[sub])[:len(idxs)] if sub is not None \
            else np.ones((len(idxs), mh // ds, mw // ds), np.float32)
        confs = np.stack([_resize_f(c, mw // ds, mh // ds) for c in confs])
        pts = np.stack([_resize_pts(p, mw // ds, mh // ds) for p in pts])
        # host-side pose conversion: the per-KF device round trip cost a
        # 26 ms tunnel RTT each (bench round-5 sync_rtt_ms)
        from .frontend import pose_vec_to_matrix_np
        w2cs = np.linalg.inv(pose_vec_to_matrix_np(
            np.asarray(kf.pose[idxs], np.float32)))

        packet = {"viz_idx": idxs, "images": imgs, "depths": depths,
                  "pointmaps": pts, "confs": confs, "w2c": w2cs,
                  "submap_idx": sub or 0,
                  "tstamp": kf.tstamp[idxs]}
        if self.map_interleave > 0:
            self.drain_mapper()  # finish any previous event first
            self._map_gen = self.mapper.run_steps(packet,
                                                  self.mapping_iters)
            self.step_mapper(self.map_interleave)
        else:
            upd = self.mapper.run(packet, self.mapping_iters)
            self.frame_map_slices = getattr(
                self, "frame_map_slices", 0) + 1
            self._apply_map_update(upd)

    def _apply_map_update(self, upd):
        """Writeback refined poses/depths (hi2.py:84-91). Pose
        conversion is host-side scipy — the per-KF device round trip
        cost a tunnel RTT each (same fix as call_mapper)."""
        if upd is None:
            return
        from scipy.spatial.transform import Rotation
        kf = self.keyframes
        for d, p, c2w, k in zip(upd["depths"], upd["pointmaps"],
                                upd["c2w"], upd["window"]):
            q = Rotation.from_matrix(
                np.asarray(c2w[:3, :3], np.float64)).as_quat()
            kf.pose[k] = np.concatenate(
                [np.asarray(c2w[:3, 3]), q]).astype(np.float32)
            th, tw = kf.img_hw
            kf.depth[k] = _resize_f(d, tw, th)

    def step_mapper(self, n_slices: int):
        """Advance the pending interleaved mapping event by at most
        ``n_slices`` bounded slices; applies the pose/depth writeback
        when the event completes."""
        for _ in range(max(0, n_slices)):
            if self._map_gen is None:
                return
            try:
                next(self._map_gen)
                self.frame_map_slices = getattr(
                    self, "frame_map_slices", 0) + 1
            except StopIteration as e:
                self._map_gen = None
                self._apply_map_update(e.value)
                return

    def drain_mapper(self):
        """Run the pending interleaved mapping event to completion."""
        while self._map_gen is not None:
            self.step_mapper(1)

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
            # _infer decodes from encoder tokens: the anchor KF's are
            # stored (featI); the middle frame is encoded once here
            feat_mid = self.filter.encode(im_t)
            feat = jnp.stack([kf.featI[i]] + [feat_mid] * 5)
            pts_self, conf_self, c2w = self.frontend._infer(
                self.frontend.params, feat)
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
            # store the middle frame itself with its refined pose + depth so
            # downstream consumers (fill/save_trajectory) see real data, not
            # an identity-pose copy of the predecessor keyframe
            from ..geometry.lie import se3_from_matrix as _se3_from_m
            kf.append(tm, im_t,
                      pose=np.asarray(_se3_from_m(jnp.asarray(poses[1]))),
                      depth=_resize_f(np.asarray(depths[1]), tw, th),
                      intrinsic=kf.intrinsic[i])
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
        filler = TrajectoryFiller(self.mapper, iters=100)
        # densified keyframes append out of timestamp order — sort before
        # the filler's searchsorted anchor lookup
        order = np.argsort(self.keyframes.tstamp[: self.keyframes.count])
        kf_ts = self.keyframes.tstamp[: self.keyframes.count][order]
        kf_poses = self.keyframes.pose[: self.keyframes.count][order]
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
        self.drain_mapper()  # finish any interleaved mapping backlog
        self.frontend.run(t, last_frame=True)
        result = {}
        filled = None
        if self.mapper is not None and add_kf:
            result["added_kf"] = self.add_kf_densify()
        if self.mapper is not None:
            # config-driven finalize budget (reference runs global_BA for
            # position_lr_max_steps, gs_backend_per_frame.py:1067-1086);
            # fill runs AFTER finalize so poses optimize against the final map
            self.mapper.finalize(iters=int(self.finalize_iters))
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
            if eval_render:
                kf_out = self.eval_rendering_kf()
                result["psnr_kf"] = kf_out["mean_psnr"]
                result["eval_kf"] = kf_out
                result["eval_full"] = self.eval_rendering_full(filled)
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

    # ------------------------------------------------------------------
    _EVAL_BATCH = 16

    def _render_views_batched(self, w2cs: np.ndarray,
                              exp_a: Optional[np.ndarray] = None,
                              exp_b: Optional[np.ndarray] = None):
        """Render V views in ONE device dispatch per bucket of
        ``_EVAL_BATCH`` (lax.map inside jit) instead of a host round-trip
        per view — terminate-time eval over hundreds of keyframes is
        dispatch-bound otherwise (each per-view call costs a full
        host<->device sync over the axon tunnel). Returns
        (imgs (V,H,W,3) in [0,1], depths (V,H,W)). exp_a/exp_b: optional
        per-view exposure affine; None = identity."""
        import jax
        m = self.mapper
        B = self._EVAL_BATCH
        V = w2cs.shape[0]
        if exp_a is None:
            exp_a = np.broadcast_to(np.eye(3, dtype=np.float32), (V, 3, 3))
        if exp_b is None:
            exp_b = np.zeros((V, 3), np.float32)
        if not hasattr(self, "_eval_render_jit"):
            from .renderer import render_view

            def batch(params, alive, w2c_b, ea_b, eb_b):
                def one(args):
                    w2c, a, b = args
                    out = render_view(params, alive, w2c, m.K4,
                                      m.raster_cfg)
                    img = jnp.clip(out["color"] @ a + b, 0.0, 1.0)
                    return img, out["depth"]
                return jax.lax.map(one, (w2c_b, ea_b, eb_b))

            self._eval_render_jit = jax.jit(batch)
        imgs, depths = [], []
        for s in range(0, V, B):
            # pad the tail bucket by repeating row 0 so every call hits
            # the same compiled (B,...) program
            sl = slice(s, min(s + B, V))
            n = sl.stop - sl.start
            pad = [(0, B - n)] + [(0, 0)] * 2
            w2c_b = np.pad(w2cs[sl], pad, mode="edge")
            ea_b = np.pad(exp_a[sl], pad, mode="edge")
            eb_b = np.pad(exp_b[sl], [(0, B - n), (0, 0)], mode="edge")
            im, de = self._eval_render_jit(
                m.arena.params(), m.arena.alive, jnp.asarray(w2c_b),
                jnp.asarray(ea_b), jnp.asarray(eb_b))
            imgs.append(np.asarray(im, np.float32)[:n])
            depths.append(np.asarray(de, np.float32)[:n])
        return np.concatenate(imgs), np.concatenate(depths)

    @staticmethod
    def _save_render(img: np.ndarray, depth: np.ndarray, img_dir: str,
                     depth_dir: str, idx: int):
        """Reference artifact convention: jpg color + uint16 depth x6553.5
        (eval_utils.py:70-73)."""
        from ..utils.viz import save_image
        save_image(os.path.join(img_dir, f"{idx:06d}.jpg"),
                   (img * 255).astype(np.uint8))
        save_image(os.path.join(depth_dir, f"{idx:06d}.png"),
                   np.clip(depth * 6553.5, 0, 65535).astype(np.uint16))

    def eval_rendering_kf(self, iteration: str = "final") -> Dict:
        """Keyframe rendering eval -> psnr/<it>/final_result_kf.json
        (eval_utils.py:107-162)."""
        from ..utils import eval as E
        img_dir = os.path.join(self.output_dir, "renders_kf",
                               f"image_{iteration}")
        depth_dir = os.path.join(self.output_dir, "renders_kf",
                                 f"depth_{iteration}")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(depth_dir, exist_ok=True)
        ps, ss, lp, l1 = [], [], [], []
        m = self.mapper
        valid = np.asarray(m.cams.valid)
        idxs = [i for i in range(self.keyframes.count) if valid[i]]
        if idxs:
            ii = np.asarray(idxs)
            imgs, depths = self._render_views_batched(
                np.asarray(m.cams.w2c)[ii],
                np.asarray(m.cams.exposure_a)[ii],
                np.asarray(m.cams.exposure_b)[ii])
        for j, i in enumerate(idxs):
            img, depth = imgs[j], depths[j]
            gt = np.asarray(m.cams.image[i], np.float32) / 255.0
            self._save_render(img, depth, img_dir, depth_dir, i)
            mask = gt > 0
            ps.append(E.psnr(img[mask], gt[mask]))
            ss.append(E.ssim(img, gt))
            v = E.lpips(img, gt)
            if v is not None:
                lp.append(v)
            gtd = np.asarray(m.cams.depth[i], np.float32)
            l1.append(E.depth_l1(depth, gtd))
        out = {"mean_psnr": float(np.mean(ps)) if ps else 0.0,
               "mean_ssim": float(np.mean(ss)) if ss else 0.0,
               "mean_lpips": float(np.mean(lp)) if lp else None,
               "mean_l1": float(np.mean(l1)) if l1 else 0.0,
               "n_views": len(ps)}
        jdir = os.path.join(self.output_dir, "psnr", str(iteration))
        os.makedirs(jdir, exist_ok=True)
        import json
        with open(os.path.join(jdir, "final_result_kf.json"), "w") as f:
            json.dump(out, f, indent=4)
        return out

    def eval_rendering_full(self, filled=None, iteration: str = "final",
                            gt_depths: Optional[Dict] = None) -> Dict:
        """Full-trajectory eval: every 5th frame + keyframes + last
        (eval_utils.py:14-105). Non-KF poses come from the trajectory
        filler result ``filled=(ts, poses)``; without it only keyframes
        are evaluated. -> psnr/<it>/final_result.json"""
        from ..utils import eval as E
        from ..geometry.lie import se3_matrix
        img_dir = os.path.join(self.output_dir, "renders",
                               f"image_{iteration}")
        depth_dir = os.path.join(self.output_dir, "renders",
                                 f"depth_{iteration}")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(depth_dir, exist_ok=True)
        kf = self.keyframes
        kf_ts = {int(kf.tstamp[i]): i for i in range(kf.count)}
        fill_poses = {}
        if filled:
            for tt, p in zip(filled[0], filled[1]):
                fill_poses[int(tt)] = p
        m = self.mapper
        mh, mw = self.map_hw
        all_ts = sorted(self.images) if self.images else sorted(kf_ts)
        ps, ss, lp, l1 = [], [], [], []
        # pass 1: collect the views to render (KF: stored camera +
        # exposure; non-KF: filled pose, identity exposure), then render
        # them all in batched device dispatches
        sel = []   # (tt, kf_index_or_None, w2c, exp_a, exp_b)
        valid = np.asarray(m.cams.valid)
        eye3 = np.eye(3, dtype=np.float32)
        for j, tt in enumerate(all_ts):
            is_kf = tt in kf_ts
            if tt % 5 != 0 and not is_kf and j != len(all_ts) - 1:
                continue
            if is_kf:
                i = kf_ts[tt]
                if not valid[i]:
                    continue
                sel.append((tt, i, np.asarray(m.cams.w2c[i]),
                            np.asarray(m.cams.exposure_a[i]),
                            np.asarray(m.cams.exposure_b[i])))
            elif tt in fill_poses:
                c2w = np.asarray(se3_matrix(jnp.asarray(
                    fill_poses[tt], jnp.float32)))
                sel.append((tt, None, np.linalg.inv(c2w).astype(np.float32),
                            eye3, np.zeros(3, np.float32)))
        n_nonkf = sum(1 for s in sel if s[1] is None)
        if sel:
            imgs_b, depths_b = self._render_views_batched(
                np.stack([s[2] for s in sel]),
                np.stack([s[3] for s in sel]),
                np.stack([s[4] for s in sel]))
        for j, (tt, i, _, _, _) in enumerate(sel):
            img, depth = imgs_b[j], depths_b[j]
            is_kf = i is not None
            if is_kf:
                gtd = np.asarray(m.cams.depth[i], np.float32)
                l1.append(E.depth_l1(depth, gtd))
            if tt in self.images:
                gt = self.images[tt]
                if gt.shape[:2] != (mh, mw):
                    gt = np.stack([_resize_f(gt[..., c], mw, mh)
                                   for c in range(3)], -1)
                gt = np.asarray(gt, np.float32) / 255.0
            elif is_kf:
                gt = np.asarray(m.cams.image[i], np.float32) / 255.0
            else:
                continue
            self._save_render(img, depth, img_dir, depth_dir, tt)
            mask = gt > 0
            ps.append(E.psnr(img[mask], gt[mask]))
            ss.append(E.ssim(img, gt))
            v = E.lpips(img, gt)
            if v is not None:
                lp.append(v)
        out = {"mean_psnr": float(np.mean(ps)) if ps else 0.0,
               "mean_ssim": float(np.mean(ss)) if ss else 0.0,
               "mean_lpips": float(np.mean(lp)) if lp else None,
               "mean_l1": float(np.mean(l1)) if l1 else 0.0,
               "n_views": len(ps),
               "n_views_nonkf": n_nonkf}
        jdir = os.path.join(self.output_dir, "psnr", str(iteration))
        os.makedirs(jdir, exist_ok=True)
        import json
        # Honesty: a "full-trajectory" JSON computed on keyframes alone
        # (no filled non-KF poses) is misleading vs the reference's
        # eval_utils.py:14-105 — name it accordingly.
        fname = ("final_result.json" if n_nonkf > 0
                 else "final_result_kf_only.json")
        with open(os.path.join(jdir, fname), "w") as f:
            json.dump(out, f, indent=4)
        return out

    def export_renders(self, outdir: str):
        """Save rendered KF color + uint16 depth x6553.5 for the TSDF
        pipeline (eval_utils.py:60-88 convention)."""
        os.makedirs(outdir, exist_ok=True)
        m = self.mapper
        valid = np.asarray(m.cams.valid)
        idxs = [i for i in range(self.keyframes.count) if valid[i]]
        if idxs:
            imgs_b, depths_b = self._render_views_batched(
                np.asarray(m.cams.w2c)[np.asarray(idxs)])
        for j, i in enumerate(idxs):
            color = np.clip(imgs_b[j] * 255, 0, 255).astype(np.uint8)
            depth = np.clip(depths_b[j] * 6553.5, 0, 65535
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
        order = np.argsort(kf.tstamp[: kf.count])  # densified KFs append late
        with open(path, "w") as f:
            for i in order:
                t = kf.tstamp[i]
                p = kf.pose[i]
                f.write(f"{t} " + " ".join(f"{v:.9f}" for v in p) + "\n")
        np.save(os.path.join(os.path.dirname(path) or ".", "intrinsics.npy"),
                kf.intrinsic[: kf.count][order])


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
