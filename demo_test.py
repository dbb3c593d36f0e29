"""GT-injection test driver: run the SLAM pipeline with the network
stubbed out by ground truth.

Counterpart of /root/reference/demo_test.py + Hi2.test (hi2.py:138-150) +
TrackFrontend.test (track_frontend.py:333-405): read an RGB-D dataset with
GT poses, synthesize pointmaps from GT depth, perturb the poses
(sigma_trans=0.05, sigma_rot=0.01) and drive the Gaussian mapping backend
— the de-facto integration test of the mapping stack in isolation.

Usage:
  python demo_test.py --dataset replica --folder data/replica/room0 \
      --output outputs/test_room0 [--length 30] [--cpu]
"""
import argparse
import json
import os
import time

import numpy as np


def perturb_pose(rng, c2w, sigma_t=0.05, sigma_r=0.01):
    """track_frontend.py:408-421."""
    import jax.numpy as jnp
    from cut3r_slam_tpu.geometry.lie import se3_exp, se3_matrix
    xi = np.concatenate([rng.normal(0, sigma_t, 3),
                         rng.normal(0, sigma_r, 3)]).astype(np.float32)
    return np.asarray(se3_matrix(se3_exp(jnp.asarray(xi)))) @ c2w


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="replica",
                   choices=["replica", "scannet", "tum"])
    p.add_argument("--folder", required=True)
    p.add_argument("--output", default="outputs/demo_test")
    p.add_argument("--length", type=int, default=30)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--kf_every", type=int, default=5)
    p.add_argument("--target_width", type=int, default=512)
    p.add_argument("--arena_capacity", type=int, default=2 ** 18)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-perturb", action="store_true")
    p.add_argument("--calib", default=None,
                   help="calib file overriding the dataset default")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cut3r_slam_tpu.datasets import get_dataset
    from cut3r_slam_tpu.geometry.pointmap import (depth_to_pointmap,
                                                  pose_vec_to_matrix)
    from cut3r_slam_tpu.geometry.lie import se3_from_matrix
    from cut3r_slam_tpu.slam.mapping import MappingBackend, MappingConfig
    from cut3r_slam_tpu.utils.image import resize_with_intrinsics
    from cut3r_slam_tpu.utils.eval import ate_rmse

    calib = None
    if args.calib:
        from cut3r_slam_tpu.utils.config import load_calib
        calib = load_calib(args.calib)[:4]
    ds = get_dataset(args.dataset, args.folder, calib)
    rng = np.random.default_rng(0)
    os.makedirs(args.output, exist_ok=True)

    mapper = None
    gt_positions, est_keys = [], []
    t0 = time.time()
    n = 0
    for i in range(0, min(len(ds), args.length * args.stride), args.stride):
        item = ds[i]
        if "depth" not in item or "pose" not in item:
            raise RuntimeError("demo_test needs GT depth + pose")
        img, K4 = resize_with_intrinsics(item["image"], item["K4"],
                                         args.target_width, 2)
        H, W = img.shape[:2]
        sy = H / item["depth"].shape[0]
        try:
            import cv2
            depth = cv2.resize(item["depth"], (W, H),
                               interpolation=cv2.INTER_NEAREST)
        except ImportError:
            depth = np.asarray(jax.image.resize(
                jnp.asarray(item["depth"]), (H, W), "nearest"))

        if mapper is None:
            mapper = MappingBackend(
                MappingConfig(height=H, width=W,
                              capacity=args.arena_capacity,
                              cam_capacity=max(args.length + 2, 8)),
                K4)

        c2w_gt = np.asarray(pose_vec_to_matrix(jnp.asarray(item["pose"])),
                            np.float32)
        c2w = c2w_gt if (args.no_perturb or n == 0) \
            else perturb_pose(rng, c2w_gt)
        w2c = np.linalg.inv(c2w)

        if n % args.kf_every == 0 or n == 0:
            kf_idx = len(est_keys)
            mapper.add_keyframe(kf_idx, img, depth, w2c)
            if n == 0:
                pm = np.asarray(depth_to_pointmap(
                    jnp.asarray(depth), jnp.asarray(K4),
                    c2w=jnp.asarray(c2w)))
                mapper.seed(kf_idx, pm[::2, ::2],
                            (img.astype(np.float32) / 255.0)[::2, ::2],
                            np.ones((H // 2, W // 2), bool), 0)
                mapper.current_window = [0]
                mapper.optimization(50, [0])
                mapper.initialized = True
            else:
                if len(mapper.current_window) >= mapper.cfg.window_size:
                    mapper.current_window = mapper.current_window[1:]
                mapper.current_window.append(kf_idx)
                pointmap, valid = mapper.pose_refine(kf_idx)
                mapper.seed(kf_idx, np.asarray(pointmap),
                            (img.astype(np.float32) / 255.0)[::2, ::2],
                            np.asarray(valid) > 0, kf_idx // 5)
                mapper.optimization(20, mapper.current_window)
            gt_positions.append(c2w_gt[:3, 3])
            est_keys.append(kf_idx)
        n += 1

    mapper.global_ba(10 * len(est_keys), densify=True)
    dt = time.time() - t0

    est_positions = []
    psnrs = []
    for k in est_keys:
        c2w = np.linalg.inv(np.asarray(mapper.cams.w2c[k]))
        est_positions.append(c2w[:3, 3])
        psnrs.append(mapper.eval_view(k))

    result = {
        "frames": n, "keyframes": len(est_keys),
        "seconds": round(dt, 1),
        "psnr_kf": round(float(np.mean(psnrs)), 2),
        "ate_rmse_m": round(ate_rmse(np.stack(est_positions),
                                     np.stack(gt_positions)), 4),
    }
    with open(os.path.join(args.output, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
