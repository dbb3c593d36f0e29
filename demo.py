"""Live SLAM demo driver.

Counterpart of /root/reference/demo_s.py: stream an image directory
through the SLAM system and dump `traj_kf.txt` + `intrinsics.npy` (+ final
render eval). Same flags as the reference (demo_s.py:117-137).

Usage:
  python demo.py --imagedir data/replica/room0/results \
                 --calib calib/replica.txt --config config/replica.yaml \
                 --output outputs/room0
"""
import argparse
import json
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--imagedir", required=True)
    p.add_argument("--calib", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--output", default="outputs/run")
    p.add_argument("--ckpt", default="./checkpoints/cut3r_512_dpt_4_64.pth")
    p.add_argument("--buffer", type=int, default=512)
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--cropborder", type=int, default=0)
    p.add_argument("--undistort", action="store_true")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--length", type=int, default=None)
    p.add_argument("--kf_every", type=int, default=0)
    p.add_argument("--no-mapping", action="store_true")
    p.add_argument("--no-loop", action="store_true")
    p.add_argument("--tiny-model", action="store_true",
                   help="random tiny model instead of the checkpoint (CI)")
    p.add_argument("--target_width", type=int, default=512,
                   help="tracking width (512 = reference resolution)")
    p.add_argument("--arena_capacity", type=int, default=2 ** 18)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--finalize_iters", type=int, default=None,
                   help="override opt_params.position_lr_max_steps")
    p.add_argument("--gui", action="store_true",
                   help="serve the live browser viewer (GUI.active)")
    p.add_argument("--gui_port", type=int, default=8080)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
    from cut3r_slam_tpu.models.convert import load_cut3r_params
    from cut3r_slam_tpu.slam.system import SLAMSystem
    from cut3r_slam_tpu.utils.config import load_config, load_calib, DEFAULT_CONFIG
    from cut3r_slam_tpu.utils.image import (mono_stream, list_images,
                                            prefetch_stream, _imread)

    cfg = dict(DEFAULT_CONFIG)
    if args.config:
        cfg.update(load_config(args.config))
    if args.kf_every:
        cfg.setdefault("Tracking", {}).setdefault("motion_filter", {})[
            "kf_every"] = args.kf_every

    calib = load_calib(args.calib)

    # probe first image for resolution
    first = _imread(list_images(args.imagedir)[args.start])
    h0, w0 = first.shape[:2]
    if args.cropborder:
        h0, w0 = h0 - 2 * args.cropborder, w0 - 2 * args.cropborder
    tw = args.target_width
    Ht = int(tw / w0 * h0) // 16 * 16
    Hm = int(tw / w0 * h0) // 2 * 2

    if args.tiny_model:
        mcfg = CUT3RConfig.tiny()
    else:
        mcfg = CUT3RConfig()
    model = CUT3R(mcfg)
    if args.tiny_model or not os.path.exists(args.ckpt):
        print(f"[demo] checkpoint {args.ckpt} unavailable -> random init")
        dummy = jnp.zeros((1, 1, Ht, tw, 3))
        params = model.init(jax.random.PRNGKey(0), dummy)
    else:
        params = load_cut3r_params(args.ckpt)

    cfg.setdefault("Mapping", {})["arena_capacity"] = args.arena_capacity
    if args.gui:
        cfg["GUI"] = {"active": True, "port": args.gui_port}
    if args.finalize_iters is not None:
        cfg.setdefault("opt_params", {})["position_lr_max_steps"] = \
            args.finalize_iters
    slam = SLAMSystem(model, params, cfg, buffer=args.buffer,
                      img_hw=(Ht, tw), map_hw=(Hm, tw),
                      enable_mapping=not args.no_mapping,
                      enable_loop=not args.no_loop,
                      output_dir=args.output)
    if slam.viewer is not None:
        print(f"[demo] live viewer at http://127.0.0.1:{slam.viewer.port}/")

    os.makedirs(args.output, exist_ok=True)
    # run-config dump (demo_s.py:21-36 image_shape.txt)
    with open(os.path.join(args.output, "image_shape.txt"), "w") as f:
        f.write(f"track {Ht}x{tw} map {Hm}x{tw} src {h0}x{w0} "
                f"crop {args.cropborder}\n")
    from cut3r_slam_tpu.utils.profiling import StageTimer
    timer = StageTimer()
    t0 = time.time()
    n = 0
    stream = prefetch_stream(
        mono_stream(args.imagedir, calib, args.stride, args.cropborder,
                    args.undistort, args.start, args.length, target_w=tw),
        depth=8)
    prev = None
    for (t, img, K, img_map, K_map, is_last) in stream:
        with timer("frame"):
            slam.run(t, img, K, img_map, K_map,
                     second_last=False, last=is_last)
        n += 1
        prev = t
    with timer("terminate"):
        result = slam.terminate(prev if prev is not None else 0)
    timer.dump(os.path.join(args.output, "timing.json"))
    dt = time.time() - t0

    slam.save_trajectory(os.path.join(args.output, "traj_kf.txt"))
    result.update({"frames": n, "seconds": round(dt, 2),
                   "fps": round(n / max(dt, 1e-9), 2),
                   "keyframes": slam.keyframes.count})
    with open(os.path.join(args.output, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
