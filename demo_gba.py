"""Offline global-BA resume.

Counterpart of /root/reference/demo_gba.py: load a saved Gaussian map
checkpoint (mapper.save() at the end of a demo run), run additional
global-BA iterations and re-export the map, renders and metrics.

Usage:
  python demo_gba.py --ckpt outputs/room0/gaussians.npz --iters 5000 \
      [--cpu] [--out outputs/room0_gba]
"""
import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="mapper .npz checkpoint")
    p.add_argument("--iters", type=int, default=5000)
    p.add_argument("--out", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from cut3r_slam_tpu.slam.mapping import MappingBackend, MappingConfig
    from cut3r_slam_tpu.utils.viz import save_gaussians_ply

    z = np.load(args.ckpt)
    H, W = z["cams_image"].shape[1:3]
    cap = z["arena_xyz"].shape[0]
    cam_cap = z["cams_w2c"].shape[0]
    # intrinsics travel next to the checkpoint
    K4 = np.load(os.path.join(os.path.dirname(args.ckpt),
                              "intrinsics.npy"))[0][:4]
    mapper = MappingBackend(
        MappingConfig(height=H, width=W, capacity=cap,
                      cam_capacity=cam_cap), K4)
    mapper.load(args.ckpt)

    mapper.global_ba(args.iters, densify=True)

    out = args.out or os.path.dirname(args.ckpt)
    os.makedirs(out, exist_ok=True)
    mapper.save(os.path.join(out, "gaussians_gba.npz"))
    n = save_gaussians_ply(os.path.join(out, "3dgs_final.ply"), mapper.arena)
    psnrs = [mapper.eval_view(i) for i in range(cam_cap)
             if bool(mapper.cams.valid[i])]
    result = {"psnr_kf": round(float(np.mean(psnrs)), 3) if psnrs else 0.0,
              "gaussians": int(n), "gba_iters": args.iters}
    with open(os.path.join(out, "gba_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
