"""TSDF mesh extraction from a finished SLAM run.

Counterpart of /root/reference/tsdf_integrate.py: read the run's
`traj_kf.txt` + `intrinsics.npy` + rendered keyframe depth/color
(renders_kf/) and integrate them into a TSDF, exporting `mesh.ply`.

Usage:
  python tsdf_integrate.py --rundir outputs/room0 [--voxel 0.02]
"""
import argparse
import glob
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rundir", required=True)
    p.add_argument("--voxel", type=float, default=0.02)
    p.add_argument("--depth_trunc", type=float, default=8.0)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from cut3r_slam_tpu.utils.tsdf import TSDFVolume
    from cut3r_slam_tpu.geometry.pointmap import pose_vec_to_matrix
    from cut3r_slam_tpu.utils.image import _imread

    traj = np.loadtxt(os.path.join(args.rundir, "traj_kf.txt"))
    K4 = np.load(os.path.join(args.rundir, "intrinsics.npy"))[0]

    depth_files = sorted(glob.glob(os.path.join(args.rundir, "renders_kf",
                                                "depth_*.png")))
    color_files = sorted(glob.glob(os.path.join(args.rundir, "renders_kf",
                                                "color_*.png")))
    vol = TSDFVolume(voxel_size=args.voxel, trunc=4 * args.voxel)
    n = min(len(depth_files), len(traj))
    for i in range(n):
        d = _imread(depth_files[i]) if depth_files[i].endswith(".jpg") else None
        try:
            import cv2
            d = cv2.imread(depth_files[i], cv2.IMREAD_UNCHANGED)
        except ImportError:
            from PIL import Image
            d = np.asarray(Image.open(depth_files[i]))
        depth = np.asarray(d, np.float32) / 6553.5  # eval_utils.py convention
        color = (_imread(color_files[i]).astype(np.float32) / 255.0
                 if i < len(color_files) else None)
        c2w = np.asarray(pose_vec_to_matrix(jnp.asarray(
            traj[i, 1:8].astype(np.float32))))
        vol.integrate(depth, color, K4, c2w, args.depth_trunc)
        print(f"integrated {i + 1}/{n}", end="\r")

    out = args.out or os.path.join(args.rundir, "mesh.ply")
    nverts = vol.save_ply(out)
    print(f"\nwrote {out} ({nverts} vertices)")


if __name__ == "__main__":
    main()
