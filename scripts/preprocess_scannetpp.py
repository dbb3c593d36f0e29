"""ScanNet++ preprocessing.

Counterpart of /root/reference/scripts/preprocess_scannetpp.py: take the
iphone/ or dslr/ stream of a ScanNet++ scene (undistorted rgb +
colmap-format poses) and produce rgb/ + traj.txt + calib.txt for demo.py.
"""
import argparse
import json
import os
import shutil

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", required=True, help="scene dir (contains iphone/)")
    p.add_argument("--out", required=True)
    p.add_argument("--stream", default="iphone")
    args = p.parse_args()

    from scipy.spatial.transform import Rotation
    src = os.path.join(args.scene, args.stream)
    os.makedirs(os.path.join(args.out, "rgb"), exist_ok=True)

    # pose_intrinsic_imu.json (iphone) holds per-frame K + c2w
    pj = os.path.join(src, "pose_intrinsic_imu.json")
    rows = []
    K4 = None
    if os.path.exists(pj):
        meta = json.load(open(pj))
        for i, (name, m) in enumerate(sorted(meta.items())):
            K = np.asarray(m["intrinsic"])
            K4 = [K[0][0], K[1][1], K[0][2], K[1][2]]
            pose = np.asarray(m["aligned_pose" if "aligned_pose" in m
                                else "pose"]).reshape(4, 4)
            q = Rotation.from_matrix(pose[:3, :3]).as_quat()
            rows.append(np.concatenate([[i], pose[:3, 3], q]))
            img = os.path.join(src, "rgb", name + ".jpg")
            if os.path.exists(img):
                shutil.copy(img, os.path.join(args.out, "rgb",
                                              f"{i:06d}.jpg"))
    if rows:
        np.savetxt(os.path.join(args.out, "traj.txt"), np.stack(rows))
    if K4:
        open(os.path.join(args.out, "calib.txt"), "w").write(
            " ".join(str(float(v)) for v in K4) + "\n")
    print(f"{len(rows)} frames -> {args.out}")


if __name__ == "__main__":
    main()
