"""7-Scenes preprocessing.

Counterpart of /root/reference/scripts/preprocess_7scenes.py: the 7-Scenes
sequences ship frame-XXXXXX.color.png / .depth.png / .pose.txt inside
seq-NN folders; this flattens one sequence into the rgb/ depth/ layout +
traj.txt the loaders expect.
"""
import argparse
import glob
import os
import shutil

import numpy as np


def convert_seq(seq_dir: str, out_dir: str):
    from scipy.spatial.transform import Rotation
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    colors = sorted(glob.glob(os.path.join(seq_dir, "frame-*.color.png")))
    rows = []
    for i, c in enumerate(colors):
        stem = os.path.basename(c).replace(".color.png", "")
        shutil.copy(c, os.path.join(out_dir, "rgb", f"{i:06d}.png"))
        d = os.path.join(seq_dir, stem + ".depth.png")
        if os.path.exists(d):
            shutil.copy(d, os.path.join(out_dir, "depth", f"{i:06d}.png"))
        p = os.path.join(seq_dir, stem + ".pose.txt")
        if os.path.exists(p):
            m = np.loadtxt(p).reshape(4, 4)
            q = Rotation.from_matrix(m[:3, :3]).as_quat()
            rows.append(np.concatenate([[i], m[:3, 3], q]))
    if rows:
        np.savetxt(os.path.join(out_dir, "traj.txt"), np.stack(rows))
    return len(colors)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", required=True, help="7-Scenes root")
    p.add_argument("--out", required=True)
    p.add_argument("--seq", default="seq-01")
    args = p.parse_args()
    for scene in sorted(os.listdir(args.datadir)):
        sd = os.path.join(args.datadir, scene, args.seq)
        if not os.path.isdir(sd):
            continue
        n = convert_seq(sd, os.path.join(args.out, scene))
        print(f"{scene}/{args.seq}: {n} frames")


if __name__ == "__main__":
    main()
