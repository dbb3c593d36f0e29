"""Replica evaluation driver.

Counterpart of /root/reference/scripts/run_replica.py: run the demo per
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

SEQUENCES = ["room0", "room1", "room2", "office0", "office1", "office2",
             "office3", "office4"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", required=True, help="Replica root")
    p.add_argument("--output", default="outputs/replica")
    p.add_argument("--sequences", nargs="*", default=SEQUENCES)
    p.add_argument("--ckpt", default="./checkpoints/cut3r_512_dpt_4_64.pth")
    p.add_argument("--extra", nargs="*", default=[],
                   help="extra demo.py flags; dashed tokens must be "
                        "passed as ONE quoted string (argparse stops "
                        "nargs='*' at a leading dash)")
    args = p.parse_args()
    import shlex
    args.extra = [t for item in args.extra for t in shlex.split(item)]

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = {}
    for seq in args.sequences:
        out = os.path.join(args.output, seq)
        traj = os.path.join(out, "traj_kf.txt")
        if not os.path.exists(traj):
            cmd = [sys.executable, os.path.join(root, "demo.py"),
                   "--imagedir", os.path.join(args.datadir, seq, "results"),
                   "--calib", os.path.join(root, "calib/replica.txt"),
                   "--config", os.path.join(root, "config/replica_config.yaml"),
                   "--output", out, "--ckpt", args.ckpt] + args.extra
            print("+", " ".join(cmd))
            subprocess.run(cmd, check=True)

        res = {}
        rj = os.path.join(out, "result.json")
        if os.path.exists(rj):
            res.update(json.load(open(rj)))

        # TSDF mesh from the rendered keyframes (reference runs
        # tsdf_integrate per sequence after the demo)
        mesh = os.path.join(out, "mesh.ply")
        if not os.path.exists(mesh) and os.path.isdir(
                os.path.join(out, "renders_kf")):
            cmd = [sys.executable, os.path.join(root, "tsdf_integrate.py"),
                   "--rundir", out]
            print("+", " ".join(cmd))
            subprocess.run(cmd, check=True)
        if os.path.exists(mesh):
            res["mesh_ply"] = mesh

        # ATE vs GT trajectory
        gt_file = os.path.join(args.datadir, seq, "traj.txt")
        if os.path.exists(gt_file) and os.path.exists(traj):
            sys.path.insert(0, root)
            from cut3r_slam_tpu.utils.eval import ate_rmse
            gt = np.loadtxt(gt_file).reshape(-1, 4, 4)
            est = np.loadtxt(traj)
            ts = est[:, 0].astype(int)
            ts = ts[ts < len(gt)]
            res["ate_rmse_m"] = ate_rmse(est[: len(ts), 1:4],
                                         gt[ts][:, :3, 3])
        results[seq] = res
        print(seq, json.dumps(res))

    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
