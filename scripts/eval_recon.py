"""3D reconstruction metrics: accuracy / completion / completion ratio.

Counterpart of /root/reference/scripts/eval_recon.py:22-263: nearest-
neighbor distances between the reconstructed and ground-truth meshes
(scipy cKDTree replaces the open3d/trimesh KD machinery), with optional
ICP alignment.

Usage:
  python scripts/eval_recon.py --rec outputs/room0/mesh.ply \
      --gt data/replica/room0_mesh.ply [--align]
"""
import argparse
import json

import numpy as np
from scipy.spatial import cKDTree


def load_ply_vertices(path: str) -> np.ndarray:
    verts = []
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("latin1").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(h.split()[-1]) for h in header
                 if h.startswith("element vertex"))
        fmt = next(h for h in header if h.startswith("format"))
        props = [h.split()[1:] for h in header if h.startswith("property ")
                 and not h.startswith("property list")]
        if "ascii" in fmt:
            for _ in range(n):
                vals = f.readline().split()
                verts.append([float(v) for v in vals[:3]])
        else:
            sizes = {"float": 4, "float32": 4, "double": 8, "uchar": 1,
                     "uint8": 1, "int": 4, "uint": 4, "short": 2,
                     "ushort": 2}
            row = sum(sizes[p[0]] for p in props)
            buf = f.read(n * row)
            arr = np.frombuffer(buf, np.uint8).reshape(n, row)
            verts = arr[:, :12].copy().view(np.float32).reshape(n, 3)
            return np.asarray(verts, np.float64)
    return np.asarray(verts, np.float64)


def icp_align(src: np.ndarray, dst: np.ndarray, iters: int = 20):
    """Point-to-point ICP (rigid) on subsampled clouds."""
    from scipy.spatial.transform import Rotation
    s = src[np.random.default_rng(0).choice(len(src), min(20000, len(src)),
                                            replace=False)]
    tree = cKDTree(dst)
    T = np.eye(4)
    cur = s.copy()
    for _ in range(iters):
        d, j = tree.query(cur, k=1)
        m = d < np.percentile(d, 80)
        p, q = cur[m], dst[j[m]]
        mp, mq = p.mean(0), q.mean(0)
        U, _, Vt = np.linalg.svd((q - mq).T @ (p - mp))
        S = np.diag([1, 1, np.sign(np.linalg.det(U @ Vt))])
        R = U @ S @ Vt
        t = mq - R @ mp
        cur = cur @ R.T + t
        Ti = np.eye(4)
        Ti[:3, :3] = R
        Ti[:3, 3] = t
        T = Ti @ T
    return T


def calc_3d_metric(rec: np.ndarray, gt: np.ndarray,
                   dist_thresh: float = 0.05,
                   n_samples: int = 200_000):
    rng = np.random.default_rng(0)

    def sample(x):
        if len(x) > n_samples:
            return x[rng.choice(len(x), n_samples, replace=False)]
        return x

    rec_s, gt_s = sample(rec), sample(gt)
    acc = cKDTree(gt_s).query(rec_s, k=1)[0]
    comp = cKDTree(rec_s).query(gt_s, k=1)[0]
    return {
        "accuracy_cm": float(acc.mean() * 100),
        "completion_cm": float(comp.mean() * 100),
        "completion_ratio_pct": float((comp < dist_thresh).mean() * 100),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rec", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--align", action="store_true")
    p.add_argument("--dist_thresh", type=float, default=0.05)
    args = p.parse_args()

    rec = load_ply_vertices(args.rec)
    gt = load_ply_vertices(args.gt)
    if args.align:
        T = icp_align(rec, gt)
        rec = rec @ T[:3, :3].T + T[:3, 3]
    print(json.dumps(calc_3d_metric(rec, gt, args.dist_thresh), indent=2))


if __name__ == "__main__":
    main()
