"""Trajectory format converter.

Counterpart of /root/reference/pose_convert.py: convert between the
framework's `traj_kf.txt` ([t tx ty tz qx qy qz qw] per line), TUM format
(same layout, float timestamps), and 4x4-matrix-per-line format (Replica
traj.txt), with optional inversion (c2w <-> w2c).
"""
import argparse

import numpy as np


def load(path: str, fmt: str) -> np.ndarray:
    data = np.loadtxt(path)
    if fmt == "matrix":
        import jax.numpy as jnp
        from cut3r_slam_tpu.geometry.lie import se3_from_matrix
        mats = data.reshape(-1, 4, 4)
        out = []
        for i, m in enumerate(mats):
            tq = np.asarray(se3_from_matrix(jnp.asarray(m, jnp.float32)))
            out.append(np.concatenate([[i], tq]))
        return np.stack(out)
    return data  # tq formats are already [t, tx..qw]


def save(path: str, rows: np.ndarray, fmt: str, invert: bool = False):
    import jax.numpy as jnp
    from cut3r_slam_tpu.geometry.pointmap import pose_vec_to_matrix
    from cut3r_slam_tpu.geometry.lie import se3_from_matrix
    if invert:
        out = []
        for r in rows:
            m = np.linalg.inv(np.asarray(pose_vec_to_matrix(
                jnp.asarray(r[1:8], jnp.float32))))
            tq = np.asarray(se3_from_matrix(jnp.asarray(m)))
            out.append(np.concatenate([r[:1], tq]))
        rows = np.stack(out)
    if fmt == "matrix":
        mats = [np.asarray(pose_vec_to_matrix(
            jnp.asarray(r[1:8], jnp.float32))).reshape(-1) for r in rows]
        np.savetxt(path, np.stack(mats))
    else:
        np.savetxt(path, rows)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--from_fmt", default="tq", choices=["tq", "matrix"])
    p.add_argument("--to_fmt", default="tq", choices=["tq", "matrix"])
    p.add_argument("--invert", action="store_true",
                   help="invert poses (c2w <-> w2c)")
    args = p.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    rows = load(args.input, args.from_fmt)
    save(args.output, rows, args.to_fmt, args.invert)
    print(f"converted {len(rows)} poses -> {args.output}")


if __name__ == "__main__":
    main()
