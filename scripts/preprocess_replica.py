"""Replica preprocessing (reference scripts/preprocess_replica.py:13-30):
nothing to convert — Replica ships frames + traj.txt; this just verifies
layout and optionally symlinks into a flat structure.
"""
import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", required=True)
    args = p.parse_args()
    for seq in sorted(os.listdir(args.datadir)):
        d = os.path.join(args.datadir, seq)
        if not os.path.isdir(d):
            continue
        res = os.path.join(d, "results")
        traj = os.path.join(d, "traj.txt")
        ok = os.path.isdir(res) and os.path.exists(traj)
        n = len([f for f in os.listdir(res) if f.startswith("frame")]) \
            if os.path.isdir(res) else 0
        print(f"{seq}: {'OK' if ok else 'MISSING'} ({n} frames)")


if __name__ == "__main__":
    main()
