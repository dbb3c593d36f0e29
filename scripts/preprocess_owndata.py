"""Own-video ingest: frame extraction + COLMAP intrinsics -> calib.txt.

Counterpart of /root/reference/scripts/preprocess_owndata.py:7-60: extract
frames from a video (ffmpeg or cv2), run COLMAP feature/mapper with the
OPENCV camera model when the binary exists, and write the calib file
``fx fy cx cy k1 k2 p1 p2`` consumed by demo.py.
"""
import argparse
import os
import shutil
import subprocess


def extract_frames(video: str, outdir: str, fps: int = 10):
    os.makedirs(outdir, exist_ok=True)
    if shutil.which("ffmpeg"):
        subprocess.run(["ffmpeg", "-i", video, "-vf", f"fps={fps}",
                        os.path.join(outdir, "%05d.png"), "-y"], check=True)
        return
    import cv2
    cap = cv2.VideoCapture(video)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30
    step = max(1, int(round(src_fps / fps)))
    i = n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0:
            cv2.imwrite(os.path.join(outdir, f"{n:05d}.png"), frame)
            n += 1
        i += 1
    cap.release()


def colmap_intrinsics(imagedir: str, workdir: str) -> str:
    """Run COLMAP (OPENCV model) and return the calib line."""
    if not shutil.which("colmap"):
        raise RuntimeError(
            "colmap binary not found — install COLMAP or provide --calib")
    db = os.path.join(workdir, "database.db")
    sparse = os.path.join(workdir, "sparse")
    os.makedirs(sparse, exist_ok=True)
    subprocess.run(["colmap", "feature_extractor", "--database_path", db,
                    "--image_path", imagedir, "--ImageReader.camera_model",
                    "OPENCV", "--ImageReader.single_camera", "1"], check=True)
    subprocess.run(["colmap", "exhaustive_matcher", "--database_path", db],
                   check=True)
    subprocess.run(["colmap", "mapper", "--database_path", db,
                    "--image_path", imagedir, "--output_path", sparse],
                   check=True)
    txt = os.path.join(workdir, "sparse_txt")
    os.makedirs(txt, exist_ok=True)
    subprocess.run(["colmap", "model_converter", "--input_path",
                    os.path.join(sparse, "0"), "--output_path", txt,
                    "--output_type", "TXT"], check=True)
    for line in open(os.path.join(txt, "cameras.txt")):
        if line.startswith("#"):
            continue
        parts = line.split()
        # CAMERA_ID MODEL W H fx fy cx cy k1 k2 p1 p2
        return " ".join(parts[4:12])
    raise RuntimeError("no camera found in COLMAP output")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video", help="input video (omit if --imagedir given)")
    p.add_argument("--imagedir", help="existing frame dir")
    p.add_argument("--output", required=True)
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args()

    os.makedirs(args.output, exist_ok=True)
    imagedir = args.imagedir or os.path.join(args.output, "frames")
    if args.video:
        extract_frames(args.video, imagedir, args.fps)
    calib = colmap_intrinsics(imagedir, args.output)
    calib_file = os.path.join(args.output, "calib.txt")
    open(calib_file, "w").write(calib + "\n")
    print(f"frames: {imagedir}\ncalib: {calib_file}\n{calib}")


if __name__ == "__main__":
    main()
