"""Frame ingest: image stream with the reference's two-resolution resize.

Counterpart of /root/reference/demo_s.py:48-94 (mono_stream): reads an
image directory, optionally undistorts, crops a border, and yields every
frame at two resolutions with rescaled intrinsics:

* tracking: w=512, h = (512 / w0 * h0) // 16 * 16   (multiple of 16)
* mapping:  w=512, h = (512 / w0 * h0) // 2 * 2     (multiple of 2)

Uses cv2 when available, PIL otherwise.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["mono_stream", "list_images", "resize_with_intrinsics",
           "prefetch_stream", "CompressedFrameStore"]

_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")


def list_images(imagedir: str):
    files = [f for f in sorted(os.listdir(imagedir))
             if f.lower().endswith(_EXTS)]
    # Replica-style results dirs mix frame*.jpg with depth*.png in one
    # folder: when color-frame-named files exist alongside others, the
    # stream is the color frames only (the reference's loaders glob
    # frame*/rgb* explicitly for the same reason)
    frames = [f for f in files
              if f.lower().startswith(("frame", "rgb", "color"))]
    if frames and len(frames) < len(files):
        files = frames
    return [os.path.join(imagedir, f) for f in files]


def _imread(path: str) -> np.ndarray:
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.open(path).convert("RGB"))


def _resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    try:
        import cv2
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
    except ImportError:
        from PIL import Image
        return np.asarray(Image.fromarray(img).resize((w, h)))


def resize_with_intrinsics(img: np.ndarray, K4: np.ndarray,
                           target_w: int = 512, multiple: int = 16
                           ) -> Tuple[np.ndarray, np.ndarray]:
    h0, w0 = img.shape[:2]
    w1 = target_w
    h1 = int(target_w / w0 * h0) // multiple * multiple
    out = _resize(img, w1, h1)
    sx, sy = w1 / w0, h1 / h0
    K = np.asarray([K4[0] * sx, K4[1] * sy, K4[2] * sx, K4[3] * sy],
                   np.float32)
    return out, K


def mono_stream(imagedir: str, calib: np.ndarray, stride: int = 1,
                crop_border: int = 0, undistort: bool = False,
                start: int = 0, length: Optional[int] = None,
                target_w: int = 512) -> Iterator[Tuple]:
    """Yields (t, img, K4, img_map, K4_map, is_last) like demo_s.py:48-94."""
    calib = np.asarray(calib, np.float64).reshape(-1)
    K4 = calib[:4].astype(np.float32)
    dist = calib[4:] if calib.size > 4 else None

    paths = list_images(imagedir)[start::stride]
    if length is not None:
        paths = paths[:length]
    n = len(paths)

    for t, path in enumerate(paths):
        img = _imread(path)
        K = K4.copy()
        if undistort and dist is not None and np.any(dist != 0):
            import cv2
            Km = np.array([[K[0], 0, K[2]], [0, K[1], K[3]], [0, 0, 1]])
            img = cv2.undistort(img, Km, dist)
        if crop_border > 0:
            c = crop_border
            img = img[c:-c, c:-c]
            K = np.asarray([K[0], K[1], K[2] - c, K[3] - c], np.float32)
        img_track, K_track = resize_with_intrinsics(img, K, target_w, 16)
        img_map, K_map = resize_with_intrinsics(img, K, target_w, 2)
        yield t, img_track, K_track, img_map, K_map, t == n - 1


def prefetch_stream(it: Iterator, depth: int = 8) -> Iterator:
    """Background-thread prefetcher: decouples cv2 decode+resize from the
    device loop (SURVEY.md §7 design point (a); the reference's stale
    demo.py used an mp.Process + Queue(8) for the same purpose,
    demo.py:102-107). A daemon thread fills a bounded queue; the consumer
    pops finished frames while the device step runs. Exceptions propagate
    to the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class CompressedFrameStore:
    """Dict-like host store of full frames as JPEG bytes.

    The reference keeps every raw frame in a dict (hi2.py:103
    ``self.images[t] = image``), which grows ~1.2 GB over a 2000-frame
    512x384 run. Storing JPEG (quality 92 ~ 20-40x smaller) bounds host
    memory while staying visually lossless for the terminate-time
    consumers (add_kf densification, trajectory filler, render eval).
    Drop-in for the dict operations SLAMSystem uses: [] get/set, `in`,
    iteration (over timestamps), len, bool.
    """

    def __init__(self, quality: int = 92):
        self._enc = {}
        self._shape = {}
        self.quality = int(quality)

    def __setitem__(self, t, img: np.ndarray):
        import cv2
        img = np.ascontiguousarray(img)
        ok, buf = cv2.imencode(
            ".jpg", img[..., ::-1],
            [int(cv2.IMWRITE_JPEG_QUALITY), self.quality])
        if not ok:  # pragma: no cover - cv2 encode failure
            raise RuntimeError("JPEG encode failed")
        self._enc[int(t)] = np.frombuffer(buf.tobytes(), np.uint8)
        self._shape[int(t)] = img.shape

    def __getitem__(self, t) -> np.ndarray:
        import cv2
        img = cv2.imdecode(self._enc[int(t)], cv2.IMREAD_COLOR)
        return np.ascontiguousarray(img[..., ::-1])

    def __contains__(self, t):
        return int(t) in self._enc

    def __iter__(self):
        return iter(self._enc)

    def __len__(self):
        return len(self._enc)

    def nbytes(self) -> int:
        return sum(a.nbytes for a in self._enc.values())
