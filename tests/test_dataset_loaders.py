"""Dataset-loader family (datasets/loaders.py) over synthetic trees.

Each reference training set (src/dust3r/datasets/*.py) is a directory
layout + depth decode rule; these tests materialize miniature trees for
representative layout families and check the generic reader end-to-end
(frames found, K4/pose normalized, depth rules applied) plus the
multi-view sampler integration.
"""
import os
import os.path as osp

import numpy as np
import pytest

from cut3r_slam_tpu.datasets.loaders import (SCENE_LAYOUTS, SceneFolderSource,
                                             make_source, list_datasets)
from cut3r_slam_tpu.datasets.multiview import (MultiViewDataset,
                                               sample_view_offsets)


def _write_png(path, arr):
    try:
        import cv2
        cv2.imwrite(path, arr)
    except ImportError:
        from PIL import Image
        Image.fromarray(arr).save(path)


def _mk_frames(scene, layout, n=6, depth_kind="npy", depth_val=2.5):
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]], np.float32)
    for i in range(n):
        fn = f"{i:06d}"
        rgbp = osp.join(scene, layout.rgb.format(frame=fn))
        os.makedirs(osp.dirname(rgbp), exist_ok=True)
        _write_png(rgbp, np.full((48, 64, 3), 100 + i, np.uint8))
        camp = osp.join(scene, layout.cam.format(frame=fn))
        os.makedirs(osp.dirname(camp), exist_ok=True)
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = i * 0.1
        np.savez(camp, intrinsics=K, pose=pose)
        if layout.depth is None:
            continue
        dp = osp.join(scene, layout.depth.format(frame=fn))
        os.makedirs(osp.dirname(dp), exist_ok=True)
        if dp.endswith(".npy"):
            np.save(dp, np.full((48, 64), depth_val, np.float32))
        else:
            _write_png(dp, np.full((48, 64),
                                   int(depth_val * layout.depth_scale),
                                   np.uint16))


def test_registry_covers_reference_inventory():
    # 30 layout specs + co3d/cop3d dedicated sources = 32 named training
    # sets beyond the 3 eval RGB-D loaders in datasets/rgbd.py
    assert len(list_datasets()) >= 32
    for name in ("arkitscenes", "tartanair", "waymo", "scannetpp",
                 "vkitti2", "realestate10k", "co3d", "hypersim"):
        assert name in list_datasets()


@pytest.mark.parametrize("name", ["scannet", "spring", "mvimgnet"])
def test_generic_layouts(tmp_path, name):
    lay = SCENE_LAYOUTS[name]
    scene = tmp_path / "scene0"
    _mk_frames(str(scene), lay)
    src = make_source(name, str(tmp_path))
    assert len(src) == 6
    item = src[2]
    assert item["image"].shape == (48, 64, 3)
    np.testing.assert_allclose(item["K4"], [100, 100, 32, 24])
    np.testing.assert_allclose(item["pose_c2w"][0, 3], 0.2, atol=1e-6)
    if lay.depth is None:
        np.testing.assert_allclose(item["depth"], 1.0)
    else:
        np.testing.assert_allclose(item["depth"], 2.5, atol=1e-3)


def test_sky_and_clip_rules(tmp_path):
    lay = SCENE_LAYOUTS["uasol"]  # depth_clip=20
    scene = tmp_path / "s"
    _mk_frames(str(scene), lay, n=2, depth_val=25.0)
    src = SceneFolderSource(str(tmp_path), lay)
    np.testing.assert_allclose(src[0]["depth"], 0.0)  # clipped invalid

    lay2 = SCENE_LAYOUTS["tartanair"]  # sky >= 1000 -> -1
    root2 = tmp_path / "ta"
    scene2 = root2 / "a" / "b" / "c"
    _mk_frames(str(scene2), lay2, n=2, depth_val=2000.0)
    src2 = SceneFolderSource(str(root2), lay2)
    np.testing.assert_allclose(src2[0]["depth"], -1.0)


def test_multiview_sampler_integration(tmp_path):
    lay = SCENE_LAYOUTS["scannet"]
    _mk_frames(str(tmp_path / "sc0"), lay, n=8)
    src = make_source("scannet", str(tmp_path))
    ds = MultiViewDataset(source=src, num_views=3, span=6,
                          resolution=(32, 32),
                          max_interval=lay.max_interval)
    views = ds[0]
    assert len(views) == 3
    for v in views:
        assert v["img"].shape == (32, 32, 3)
        assert "pose" in v and v["pose"].shape == (7,)
        assert "depth" in v


def test_sample_view_offsets_semantics():
    rng = np.random.default_rng(0)
    for _ in range(50):
        offs = sample_view_offsets(rng, 4, 24, max_interval=8)
        assert len(offs) == 4
        assert offs.min() >= 0 and offs.max() < 24
    # video mode with fixed stride is evenly spaced
    rng = np.random.default_rng(1)
    offs = sample_view_offsets(rng, 4, 100, video_prob=1.0,
                               fix_interval_prob=1.0)
    d = np.diff(offs)
    assert (d == d[0]).all() and d[0] >= 1
