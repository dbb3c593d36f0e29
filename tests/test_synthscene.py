"""Procedural multiview generator tests (habitat-sim data-gen
counterpart, cut3r_slam_tpu/datasets/synthscene.py vs
/root/reference/src/croco/datasets/habitat_sim/).

Checks geometric self-consistency of the renderer (depth reprojects onto
itself; nearby views overlap more than far views) and that the emitted
layout feeds the standard training pipeline loaders unchanged.
"""
import numpy as np
import pytest

from cut3r_slam_tpu.datasets.synthscene import (
    SynthScene, sample_viewpoints, covisibility, generate_multiview_scenes)


HW = (48, 64)
F = HW[1] / 2 / np.tan(np.deg2rad(60.0) / 2)
K4 = np.asarray([F, F, HW[1] / 2, HW[0] / 2], np.float32)


@pytest.fixture(scope="module")
def rendered():
    scene = SynthScene(seed=1)
    rng = np.random.default_rng(0)
    poses = sample_viewpoints(6, rng)
    frames = [scene.render(p, K4, *HW) for p in poses]
    return scene, poses, frames


def test_render_shapes_and_validity(rendered):
    _, _, frames = rendered
    rgb, depth = frames[0]
    assert rgb.shape == (*HW, 3) and rgb.dtype == np.uint8
    assert depth.shape == HW and depth.dtype == np.float32
    assert (depth >= 0).all() and np.isfinite(depth).all()
    # ground plane must dominate the view: most pixels valid
    assert (depth > 0).mean() > 0.5
    # the scene is textured, not flat
    assert rgb.std() > 10


def test_self_covisibility_is_one(rendered):
    _, poses, frames = rendered
    _, d0 = frames[0]
    assert covisibility(d0, poses[0], d0, poses[0], K4) > 0.99


def test_adjacent_views_overlap_more_than_opposite(rendered):
    """Cameras sit on a ring: neighbours share more of the scene than
    diametrically opposite views (occlusion-aware overlap ordering)."""
    _, poses, frames = rendered
    d = [f[1] for f in frames]
    near = covisibility(d[0], poses[0], d[1], poses[1], K4)
    far = covisibility(d[0], poses[0], d[3], poses[3], K4)
    assert near > far
    assert 0.0 <= far <= 1.0 and near <= 1.0


def test_depth_is_zdepth_not_ray_length(rendered):
    """Center pixel of a fronto-parallel floor view: z-depth equals the
    analytic distance along the optical axis."""
    scene = SynthScene(seed=5)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [20.0, -2.0, 20.0]   # far outside the box field
    # look straight down: +y is down in camera frame -> rotate z->y
    c2w[:3, :3] = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32).T
    _, depth = scene.render(c2w, K4, *HW)
    cy, cx = HW[0] // 2, HW[1] // 2
    assert depth[cy, cx] == pytest.approx(3.0, rel=0.05)  # plane y=1


def test_generate_and_load_via_training_pipeline(tmp_path):
    dirs = generate_multiview_scenes(str(tmp_path), n_scenes=2,
                                     views_per_scene=4, hw=HW, seed=3)
    assert len(dirs) == 2
    import os.path as osp
    for d in dirs:
        for i in range(4):
            assert osp.exists(osp.join(d, "rgb", f"{i:05d}.png"))
            assert osp.exists(osp.join(d, "depth", f"{i:05d}.npy"))
            assert osp.exists(osp.join(d, "cam", f"{i:05d}.npz"))
        ov = np.load(osp.join(d, "overlaps.npz"))
        assert ov["overlap"].shape == (4, 4)
        assert np.allclose(np.diag(ov["overlap"]), 1.0)
        assert ov["pairs"].ndim == 2 and ov["pairs"].shape[1] == 2

    # feed the standard pipeline: generic SceneLayout -> MultiViewDataset
    from cut3r_slam_tpu.datasets.loaders import SceneLayout, SceneFolderSource
    from cut3r_slam_tpu.datasets.multiview import MultiViewDataset
    src = SceneFolderSource(str(tmp_path), SceneLayout(name="synth"))
    assert len(src) == 8
    item = src[0]
    assert item["image"].shape == (*HW, 3)
    assert item["depth"].shape == HW
    assert item["K4"].shape == (4,)
    ds = MultiViewDataset(source=src, num_views=2, span=3,
                          resolution=(32, 48))
    views = ds[0]
    assert len(views) == 2
    assert views[0]["img"].shape == (32, 48, 3)
    assert views[0]["depth"].shape == (32, 48)
    assert views[0]["pose"].shape == (7,)
