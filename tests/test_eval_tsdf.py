"""Tests for eval metrics, TSDF integration, datasets, config loading."""
import os
import numpy as np
import jax.numpy as jnp
import pytest

from cut3r_slam_tpu.utils.eval import psnr, ssim, ate_rmse, evaluate_renders
from cut3r_slam_tpu.utils.tsdf import TSDFVolume, integrate_keyframes
from cut3r_slam_tpu.utils.config import load_config, load_calib
from cut3r_slam_tpu.utils.image import resize_with_intrinsics

RNG = np.random.default_rng(0)


def test_psnr_ssim_identity():
    img = RNG.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert psnr(img, img) > 100
    assert abs(ssim(img, img) - 1.0) < 1e-4
    noisy = np.clip(img + 0.1 * RNG.normal(size=img.shape), 0, 1).astype(np.float32)
    assert 15 < psnr(noisy, img) < 30
    assert ssim(noisy, img) < 0.99


def test_ate_rmse_alignment():
    from scipy.spatial.transform import Rotation
    gt = RNG.normal(size=(50, 3)).astype(np.float64)
    R = Rotation.random(random_state=1).as_matrix()
    est = 2.0 * gt @ R.T + np.array([1.0, -2.0, 0.5])
    # sim3-aligned ATE of a perfectly similar trajectory is ~0
    assert ate_rmse(est, gt) < 1e-5
    est_noisy = est + 0.01 * RNG.normal(size=est.shape)
    e = ate_rmse(est_noisy, gt)
    assert 0.001 < e < 0.05


def test_tsdf_plane():
    """Integrate a fronto-parallel plane; surface voxels near z=1."""
    H, W = 32, 32
    K4 = np.array([40.0, 40.0, 16.0, 16.0])
    depth = np.full((H, W), 1.0, np.float32)
    color = np.tile(np.array([1.0, 0, 0], np.float32), (H, W, 1))
    vol = integrate_keyframes([depth], [color], K4, [np.eye(4)],
                              voxel_size=0.05)
    verts, faces, cols = vol.extract_mesh(min_weight=0.5)
    assert len(verts) > 10
    # surface z should be near 1.0
    assert abs(np.median(verts[:, 2]) - 1.0) < 0.1
    # colors near red
    assert cols[:, 0].mean() > 0.5


def test_tsdf_ply_roundtrip(tmp_path):
    H, W = 16, 16
    K4 = np.array([20.0, 20.0, 8.0, 8.0])
    depth = np.full((H, W), 0.8, np.float32)
    vol = integrate_keyframes([depth], None, K4, [np.eye(4)],
                              voxel_size=0.05)
    n = vol.save_ply(str(tmp_path / "mesh.ply"))
    assert n > 0
    head = open(tmp_path / "mesh.ply").readline()
    assert head.strip() == "ply"


def test_config_inherit(tmp_path):
    cfg = load_config("config/replica_config.yaml")
    # inherited from base
    assert cfg["Tracking"]["frontend"]["warmup"] == 6
    # overridden in child
    assert cfg["Tracking"]["motion_filter"]["thresh"] == 0.92
    assert cfg["Dataset"]["type"] == "replica"


def test_calib_parse():
    c = load_calib("calib/tum.txt")
    assert len(c) == 9 and c[0] == 517.3
    c2 = load_calib("calib/replica.txt")
    assert len(c2) == 4


def test_resize_with_intrinsics():
    img = RNG.uniform(0, 255, (48, 64, 3)).astype(np.uint8)
    K4 = np.array([60.0, 60.0, 32.0, 24.0])
    out, K = resize_with_intrinsics(img, K4, target_w=32, multiple=16)
    assert out.shape[1] == 32 and out.shape[0] % 16 == 0
    assert abs(K[0] - 60.0 * 32 / 64) < 1e-5


def test_evaluate_renders_json(tmp_path):
    imgs = [RNG.uniform(0, 1, (16, 16, 3)).astype(np.float32)
            for _ in range(3)]
    res = evaluate_renders(imgs, imgs, out_json=str(tmp_path / "m.json"))
    assert res["psnr"] > 100
    assert os.path.exists(tmp_path / "m.json")
