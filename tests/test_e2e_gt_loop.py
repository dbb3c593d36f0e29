"""End-to-end GT-injection loop-closure test (VERDICT r2 #4).

Drives SLAMSystem.run_test — the rebuild of the reference's
demo_test.py + Hi2.test (hi2.py:138-150) + TrackFrontend.test
(track_frontend.py:333-405) — on a synthetic out-and-back trajectory
over a textured plane: GT depth/pose injected, submap-relative poses
perturbed (the drift source), ``enable_loop=True`` and
``Tracking.pgba.active=true``. Exercises filter -> frontend -> loop
detect/NMS/PGO -> PGBA -> mapping -> terminate in ONE run on CPU and
asserts (a) a loop actually closes, (b) closing the loop reduces the
final keyframe ATE vs the same run without the loop backend, and
(c) the submap seam error shrinks across the closure.

Also hosts the PGBA conf-weighting ablation (VERDICT r2 #10).
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # integration tier: ~10 min on the 1-core box

from cut3r_slam_tpu.models import CUT3R, CUT3RConfig
from cut3r_slam_tpu.slam.system import SLAMSystem
from cut3r_slam_tpu.slam.keyframe import SUBMAP_SIZE

H, W = 32, 48
FX = 40.0
PLANE_Z = 2.0
N_FRAMES = 58


def _texture():
    rng = np.random.default_rng(3)
    tex = rng.uniform(40, 215, (96, 96, 3)).astype(np.float32)
    for _ in range(2):
        tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
               + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)) / 5.0
    return tex


TEX = _texture()
K4 = np.asarray([FX, FX, W / 2, H / 2], np.float32)


def _gt_frame(tx):
    """Camera at (tx, 0, 0), R=I, looking at the textured plane z=2."""
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    z = PLANE_Z
    x = (u - K4[2]) / K4[0] * z + tx
    y = (v - K4[3]) / K4[1] * z
    # bilinear-ish texture sample (nearest is fine at this scale)
    ti = np.clip(((x + 2.0) * 20).astype(int) % 96, 0, 95)
    tj = np.clip(((y + 1.0) * 20).astype(int) % 96, 0, 95)
    img = TEX[tj, ti].astype(np.uint8)
    depth = np.full((H, W), z, np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[0, 3] = tx
    return img, depth, c2w


def _trajectory(n):
    """Out-and-back: drift accumulates outbound, loop closes on return."""
    half = n // 2
    txs = [0.008 * t for t in range(half)]
    txs += [txs[-1] - 0.008 * (t + 1) for t in range(n - half)]
    return txs


def _run_system(enable_loop, pgba=False, conf_weighting=False, seed=0,
                mapping=False):
    cfg = {"Tracking": {"motion_filter": {"kf_every": 2},
                        "backend": {"loop_iters": 150, "freeze_after": 0},
                        "pgba": {"active": pgba, "iters": 4,
                                 "conf_weighting": conf_weighting}},
           "Mapping": {"arena_capacity": 2 ** 11, "iterations": 20}}
    model = CUT3R(CUT3RConfig.tiny())
    import jax
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 1, H, W, 3), jnp.float32))
    slam = SLAMSystem(model, params, cfg, buffer=64, img_hw=(H, W),
                      enable_mapping=mapping, enable_loop=enable_loop,
                      output_dir="/tmp/e2e_gt_loop")
    txs = _trajectory(N_FRAMES)
    gt_poses = {}
    seam_log = []
    for t, tx in enumerate(txs):
        img, depth, c2w = _gt_frame(tx)
        gt_poses[t] = c2w
        slam.run_test(t, img, K4, depth, c2w,
                      second_last=(t == len(txs) - 2),
                      last=(t == len(txs) - 1),
                      sigma_t=0.02, sigma_r=0.004)
        if slam.keyframes.count >= 2 * SUBMAP_SIZE:
            seam_log.append(_seam_err(slam.keyframes))
    return slam, gt_poses, seam_log


def _seam_err(kf):
    B = max(kf.count // SUBMAP_SIZE, 1)
    p = np.asarray(kf.submap_pts[:B])
    if B < 2:
        return 0.0
    return float(np.abs(p[:B - 1, -1] - p[1:B, 0]).mean())


def _ate(slam, gt_poses):
    kf = slam.keyframes
    err = []
    for i in range(kf.count):
        t = int(kf.tstamp[i])
        est = np.asarray(kf.pose[i][:3])
        gt = gt_poses[t][:3, 3]
        err.append(est - gt)
    err = np.stack(err)
    err -= err.mean(0)  # align translation (gauge freedom)
    return float(np.sqrt((err ** 2).sum(1).mean()))


@pytest.fixture(scope="module")
def loop_run():
    return _run_system(enable_loop=True, pgba=True)


@pytest.fixture(scope="module")
def drift_run():
    return _run_system(enable_loop=False)


class TestE2EGTLoop:
    def test_loop_closes(self, loop_run):
        slam, _, _ = loop_run
        assert len(slam.backend.closed_loop["idx_current"]) >= 1, \
            "no loop closure fired on the out-and-back trajectory"

    def test_ate_improves_over_drift(self, loop_run, drift_run):
        slam_l, gt, _ = loop_run
        slam_d, gt_d, _ = drift_run
        ate_loop = _ate(slam_l, gt)
        ate_drift = _ate(slam_d, gt_d)
        assert ate_loop < ate_drift, (ate_loop, ate_drift)

    def test_ate_absolute_gate(self, loop_run):
        """VERDICT r4 #6: ABSOLUTE quality gate, not just relative —
        a uniform regression that degrades loop and drift runs equally
        must fail loudly. Threshold = recorded passing value 0.0377 m
        (2026-08-21 run, see QUALITY_GATES.md) with ~2x headroom; the
        trajectory spans ~0.23 m of camera travel."""
        slam, gt, _ = loop_run
        ate = _ate(slam, gt)
        print(f"[gate] loop ATE RMSE = {ate:.4f} m")
        assert ate < 0.075, f"absolute ATE gate: {ate:.4f} >= 0.075 m"

    def test_seam_error_shrinks_at_closure(self, loop_run):
        slam, _, seam_log = loop_run
        assert len(seam_log) > 2
        # seam error right after the last closure is below the max
        # reached while drifting
        assert seam_log[-1] < max(seam_log) * 0.9, seam_log

    def test_terminate_writes_artifacts(self, loop_run, tmp_path):
        slam, _, _ = loop_run
        slam.output_dir = str(tmp_path)
        out = slam.terminate(N_FRAMES, fill=False, eval_render=False)
        assert out is not None
        # trajectory export follows terminate (demo_s.py:174 order)
        slam.save_trajectory(str(tmp_path / "traj_kf.txt"))
        assert (tmp_path / "traj_kf.txt").exists()
        assert (tmp_path / "intrinsics.npy").exists()


class TestE2EWithMapping:
    """Same GT-injection loop run with the Gaussian mapping backend ON:
    the full filter -> frontend -> loop -> PGBA -> mapping -> terminate
    chain in one process (reference demo_test.py with Mapping active)."""

    @pytest.fixture(scope="class")
    def mapping_run(self):
        return _run_system(enable_loop=True, pgba=True, mapping=True)

    def test_mapping_populates_arena(self, mapping_run):
        slam, _, _ = mapping_run
        mapper = slam.mapper
        alive = int(np.asarray(mapper.arena.alive).sum())
        assert alive > 0, "mapping ran but no Gaussians are alive"
        xyz = np.asarray(mapper.arena.xyz)[np.asarray(mapper.arena.alive)]
        assert np.isfinite(xyz).all()

    def test_mapping_psnr_absolute_gate(self, mapping_run):
        """VERDICT r4 #6: absolute rendering-quality gate on the mapped
        keyframes (threshold = recorded passing value with headroom,
        QUALITY_GATES.md). Catches rasterizer/optimizer regressions that
        keep the pipeline running but degrade the map."""
        slam, _, _ = mapping_run
        valid = np.asarray(slam.mapper.cams.valid)
        idxs = [i for i in range(slam.keyframes.count) if valid[i]]
        assert idxs, "no mapped keyframes"
        psnrs = [slam.mapper.eval_view(i) for i in idxs]
        mean_psnr = float(np.mean(psnrs))
        print(f"[gate] mapped-KF mean PSNR = {mean_psnr:.2f} dB "
              f"over {len(idxs)} views")
        assert mean_psnr > 17.0, \
            f"absolute PSNR gate: {mean_psnr:.2f} <= 17.0 dB"

    def test_loop_still_closes_with_mapping(self, mapping_run, drift_run):
        slam, gt, _ = mapping_run
        slam_d, gt_d, _ = drift_run
        assert len(slam.backend.closed_loop["idx_current"]) >= 1
        assert _ate(slam, gt) < _ate(slam_d, gt_d)

    def test_terminate_finalizes_map(self, mapping_run, tmp_path):
        slam, _, _ = mapping_run
        slam.output_dir = str(tmp_path)
        slam.finalize_iters = 20
        slam.terminate(N_FRAMES, fill=False, eval_render=False)
        # the mapper state must be serializable after the full run
        slam.mapper.save(str(tmp_path / "map.npz"))
        assert (tmp_path / "map.npz").exists()


class TestPGBAConfAblation:
    """VERDICT r2 #10: does conf-weighting the PGBA edges change the
    recovered ATE? Both variants must converge; the ablation records
    the outcome (a documented negative result is acceptable — on this
    synthetic scene conf maps are uniform, so weights only rescale)."""

    def test_conf_weighting_ablation(self, loop_run):
        # the unweighted baseline IS loop_run's config — reuse it rather
        # than paying a fifth full 58-frame system run
        slam_b, gt_b, _ = loop_run
        slam_c, gt_c, _ = _run_system(enable_loop=True, pgba=True,
                                      conf_weighting=True)
        ate_b = _ate(slam_b, gt_b)
        ate_c = _ate(slam_c, gt_c)
        assert np.isfinite(ate_b) and np.isfinite(ate_c)
        # uniform synthetic conf -> the two solutions must stay close;
        # neither may diverge
        assert ate_c < ate_b * 1.5 + 1e-3, (ate_b, ate_c)
