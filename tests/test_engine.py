"""End-to-end engine test: ElasticFusion-style single-model odometry+fusion on a
synthetic sequence (SURVEY.md §7 milestone 4 / BASELINE config 1 stand-in)."""

import numpy as np
import pytest

from cofusion_tpu.config import CoFusionConfig, FusionParams, TrackingParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import make_sequence


def ate_rmse(est_poses, gt_poses):
    """Absolute trajectory error (RMSE of translation) after identity alignment —
    both trajectories start at identity so no Umeyama needed."""
    errs = [
        np.linalg.norm(est[:3, 3] - gt[:3, 3]) for est, gt in zip(est_poses, gt_poses)
    ]
    return float(np.sqrt(np.mean(np.square(errs))))


@pytest.fixture(scope="module")
def static_run(small_cam):
    cfg = CoFusionConfig(camera=small_cam, max_models=1, max_surfels=1 << 17)
    # scene back wall sits at z=3.2m; keep it inside the fusion cutoff
    engine = CoFusion(cfg, fusion_params=FusionParams(depth_cutoff=4.5))
    n = 8
    frames, gt_poses, _ = make_sequence(small_cam, n, kind="orbit")
    for f in frames:
        engine.process_frame(f)
    est = [p[1][0] for p in engine.pose_log]
    return engine, est, gt_poses


def test_static_trajectory_accuracy(static_run):
    engine, est, gt = static_run
    err = ate_rmse(est, gt)
    # ~3.6 cm/frame camera motion; model-anchored tracking holds millimeter RMSE
    assert err < 0.004, err


def test_static_map_grows_then_stabilizes(static_run):
    engine, est, gt = static_run
    n = engine.surfel_count(0)
    # map holds roughly pixel-count surfels, not pixel-count x frames (merging works)
    n_px = engine.cam.width * engine.cam.height
    assert 0.3 * n_px < n < 3.0 * n_px, (n, n_px)


def test_final_orientation(static_run):
    engine, est, gt = static_run
    d = np.linalg.inv(gt[-1]) @ est[-1]
    ang = np.degrees(np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang
