"""Multi-model fusion with ground-truth masks (BASELINE config 2 stand-in:
room4-style -maskdir operation): a moving sphere must spawn model 1, be fused
into its own surfel map, and have its motion tracked independently."""

import numpy as np
import pytest

from cofusion_tpu.config import CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import make_sequence


@pytest.fixture(scope="module")
def multi_run(small_cam):
    cfg = CoFusionConfig(camera=small_cam, max_models=3, max_surfels=1 << 16)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, model_spawn_offset=0
        ),
        enable_multi_model=True,
    )
    n = 8
    frames, gt_cam, gt_obj = make_sequence(small_cam, n, kind="orbit", moving_object=True)
    for f in frames:
        engine.process_frame(f)
    return engine, gt_cam, gt_obj, n


def test_object_model_spawned(multi_run):
    engine, gt_cam, gt_obj, n = multi_run
    stats = engine.stats()
    assert bool(stats["poses"] is not None)
    active = np.asarray(engine.state.models.active)
    assert active[0] and active[1], active
    assert engine.surfel_count(1) > 200, engine.surfel_count(1)


def test_camera_still_accurate(multi_run):
    engine, gt_cam, gt_obj, n = multi_run
    log = engine.materialized_pose_log()
    errs = [np.linalg.norm(log[i][1][0][:3, 3] - gt_cam[i][:3, 3]) for i in range(n)]
    assert np.sqrt(np.mean(np.square(errs))) < 0.005, errs


def test_object_motion_tracked(multi_run):
    engine, gt_cam, gt_obj, n = multi_run
    # exported object pose = P_cam * P_obj^-1 = O_t O_s^-1 C_s: world object
    # motion relative to spawn composed with the spawn-time camera pose
    # (derivation: object map frame == camera frame at spawn, model pose
    # P_obj = C_s^-1 O_s O_t^-1 C_t)
    log = engine.pose_log_for(1)
    spawn_i = 1  # mask first remapped on the second frame
    O_s, C_s = gt_obj[spawn_i], gt_cam[spawn_i]
    est_t = log[-1][1][1][:3, 3]
    want = (gt_obj[n - 1] @ np.linalg.inv(O_s) @ C_s)[:3, 3]
    err = np.linalg.norm(est_t - want)
    assert np.linalg.norm(want) > 0.15  # sanity: there IS motion to recover
    # ~20%/sequence map-smearing drift on a small fast object (leading-edge
    # surfel duplication biases the prediction forward); direction must be
    # right and error bounded.  TODO: tighten after association improvements.
    assert err < 0.08, (est_t, want)
    assert np.dot(est_t, want) / (np.linalg.norm(est_t) * np.linalg.norm(want)) > 0.95


def test_background_excludes_object(multi_run):
    engine, gt_cam, gt_obj, n = multi_run
    # background surfels should not sit inside the moving box's final volume
    surfels = engine.download_model(0)
    center = np.array([0.14 + 0.22, -0.32 + 0.1, 1.82])  # box center + motion
    d = np.max(np.abs(surfels["pos"] - center), axis=1)
    frac_inside = (d < 0.15).mean()
    assert frac_inside < 0.02, frac_inside
