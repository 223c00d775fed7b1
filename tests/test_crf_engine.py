"""End-to-end motion-cue CRF segmentation (BASELINE configs 3-4 stand-in:
car4-noise-style operation — NO ground-truth masks).

Physics of the motion cue (matches the reference): ICP error only accumulates
against CONFIDENT map predictions (unstable surfels don't render,
splat.vert:58), so the segmentation signal is the object's displacement since
the map last believed it.  A freshly-started map predicts nothing (FillIn makes
tracking frame-to-frame), so motion segmentation needs either a warmed-up map
or a low confidence threshold.  This test warms a low-threshold map on a static
object, then teleports the object — the next frames must spawn a model for it.
"""

import numpy as np
import pytest

from cofusion_tpu.config import CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import SyntheticScene, camera_trajectory, object_trajectory


@pytest.fixture(scope="module")
def crf_run(small_cam):
    # superpixel size scales with resolution (16 px at 640x480 ~ 6 px here):
    # the CRF smoothing kernels are sized in superpixel units
    cfg = CoFusionConfig(camera=small_cam, max_models=3, max_surfels=1 << 16, superpixel_size=6)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, confidence_global=1.5,
            model_spawn_offset=4, model_deactivate_count=3,
        ),
        enable_multi_model=True,
    )
    n_warm, n_after = 6, 4
    n = n_warm + n_after
    scene = SyntheticScene()
    h = 0.28
    scene.add_moving_box(model_id=1, lo=[-h, -h, -h], hi=[h, h, h])
    base = object_trajectory(1, translation=(0, 0, 0), center=(0.14, -0.32, 1.82), tilt=(0.35, 0.5, 0.0))[0]
    jump = np.eye(4)
    jump[:3, 3] = (0.40, 0.18, 0.0)
    cam_poses = camera_trajectory(n, kind="orbit", scale=0.4)
    obj_poses = [base.copy() for _ in range(n_warm)] + [jump @ base for _ in range(n_after)]
    frames = []
    gt_masks = []
    for i in range(n):
        rgb, depth, mask = scene.render(small_cam, cam_poses[i], object_poses={1: obj_poses[i]})
        frames.append({"rgb": rgb, "depth": depth, "mask": None, "timestamp": i})
        gt_masks.append(np.asarray(mask))
    for f in frames:
        engine.process_frame(f)
    return engine, cam_poses, obj_poses, n, gt_masks


def test_crf_spawns_object_model(crf_run):
    engine, gt_cam, gt_obj, n, gt_masks = crf_run
    active = np.asarray(engine.state.models.active)
    assert active[0]
    assert active[1:].any(), "teleported object never segmented"
    slot = 1 + int(np.argmax(active[1:]))
    assert engine.surfel_count(slot) > 50, engine.surfel_count(slot)


def test_crf_camera_accuracy(crf_run):
    engine, gt_cam, gt_obj, n, gt_masks = crf_run
    log = engine.materialized_pose_log()
    errs = [np.linalg.norm(log[i][1][0][:3, 3] - gt_cam[i][:3, 3]) for i in range(n)]
    # the teleport frame pollutes background tracking briefly; bounded error
    assert np.sqrt(np.mean(np.square(errs))) < 0.015, errs


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = float(np.logical_and(a, b).sum())
    union = float(np.logical_or(a, b).sum())
    return inter / union if union else 0.0


def test_crf_segmentation_iou(crf_run):
    """Per-frame IoU of the CRF mask vs the renderer's exact GT mask
    (BASELINE.md 'IoU within 0.5 pt'; dataset-tools README.md:31).  The masks
    come from the engine's device ring exactly as '-es' exports would."""
    engine, gt_cam, gt_obj, n, gt_masks = crf_run
    active = np.asarray(engine.state.models.active)
    slot = 1 + int(np.argmax(active[1:]))
    ious = {}
    for tick, seg in engine.drain_segmentation(flush=True):
        i = tick - 1  # frame i is processed at tick i+1
        if 0 <= i < n:
            ious[i] = _iou(seg == slot, gt_masks[i] == 1)
    # settled frames = the last two (object spawned after the frame-6 teleport,
    # then the map needs a frame to believe it); suppressed-255 startup frames
    # have IoU 0 by construction
    settled = [ious[i] for i in (n - 2, n - 1)]
    assert min(settled) > 0.6, ious
