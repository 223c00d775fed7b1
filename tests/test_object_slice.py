"""Object-slot active-slice (engine._fuse_clean_all): object slots (m > 0)
run fuse/clean on a static [:object_active_capacity] slice of the stacked
store.  This config forces the slice strictly smaller than the background
capacity (A_obj = 2^14 < A = 2^16) so the slice/write-back path is exercised:
the object must still spawn, fuse, and track, its count must respect the
slice bound, and no row beyond the slice may ever become valid.
"""

import numpy as np
import pytest

from cofusion_tpu.config import CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import make_sequence


@pytest.fixture(scope="module")
def sliced_run(small_cam):
    cfg = CoFusionConfig(
        camera=small_cam,
        max_models=3,
        max_surfels=1 << 16,
        expel_block_log2=14,
        object_active_surfels=1 << 14,
    )
    assert cfg.object_active_capacity < cfg.active_capacity  # test premise
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, model_spawn_offset=0
        ),
        enable_multi_model=True,
    )
    n = 6
    frames, gt_cam, gt_obj = make_sequence(
        small_cam, n, kind="orbit", moving_object=True
    )
    for f in frames:
        engine.process_frame(f)
    return engine, gt_cam, gt_obj, n, cfg


def test_object_spawns_within_slice(sliced_run):
    engine, _, _, _, cfg = sliced_run
    active = np.asarray(engine.state.models.active)
    assert active[0] and active[1], active
    counts = np.asarray(engine.state.models.store.count)
    cap_obj = cfg.object_active_capacity
    assert 200 < counts[1] <= cap_obj, counts
    # no object row beyond the slice may ever be valid
    valid = np.asarray(engine.state.models.store.valid)
    assert not valid[1:, cap_obj:].any()
    # valid-prefix invariant holds on the sliced store
    assert valid[1, : counts[1]].all()
    assert not valid[1, counts[1] :].any()


def test_camera_accuracy_unaffected_by_slice(sliced_run):
    engine, gt_cam, _, n, _ = sliced_run
    log = engine.materialized_pose_log()
    errs = [
        np.linalg.norm(log[i][1][0][:3, 3] - gt_cam[i][:3, 3]) for i in range(n)
    ]
    assert np.sqrt(np.mean(np.square(errs))) < 0.005, errs
