"""Bit-stable rerun determinism (SURVEY §4: "determinism tests (bit-stable
reruns)" — the reference's GPU reductions are deterministic per launch config;
our XLA programs must be too, or accuracy regressions hide behind run noise).

Two full engine runs over the same 30-frame synthetic orbit (CRF segmentation,
moving object, spawn/fuse/clean active) must produce BIT-IDENTICAL pose
trajectories and final map state.
"""

import numpy as np

from cofusion_tpu.config import CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import make_sequence


def _drive(small_cam, frames):
    cfg = CoFusionConfig(camera=small_cam, max_models=4, max_surfels=1 << 17)
    eng = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, confidence_global=1.5,
            model_spawn_offset=4, model_deactivate_count=3,
        ),
        enable_multi_model=True,
    )
    for f in frames:
        eng.process_frame({"rgb": f["rgb"], "depth": f["depth"]})
    poses = np.asarray(eng.state.models.pose)
    counts = np.asarray(eng.state.models.store.count)
    pos = np.asarray(eng.state.models.store.pos)
    log = eng.materialized_pose_log()
    return poses, counts, pos, log


def test_bit_stable_rerun(small_cam):
    frames, _, _ = make_sequence(small_cam, 30, kind="orbit", moving_object=True)
    p1, c1, s1, log1 = _drive(small_cam, frames)
    p2, c2, s2, log2 = _drive(small_cam, frames)
    # bit-identical: exact array equality, no tolerance
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(s1, s2)
    assert len(log1) == len(log2)
    for (ta, pa), (tb, pb) in zip(log1, log2):
        assert ta == tb
        np.testing.assert_array_equal(pa, pb)
