"""Checkpoint/resume: saving mid-sequence and resuming must reproduce the run."""

import numpy as np

from cofusion_tpu.config import CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import make_sequence
from cofusion_tpu.utils import checkpoint as ckpt


def test_checkpoint_resume_bitexact(small_cam, tmp_path):
    cfg = CoFusionConfig(camera=small_cam, max_models=1, max_surfels=1 << 16)
    fp = FusionParams(depth_cutoff=4.5)
    frames, gt, _ = make_sequence(small_cam, 6, kind="orbit")

    a = CoFusion(cfg, fusion_params=fp)
    for f in frames[:4]:
        a.process_frame(f)
    path = str(tmp_path / "state.ckpt")
    ckpt.save_engine(a, path)

    b = CoFusion(cfg, fusion_params=fp)
    ckpt.load_engine(b, path)
    assert int(b.state.tick) == int(a.state.tick)

    for f in frames[4:]:
        a.process_frame(f)
        b.process_frame(f)

    pa = np.asarray(a.state.models.pose)
    pb = np.asarray(b.state.models.pose)
    np.testing.assert_allclose(pa, pb, atol=1e-6)
    assert a.surfel_count(0) == b.surfel_count(0)
    la = a.materialized_pose_log()
    lb = b.materialized_pose_log()
    assert len(la) == len(lb)
    np.testing.assert_allclose(la[-1][1], lb[-1][1], atol=1e-6)
