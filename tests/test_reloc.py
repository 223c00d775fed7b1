"""Relocalization end-to-end (-rl; BASELINE config 5 stand-in): tracking-lost
detection via odometry covariance (CoFusion.cpp:301-338) and fern-keyframe
recovery (Ferns::findFrame)."""

import numpy as np
import pytest

from cofusion_tpu.config import CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import SyntheticScene


@pytest.fixture(scope="module")
def reloc_run(small_cam):
    cfg = CoFusionConfig(camera=small_cam, max_models=1, max_surfels=1 << 16)
    engine = CoFusion(
        cfg,
        # fern maps here are 20x16 (test camera is 1/4 scale) -> the ICP error
        # gate tuned for 80x60 is too strict; the recovered pose is refined by
        # normal tracking on the following frames
        # confidence_global=1: with only 6 warmup frames the map must clear the
        # splat threshold or post-recovery tracking has no map anchor to refine to
        fusion_params=FusionParams(
            depth_cutoff=4.5, fern_min_age=3, fern_icp_error_thresh=1.2e-3,
            confidence_global=1.0,
        ),
        enable_relocalization=True,
    )
    scene = SyntheticScene()
    eye = np.eye(4)
    T_re = np.eye(4)
    T_re[:3, 3] = (0.06, -0.03, 0.02)  # re-appear slightly off the keyframe pose

    rgb0, depth0, _ = scene.render(small_cam, eye)
    rgb_re, depth_re, _ = scene.render(small_cam, T_re)
    black_rgb = np.full_like(rgb0, 10)
    black_depth = np.zeros_like(depth0)

    lost_flags, poses = [], []
    i = 0

    def feed(rgb, depth, n):
        nonlocal i
        for _ in range(n):
            engine.process_frame({"rgb": rgb, "depth": depth, "mask": None, "timestamp": i})
            lost_flags.append(bool(engine.state.lost))
            poses.append(np.asarray(engine.state.models.pose[0]))
            i += 1

    feed(rgb0, depth0, 6)            # healthy warmup -> keyframes
    feed(black_rgb, black_depth, 14)  # sensor blackout -> lost
    feed(rgb_re, depth_re, 3)        # scene returns at T_re -> recovery
    return engine, lost_flags, poses, T_re


def test_lost_detected(reloc_run):
    engine, lost_flags, poses, T_re = reloc_run
    assert not any(lost_flags[:6]), lost_flags[:6]
    assert any(lost_flags[6:20]), "blackout never triggered lost"


def test_keyframes_added(reloc_run):
    engine, lost_flags, poses, T_re = reloc_run
    assert int(engine.state.fern_db.count) >= 1


def test_recovered(reloc_run):
    engine, lost_flags, poses, T_re = reloc_run
    assert not lost_flags[-1], "still lost after the scene returned"
    err = np.linalg.norm(poses[-1][:3, 3] - T_re[:3, 3])
    assert err < 0.03, (poses[-1][:3, 3], T_re[:3, 3])  # post-recovery tracking refines
