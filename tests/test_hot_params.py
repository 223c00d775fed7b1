"""Hot-tunable runtime parameters (VERDICT r3 item 7).

The reference re-reads ~25 Pangolin Vars every frame and pushes them into the
engine via setters (GUI/MainController.cpp:448-473): icpWeight, depthCutoff,
outlierCoefficient, all CRF weights/thresholds, per-model confidence sliders.
Here those ride the traced `fparams` dict: `engine.set_params(...)` changes
them mid-run with ZERO recompilation (asserted via the jit cache size).
"""

import numpy as np
import pytest

from cofusion_tpu.config import CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import SyntheticScene, camera_trajectory


@pytest.fixture(scope="module")
def hot_engine(small_cam):
    cfg = CoFusionConfig(camera=small_cam, max_models=3, max_surfels=1 << 14, superpixel_size=6)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(depth_cutoff=4.5, confidence_global=1.5),
        enable_multi_model=True,
    )
    scene = SyntheticScene()
    poses = camera_trajectory(8, kind="orbit", scale=0.25)
    frames = []
    for i in range(8):
        rgb, depth, _ = scene.render(small_cam, poses[i])
        frames.append({"rgb": rgb, "depth": depth, "mask": None, "timestamp": i})
    return engine, frames


def _cache_sizes(engine):
    return [f._cache_size() for f in engine._step_fns.values()]


def test_set_params_no_recompile(hot_engine):
    engine, frames = hot_engine
    for f in frames[:3]:
        engine.process_frame(f)
    engine.stats()
    before = _cache_sizes(engine)
    assert before == [1], before

    # the reference's hot GUI-Var set, all at once
    engine.set_params(
        icp_weight=25.0,
        outlier_coefficient=5.0,
        weight_appearance=10.0,
        weight_smoothness=1.0,
        unary_k_error=0.05,
        unary_threshold_new=4.0,
        unary_weight_error=50.0,
        crf_scale_rgb=0.2,
        min_rel_size_new=0.02,
        max_rel_size_new=0.5,
    )
    for f in frames[3:5]:
        engine.process_frame(f)
    engine.stats()
    assert _cache_sizes(engine) == before, "set_params must not recompile"


def test_set_params_values_are_consumed(hot_engine):
    engine, frames = hot_engine
    n0 = engine.surfel_count(0)
    # depth_cutoff 0 -> every input pixel invalid -> nothing can fuse/append
    engine.set_params(depth_cutoff=0.0)
    engine.process_frame(frames[5])
    engine.stats()
    assert engine.surfel_count(0) <= n0, "depth_cutoff=0 must stop map growth"
    engine.set_params(depth_cutoff=4.5)
    engine.process_frame(frames[6])
    engine.stats()
    assert _cache_sizes(engine) == [1]


def test_set_confidence_threshold_no_recompile(hot_engine):
    engine, frames = hot_engine
    engine.set_confidence_threshold(0, 2.5)
    engine.process_frame(frames[7])
    engine.stats()
    assert _cache_sizes(engine) == [1]
    assert float(np.asarray(engine.state.models.conf_threshold)[0]) == pytest.approx(2.5)


def test_set_params_rejects_unknown():
    engine = CoFusion(CoFusionConfig())
    with pytest.raises(ValueError):
        engine.set_params(not_a_param=1.0)
