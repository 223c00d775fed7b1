"""Round-2 regression tests: GT-mask spawn-cooldown retry, pose-history flush
beyond the device ring capacity, Parse negative-value handling, world-frame
object PLY export composition."""

import numpy as np
import pytest

from cofusion_tpu.cli import Parse
from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import make_sequence


def test_parse_negative_values():
    p = Parse(["-or", "-3", "-d", "4.5", "-x", "-1e-3", "-flagonly", "-s", "2"])
    assert p.float_arg("-or", 99.0) == -3.0
    assert p.float_arg("-d", 0.0) == 4.5
    assert p.float_arg("-x", 0.0) == -1e-3
    assert p.flag("-flagonly")
    assert p.arg("-flagonly") is None  # next token '-s' is a flag, not a value
    assert p.int_arg("-s", 0) == 2


def test_gt_spawn_respects_cooldown_and_retries(small_cam):
    """A mask id that appears BEFORE spawn_offset frames have elapsed must not
    consume its slot: the mapping commits only when the device accepts the
    spawn, and earlier frames retry (ADVICE round 1, Segmentation.cpp:86-90)."""
    cfg = CoFusionConfig(camera=small_cam, max_models=3, max_surfels=1 << 16)
    offset = 3
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, model_spawn_offset=offset
        ),
        enable_multi_model=True,
    )
    n = 8
    frames, _, _ = make_sequence(small_cam, n, kind="orbit", moving_object=True)
    spawn_frame = None
    for i, f in enumerate(frames):
        engine.process_frame(f)
        if spawn_frame is None and 1 in engine._gt_mapper.mapping.values():
            spawn_frame = i
    # mask id 1 is visible from frame 0, but the mapping may only commit once
    # host_cooldown >= offset, i.e. at frame `offset + 1` (frame 0 is init)
    assert spawn_frame == offset + 1, spawn_frame
    active = np.asarray(engine.state.models.active)
    assert active[1], "object model never spawned despite early mask"
    assert engine.surfel_count(1) > 100


def test_pose_log_survives_ring_wrap():
    """Sequences longer than max_log_frames must export correct trajectories
    (the history is flushed to the host before the device ring wraps)."""
    cam = CameraConfig(width=80, height=64, fx=66.0, fy=66.0, cx=40.0, cy=32.0)
    cap = 12
    cfg = CoFusionConfig(
        camera=cam, max_models=1, max_surfels=1 << 14, max_log_frames=cap
    )
    engine = CoFusion(cfg, fusion_params=FusionParams(depth_cutoff=4.5))
    n = 2 * cap + 3  # well past one full ring
    frames, gt, _ = make_sequence(cam, n, kind="orbit")
    per_frame = []
    for f in frames:
        engine.process_frame(f)
        per_frame.append(np.asarray(engine.state.models.pose).copy())
    log = engine.materialized_pose_log()
    assert len(log) == n
    for i in range(1, n):
        np.testing.assert_allclose(log[i][1], per_frame[i], atol=1e-6)


def test_export_ply_transform(tmp_path):
    """Object clouds must land in world coordinates: export with
    Tp = P_cam * P_obj^-1 places a model-local point at its world position."""
    from scipy.spatial.transform import Rotation

    from cofusion_tpu.utils import export

    rng = np.random.default_rng(3)
    n = 50
    surfels = {
        "pos": rng.standard_normal((n, 3)).astype(np.float32),
        "normal": rng.standard_normal((n, 3)).astype(np.float32),
        "color": (rng.random((n, 3)) * 255).astype(np.float32),
        "radius": rng.random(n).astype(np.float32),
        "conf": np.full(n, 20.0, np.float32),
    }
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec([0.2, -0.4, 0.1]).as_matrix()
    T[:3, 3] = (1.0, -2.0, 0.5)
    path = str(tmp_path / "cloud-1.ply")
    export.export_ply(path, surfels, conf_threshold=10.0, transform=T)
    back = export.read_ply(path)
    want = surfels["pos"] @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(back["pos"], want, atol=1e-5)
    # normals rotated and flipped
    want_n = -(surfels["normal"] @ np.linalg.inv(T[:3, :3].astype(np.float32)))
    np.testing.assert_allclose(back["normal"], want_n, atol=1e-5)
