"""Round-3 lifecycle/correctness regressions:

  * model-slot recycling: a model dies, a new object spawns into the recycled
    slot and must inherit NOTHING (map, pose, threshold) from the dead model
    (spawnObjectModel creates a fresh Model, Core/CoFusion.cpp:588-597; ids are
    sequential and unbounded, :628-644);
  * '-p' + GT masks: segmentation is skipped entirely under inPose
    (CoFusion.cpp:340-343) — no mask id may be consumed;
  * pose-HISTORY correction on accepted loop closures (applyGraphToPoses,
    Core/Utils/DeformationGraph.cpp:89-116);
  * stable-tier ring append (round-robin overwrite, not fixed-tail);
  * big-capacity z-buffer fallback (capacity > 2^23 leaves < 8 z bits).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofusion_tpu.config import CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import SyntheticScene, camera_trajectory


def _churn_frames(cam, n_a=4, n_gap=2, n_b=4):
    """Object A (id 1, left) visible then gone; object B (id 2, right) appears."""
    scene = SyntheticScene()
    h = 0.16
    scene.add_moving_box(model_id=1, lo=[-h, -h, -h], hi=[h, h, h])
    scene.add_moving_box(model_id=2, lo=[-h, -h, -h], hi=[h, h, h])
    away = np.eye(4)
    away[:3, 3] = [0.0, 0.0, -50.0]  # behind the camera: invisible

    def pose_at(x, s):
        T = np.eye(4)
        # constant tilt (ICP-degenerate otherwise) + slide so A's pose drifts
        from scipy.spatial.transform import Rotation

        T[:3, :3] = Rotation.from_rotvec([0.35, 0.5, 0.0]).as_matrix()
        T[:3, 3] = [x + 0.05 * s, -0.25, 1.8]
        return T

    frames = []
    n = n_a + n_gap + n_b
    for i in range(n):
        if i < n_a:
            op = {1: pose_at(-0.65, i), 2: away}
        elif i < n_a + n_gap:
            op = {1: away, 2: away}
        else:
            op = {1: away, 2: pose_at(0.65, 0)}
        rgb, depth, mask = scene.render(cam, np.eye(4), object_poses=op)
        frames.append({"rgb": rgb, "depth": depth, "mask": mask, "timestamp": i})
    return frames, n_a, n_gap, n_b


@pytest.fixture(scope="module")
def churn_run(small_cam):
    cfg = CoFusionConfig(camera=small_cam, max_models=2, max_surfels=1 << 16)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, model_spawn_offset=0,
            model_deactivate_count=1,
        ),
        enable_multi_model=True,
    )
    frames, n_a, n_gap, n_b = _churn_frames(small_cam)
    poses_at_b_spawn = None
    for i, f in enumerate(frames):
        engine.process_frame(f)
        if i == n_a + n_gap:
            poses_at_b_spawn = np.asarray(engine.state.models.pose)
    return engine, poses_at_b_spawn


def test_recycled_slot_drops_dead_models_map(churn_run):
    engine, _ = churn_run
    # B spawned into the recycled slot 1 (the only object slot)
    active = np.asarray(engine.state.models.active)
    assert active[1], active
    surfels = engine.download_model(1)
    assert surfels["pos"].shape[0] > 100, "B has no map"
    # every surfel of slot 1 must be B's geometry (x ~ +0.65 in the model
    # frame, which equals the camera frame at spawn); any x < 0 points are
    # leftovers of dead model A (x ~ -0.65)
    assert np.all(surfels["pos"][:, 0] > 0.0), (
        f"recycled slot leaked {np.sum(surfels['pos'][:, 0] <= 0)} dead-model surfels"
    )


def test_recycled_slot_pose_starts_at_camera(churn_run):
    _, poses_at_b_spawn = churn_run
    # spawn resets the slot pose to the current camera pose (still camera ->
    # identity), not dead-A's slid pose
    err = np.linalg.norm(poses_at_b_spawn[1] - np.eye(4))
    assert err < 0.05, poses_at_b_spawn[1]


def test_slot_freed_for_sequential_objects(churn_run):
    engine, _ = churn_run
    # with max_models=2 a THIRD object could still spawn after B dies — the
    # host free-list must have recycled slot 1 (id 2 -> slot 1 in the mapper,
    # id 1 purged)
    assert engine._gt_mapper.mapping.get(2) == 1
    assert 1 not in engine._gt_mapper.mapping  # dead A's id purged


def test_model_listeners_fire_on_churn(small_cam):
    """addNewModelListener / addInactiveModelListener parity
    (CoFusion.h:286-289, fired at CoFusion.cpp:607/:624): GT-mask mode fires
    immediately on spawn and on unseen-deactivation recycling."""
    cfg = CoFusionConfig(camera=small_cam, max_models=2, max_surfels=1 << 16)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, model_spawn_offset=0,
            model_deactivate_count=1,
        ),
        enable_multi_model=True,
    )
    spawned, killed = [], []
    engine.add_new_model_listener(spawned.append)
    engine.add_inactive_model_listener(killed.append)
    frames, n_a, n_gap, n_b = _churn_frames(small_cam)
    for f in frames:
        engine.process_frame(f)
    # A spawns into slot 1, dies in the gap; B re-spawns into the recycled slot
    assert spawned == [1, 1], spawned
    assert killed == [1], killed


def test_gt_pose_skips_mask_commit(small_cam):
    """'-p' + GT masks: the reference skips segmentation under inPose
    (CoFusion.cpp:340-343); committing a mapping would consume the id forever."""
    cfg = CoFusionConfig(camera=small_cam, max_models=2, max_surfels=1 << 15)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(depth_cutoff=4.5, model_spawn_offset=0),
        enable_multi_model=True,
    )
    frames, _, _, _ = _churn_frames(small_cam, n_a=3, n_gap=0, n_b=0)
    for f in frames:
        engine.process_frame(f, gt_pose=np.eye(4))
    assert engine._used_slots == {0}
    assert engine._gt_mapper.mapping == {0: 0}
    assert not bool(np.asarray(engine.state.models.active)[1])


def test_apply_to_poses_translates_log():
    """A graph whose nodes all carry translation t must move every logged pose
    by ~t while keeping rotations orthonormal (applyGraphToPoses)."""
    from cofusion_tpu.ops import deformation as df

    G = 16
    graph = df.DeformationGraph(
        positions=jnp.stack(
            [jnp.linspace(-1, 1, G), jnp.zeros(G), jnp.full((G,), 2.0)], axis=-1
        ),
        times=jnp.arange(G, dtype=jnp.float32),
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (G, 3, 3)),
        t=jnp.broadcast_to(jnp.asarray([0.05, -0.02, 0.01], jnp.float32), (G, 3)),
        valid=jnp.ones((G,), bool),
        count=jnp.int32(G),
    )
    P = 8
    poses = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (P, 4, 4))
    poses = poses.at[:, 0, 3].set(jnp.linspace(-0.5, 0.5, P))
    times = jnp.linspace(0, G - 1, P)
    out = np.asarray(df.apply_to_poses(graph, poses, times))
    shift = out[:, :3, 3] - np.asarray(poses[:, :3, 3])
    assert np.allclose(shift, [0.05, -0.02, 0.01], atol=1e-4), shift
    for i in range(P):
        R = out[i, :3, :3]
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_stable_ring_wraps_round_robin():
    """Overflowing stable appends must cycle the write offset (oldest rows
    overwritten), not clobber one fixed tail window."""
    from cofusion_tpu.models import surfel_model as sm

    S, B = 64, 16
    stable = sm.empty_store(S)
    offs = []
    for k in range(8):  # 8 * 16 = 2x capacity
        blk = sm.empty_store(B)
        blk = blk._replace(
            px=jnp.full((B,), float(k)), valid=jnp.ones((B,), bool),
            count=jnp.int32(B),
        )
        before = int(stable.count)
        stable = sm.append_block(stable, blk)
        offs.append(before % S)
    # second lap overwrites from the START again, not the tail
    assert offs[4] == 0 and offs[5] == 16, offs
    # newest data survives: last lap's markers all present
    px = np.asarray(stable.px)
    assert set(np.unique(px)) == {4.0, 5.0, 6.0, 7.0}, np.unique(px)


def test_zbuffer_bigcap_fallback_matches_packed():
    """capacity > 2^23 takes the two-pass float z-buffer; winners must match
    the packed-key path computed at a small capacity."""
    from cofusion_tpu.ops.rasterize import _zbuffer

    rng = np.random.default_rng(0)
    N, HW = 4096, 256
    lin = jnp.asarray(rng.integers(0, HW, N), jnp.int32)
    z = jnp.asarray(rng.uniform(0.1, 4.0, N), jnp.float32)
    ok = jnp.asarray(rng.uniform(size=N) < 0.9)
    lin = jnp.where(ok, lin, HW)
    small = np.asarray(_zbuffer(lin, ok, z, 0, HW, N, 4.5))
    big = np.asarray(_zbuffer(lin, ok, z, 0, HW, 1 << 24, 4.5))
    has_s = small < N
    has_b = big < (1 << 24)
    assert np.array_equal(has_s, has_b)
    # same winning surfel except where two entries quantize to the same depth
    # bucket in the packed path; compare true depths instead of indices
    zs = np.asarray(z)
    win_s = np.where(has_s, zs[np.minimum(small, N - 1)], np.inf)
    win_b = np.where(has_b, zs[np.minimum(big, N - 1)], np.inf)
    assert np.allclose(win_s[has_s], win_b[has_s], atol=4.5 / 255.0)
