"""Model-to-model odometry / local loop closure + deformation-graph wiring
(Core/CoFusion.cpp:387-459 — dead behind assert(0) in the reference release;
implemented here behind the close-loops gate per SURVEY §7).

Scenario: the recent (ACTIVE) map has drifted relative to the old (INACTIVE)
map of the same scene.  The local loop must (a) recover the drift with
splat-vs-splat odometry, (b) emit valid surface constraints, and (c) the
deformation pass must pull the drifted geometry back, reducing pose error
end-to-end."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams  # noqa: E402
from cofusion_tpu.engine import CoFusion  # noqa: E402
from cofusion_tpu.io.synthetic import make_sequence  # noqa: E402


@pytest.fixture(scope="module")
def loop_cam():
    return CameraConfig(width=80, height=64, fx=66.0, fy=66.0, cx=40.0, cy=32.0)


@pytest.fixture(scope="module")
def loop_cfg(loop_cam):
    return CoFusionConfig(
        camera=loop_cam, max_models=1, max_surfels=1 << 14,
        deform_nodes=64, cons_sample=8,
    )


def test_local_loop_op_detects_drift(loop_cam, loop_cfg):
    """Op-level: old surfels hold the true scene; recent surfels the same scene
    shifted by 3 cm.  The splat-vs-splat odometry must estimate a corrective
    pose ~= the shift."""
    from cofusion_tpu.config import TrackingParams
    from cofusion_tpu.models import surfel_model as sm
    from cofusion_tpu.ops import fusion as fu
    from cofusion_tpu.ops import local_loop as ll
    from cofusion_tpu.ops import preprocess as pp
    from cofusion_tpu.ops import rasterize as rz
    from cofusion_tpu.io.synthetic import SyntheticScene

    scene = SyntheticScene()
    rgb, depth, _ = scene.render(loop_cam, np.eye(4))
    rgb = jnp.asarray(rgb, jnp.float32)
    depth = jnp.asarray(depth)
    filtered = pp.bilateral_filter(depth, 4.5)
    fs = fu.make_frame_surfels(depth, filtered, rgb, loop_cam, 1.0, 4.5)

    # old map: true geometry, stale timestamps (INACTIVE)
    store = fu.initialise(fs, jnp.eye(4), loop_cfg.max_surfels, time=1)
    store = store._replace(
        last_time=jnp.where(store.valid, -500.0, store.last_time),
        conf=jnp.where(store.valid, 10.0, store.conf),
    )
    # recent map: same geometry shifted 3 cm in +x, fresh timestamps
    drift = jnp.asarray([0.03, 0.0, 0.0])
    recent = sm.with_pos(store, store.pos + drift)._replace(
        last_time=jnp.where(store.valid, 100.0, 0.0)
    )
    merged = jax.tree.map(
        lambda old, new: old if old.ndim == 0 else jnp.concatenate([old, new], axis=0),
        store, recent,
    )
    merged = merged._replace(count=store.count * 2)

    tick = jnp.int32(100)
    pose = jnp.eye(4, dtype=jnp.float32)
    act = rz.splat_predict(
        merged, pose, loop_cam, loop_cfg, tick, jnp.int32(50), jnp.float32(4.5),
        jnp.float32(1.0),
    )
    assert float(act.valid.mean()) > 0.3  # the ACTIVE splat must render

    npx_scale = (loop_cam.width * loop_cam.height) / (640.0 * 480.0)
    old = rz.splat_predict(
        merged, pose, loop_cam, loop_cfg, tick, jnp.int32(50), jnp.float32(4.5),
        jnp.float32(1.0), active_window=False,
    )
    res = ll.local_loop(
        old, pose, act, loop_cam, loop_cfg, TrackingParams(), tick,
        jnp.int32(50), jnp.float32(4.5), jnp.float32(1.0),
        jnp.float32(1e-4), jnp.float32(5e-4), jnp.float32(40000.0 * npx_scale),
    )
    # corrective pose must be ~ Trans(-drift): it re-expresses the shifted
    # active geometry onto the true (old) geometry
    corr = np.asarray(res.est_pose[:3, 3])
    assert np.linalg.norm(corr + np.asarray(drift)) < 0.01, corr
    assert bool(res.accepted)
    assert int(res.num_constraints) > 10


@pytest.fixture(scope="module")
def drift_run(loop_cam, loop_cfg):
    """Engine-level: warm a map, age it to INACTIVE, inject pose drift, keep
    mapping — once with close_loops and once without."""
    n_warm, n_after = 6, 4
    frames, gt, _ = make_sequence(loop_cam, n_warm + n_after, kind="still")
    drift = np.array([0.03, 0.015, 0.0], np.float32)

    results = {}
    for close in (True, False):
        engine = CoFusion(
            loop_cfg,
            fusion_params=FusionParams(
                depth_cutoff=4.5, confidence_global=1.0,
                local_loop_cov_thresh=1e-4, local_loop_err_thresh=5e-4,
            ),
            close_loops=close,
        )
        for f in frames[:n_warm]:
            engine.process_frame(f)
        # age the whole map out of the active window + inject drift
        st = engine.state
        store = st.models.store
        aged = store._replace(
            last_time=jnp.where(store.valid, -500.0, store.last_time)
        )
        pose = st.models.pose
        drifted = pose.at[0, :3, 3].add(jnp.asarray(drift))
        engine.state = st._replace(models=st.models._replace(store=aged, pose=drifted))
        closed = False
        for f in frames[n_warm:]:
            engine.process_frame(f)
            out = engine._last_outputs
            closed = closed or bool(out.loop_closed)
        err = float(np.linalg.norm(engine.camera_pose()[:3, 3] - gt[-1][:3, 3]))
        results[close] = (err, closed)
    return results, float(np.linalg.norm(drift))


def test_local_loop_closes_and_reduces_drift(drift_run):
    results, drift_mag = drift_run
    err_closed, closed = results[True]
    err_open, _ = results[False]
    assert closed, "no loop closure fired on revisit"
    # without closing, the injected drift persists; with closing it must shrink
    assert err_open > 0.6 * drift_mag, (err_open, drift_mag)
    assert err_closed < 0.5 * err_open, (err_closed, err_open)


def test_pose_history_healed_on_closure(loop_cam, loop_cfg):
    """Round-3: an accepted closure must warp the ALREADY-LOGGED trajectory
    through the graph (applyGraphToPoses, DeformationGraph.cpp:89-116), not
    just the current pose — '-ep' exports the healed history.

    The closure is deliberately DELAYED two frames (impossible inlier gate)
    so drifted entries accumulate in the history before it fires."""
    import dataclasses

    n_warm, n_blocked, n_open = 6, 2, 3
    frames, gt, _ = make_sequence(loop_cam, n_warm + n_blocked + n_open, kind="still")
    drift = np.array([0.03, 0.015, 0.0], np.float32)

    engine = CoFusion(
        loop_cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_global=1.0,
            local_loop_cov_thresh=1e-4, local_loop_err_thresh=5e-4,
        ),
        close_loops=True,
    )
    for f in frames[:n_warm]:
        engine.process_frame(f)
    st = engine.state
    store = st.models.store
    aged = store._replace(last_time=jnp.where(store.valid, -500.0, store.last_time))
    pose = st.models.pose.at[0, :3, 3].add(jnp.asarray(drift))
    engine.state = st._replace(models=st.models._replace(store=aged, pose=pose))

    # phase 1: closure gated off -> drifted poses land in the history
    blocked = dataclasses.replace(engine.fusion, local_loop_count_thresh=1e12)
    normal = engine.fusion
    engine.fusion = blocked
    for f in frames[n_warm:n_warm + n_blocked]:
        engine.process_frame(f)
    log_before = engine.materialized_pose_log()
    drift_errs = [
        np.linalg.norm(log_before[i][1][0][:3, 3] - gt[i][:3, 3])
        for i in range(n_warm, n_warm + n_blocked)
    ]
    assert min(drift_errs) > 0.02, f"drift never entered the log: {drift_errs}"

    # phase 2: closure allowed -> must fire and heal the logged entries
    engine.fusion = normal
    closed = False
    for f in frames[n_warm + n_blocked:]:
        engine.process_frame(f)
        closed = closed or bool(engine._last_outputs.loop_closed)
    assert closed, "no loop closure fired"

    log_after = engine.materialized_pose_log()
    healed_errs = [
        np.linalg.norm(log_after[i][1][0][:3, 3] - gt[i][:3, 3])
        for i in range(n_warm, n_warm + n_blocked)
    ]
    assert max(healed_errs) < 0.6 * min(drift_errs), (drift_errs, healed_errs)
