"""Rasterizer tests: the scatter-min z-buffer point render and disk splatting must
reproduce GL depth-test semantics (SURVEY.md §7 'hard parts' #1)."""

import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig
from cofusion_tpu.models import surfel_model as sm
from cofusion_tpu.ops import rasterize as rz


def _store_from_points(pos, normal=None, radius=0.05, conf=10.0, capacity=64, t=1.0):
    n = len(pos)
    store = sm.empty_store(capacity)
    pos = np.asarray(pos, np.float32)
    if normal is None:
        normal = np.tile([0, 0, -1.0], (n, 1))
    arrs = dict(
        pos=jnp.asarray(pos),
        normal=jnp.asarray(np.asarray(normal, np.float32)),
        color=jnp.full((n, 3), 128.0),
        radius=jnp.full((n,), radius),
        conf=jnp.full((n,), conf),
        init_time=jnp.full((n,), 0.0),
        last_time=jnp.full((n,), t),
        valid=jnp.ones((n,), bool),
    )
    new = sm.pack_store(
        pos=jnp.zeros((capacity, 3)).at[:n].set(arrs["pos"]),
        normal=jnp.zeros((capacity, 3)).at[:n].set(arrs["normal"]),
        color=jnp.zeros((capacity, 3)).at[:n].set(arrs["color"]),
        radius=jnp.zeros((capacity,)).at[:n].set(arrs["radius"]),
        conf=jnp.zeros((capacity,)).at[:n].set(arrs["conf"]),
        init_time=jnp.zeros((capacity,)).at[:n].set(arrs["init_time"]),
        last_time=jnp.zeros((capacity,)).at[:n].set(arrs["last_time"]),
        valid=jnp.zeros((capacity,), bool).at[:n].set(True),
        count=jnp.int32(n),
    )
    return new


def test_point_render_depth_test(small_cam):
    # two surfels on the same pixel ray: nearer one must win
    z_near, z_far = 1.0, 2.0
    # center pixel ray: x = (cx - cx)*z/fx = 0
    store = _store_from_points([[0, 0, z_far], [0, 0, z_near]])
    eye = jnp.eye(4)
    imap = rz.predict_indices(store, eye, small_cam, time=1, time_delta=200, max_depth=5.0)
    cy, cx = int(small_cam.cy), int(small_cam.cx)
    assert int(imap.index[cy, cx]) == 1  # the nearer surfel
    np.testing.assert_allclose(float(imap.vert_conf[cy, cx, 2]), z_near, atol=1e-5)


def test_point_render_projection(small_cam):
    # a surfel at known 3D position lands on the expected pixel
    u, v, z = 100.5, 40.5, 1.5
    x = (u - small_cam.cx) * z / small_cam.fx
    y = (v - small_cam.cy) * z / small_cam.fy
    store = _store_from_points([[x, y, z]])
    imap = rz.predict_indices(store, jnp.eye(4), small_cam, 1, 200, 5.0)
    assert int(imap.index[int(v), int(u)]) == 0
    assert int(jnp.sum(imap.valid)) == 1


def test_point_render_respects_pose(small_cam):
    # camera translated +0.5 in x: world point at x=0.5 projects to center
    store = _store_from_points([[0.5, 0.0, 2.0]])
    pose = jnp.eye(4).at[0, 3].set(0.5)
    imap = rz.predict_indices(store, pose, small_cam, 1, 200, 5.0)
    cy, cx = int(small_cam.cy), int(small_cam.cx)
    assert int(imap.index[cy, cx]) == 0


def test_point_render_time_window(small_cam):
    store = _store_from_points([[0, 0, 2.0]], t=1.0)
    # active render at time 300 with window 200: surfel (last_time=1) is inactive
    imap = rz.predict_indices(store, jnp.eye(4), small_cam, 300, 200, 5.0)
    assert int(jnp.sum(imap.valid)) == 0
    imap_inactive = rz.predict_indices(
        store, jnp.eye(4), small_cam, 300, 200, 5.0, active_window=False
    )
    assert int(jnp.sum(imap_inactive.valid)) == 1


def test_splat_fills_disk(small_cam):
    cfg = CoFusionConfig(camera=small_cam)
    # a big frontal disk at z=2 should cover multiple pixels around the center
    store = _store_from_points([[0, 0, 2.0]], normal=[[0, 0, -1.0]], radius=0.06)
    splat = rz.splat_predict(
        store, jnp.eye(4), small_cam, cfg, time=1, time_delta=200, max_depth=5.0,
        conf_threshold=0.0,
    )
    cy, cx = int(small_cam.cy), int(small_cam.cx)
    n_valid = int(jnp.sum(splat.valid))
    assert bool(splat.valid[cy, cx])
    # radius 0.06 at z=2, f=132 -> ~4 px radius disk, clipped by the 3px window
    assert n_valid > 20, n_valid
    np.testing.assert_allclose(float(splat.vert_conf[cy, cx, 2]), 2.0, atol=1e-4)
    # off-center pixel inside the disk: depth still ~2 (frontal plane)
    np.testing.assert_allclose(float(splat.vert_conf[cy + 2, cx + 2, 2]), 2.0, atol=1e-3)


def test_splat_depth_order(small_cam):
    cfg = CoFusionConfig(camera=small_cam)
    # two overlapping disks; pixels covered by both must show the nearer
    store = _store_from_points(
        [[0.0, 0.0, 2.0], [0.01, 0.0, 1.5]], normal=[[0, 0, -1.0], [0, 0, -1.0]], radius=0.05
    )
    splat = rz.splat_predict(
        store, jnp.eye(4), small_cam, cfg, 1, 200, 5.0, conf_threshold=0.0
    )
    cy, cx = int(small_cam.cy), int(small_cam.cx)
    assert abs(float(splat.vert_conf[cy, cx, 2]) - 1.5) < 1e-3


def test_compact_and_append():
    store = _store_from_points([[0, 0, 1.0], [1, 1, 1.0], [2, 2, 2.0]], capacity=8)
    keep = jnp.asarray([True, False, True] + [False] * 5)
    out = sm.compact(store, keep)
    assert int(out.count) == 2
    np.testing.assert_allclose(np.asarray(out.pos[0]), [0, 0, 1.0])
    np.testing.assert_allclose(np.asarray(out.pos[1]), [2, 2, 2.0])
    assert not bool(out.valid[2])

    extra = _store_from_points([[5, 5, 5.0]], capacity=8)
    mask = jnp.zeros((8,), bool).at[0].set(True)
    out2 = sm.append(out, extra, mask)
    assert int(out2.count) == 3
    np.testing.assert_allclose(np.asarray(out2.pos[2]), [5, 5, 5.0])
