"""Deformation graph tests: identity behavior, constraint satisfaction, rigid
warp recovery, pose warping."""

import jax.numpy as jnp
import numpy as np
import pytest

from cofusion_tpu.models import surfel_model as sm
from cofusion_tpu.ops import deformation as df


def _line_store(n=64, capacity=128):
    """Surfels along a line, init times increasing (like a scanned trajectory)."""
    rng = np.random.default_rng(3)
    ts = np.arange(n, dtype=np.float32)
    pos = np.stack([ts * 0.05, np.zeros(n), 2.0 + 0.1 * np.sin(ts * 0.2)], axis=1).astype(
        np.float32
    )
    store = sm.empty_store(capacity)
    flat = sm.pack_store(
        pos=jnp.asarray(pos),
        normal=jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1)),
        color=jnp.full((n, 3), 128.0),
        radius=jnp.full((n,), 0.05),
        conf=jnp.full((n,), 10.0),
        init_time=jnp.asarray(ts),
        last_time=jnp.asarray(ts),
        valid=jnp.ones((n,), bool),
        count=jnp.int32(n),
    )
    pad = capacity - n
    flat = jax.tree.map(
        lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        if a.ndim >= 1 and a.shape[0] == n
        else a,
        flat,
    )
    return sm.append(store, flat, jnp.arange(capacity) < n)


import jax  # noqa: E402


def test_identity_graph_is_noop():
    store = _line_store()
    graph = df.sample_graph(store, 16)
    warped = df.apply_to_surfels(graph, store)
    n = int(store.count)
    np.testing.assert_allclose(np.asarray(warped.pos[:n]), np.asarray(store.pos[:n]), atol=1e-5)


def test_optimize_identity_constraints():
    store = _line_store()
    graph = df.sample_graph(store, 16)
    # constraints that are already satisfied -> graph stays ~identity
    src = store.pos[:8]
    st = store.init_time[:8]
    g2, err = df.optimize(graph, src, st, src, jnp.ones(8, bool))
    assert float(err) < 1e-3
    np.testing.assert_allclose(np.asarray(g2.t), 0.0, atol=1e-2)


def test_optimize_translation_constraints():
    store = _line_store()
    graph = df.sample_graph(store, 16)
    # ask the whole map to shift by +5cm in y
    shift = jnp.asarray([0.0, 0.05, 0.0])
    n_c = 16
    src = store.pos[:n_c]
    st = store.init_time[:n_c]
    tgt = src + shift
    g2, err = df.optimize(graph, src, st, tgt, jnp.ones(n_c, bool))
    warped = df.apply_to_surfels(g2, store)
    n = int(store.count)
    moved = np.asarray(warped.pos[:n]) - np.asarray(store.pos[:n])
    # constrained region should move by ~shift
    np.testing.assert_allclose(moved[:n_c].mean(axis=0), np.asarray(shift), atol=0.02)


def test_pose_warp_follows_graph():
    store = _line_store()
    graph = df.sample_graph(store, 16)
    shift = jnp.asarray([0.0, 0.05, 0.0])
    src = store.pos[:16]
    tgt = src + shift
    g2, _ = df.optimize(graph, src, store.init_time[:16], tgt, jnp.ones(16, bool))
    pose = jnp.eye(4).at[:3, 3].set(store.pos[4])
    warped_pose = df.apply_to_pose(g2, pose, store.init_time[4])
    d = np.asarray(warped_pose[:3, 3]) - np.asarray(pose[:3, 3])
    np.testing.assert_allclose(d, np.asarray(shift), atol=0.02)
    # rotation stays orthonormal
    R = np.asarray(warped_pose[:3, :3])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
