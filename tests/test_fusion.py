"""Fusion tests: initialisation, merge-vs-append association, confidence dynamics,
clean-pass removal and free-space decay."""

import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig
from cofusion_tpu.io.synthetic import SyntheticScene
from cofusion_tpu.models import surfel_model as sm
from cofusion_tpu.ops import fusion as fu
from cofusion_tpu.ops import preprocess as pp
from cofusion_tpu.ops import rasterize as rz

CAP = 1 << 16


def _frame(small_cam, T=np.eye(4)):
    scene = SyntheticScene()
    rgb, depth, mask = scene.render(small_cam, T)
    depth = jnp.asarray(depth)
    filtered = pp.bilateral_filter(depth, 5.0)
    fs = fu.make_frame_surfels(depth, filtered, jnp.asarray(rgb), small_cam, 1.0, 4.5)
    return fs, depth, filtered


def test_initialise_counts_and_positions(small_cam):
    fs, depth, _ = _frame(small_cam)
    store = fu.initialise(fs, jnp.eye(4), CAP, time=1)
    n = int(store.count)
    n_valid = int(jnp.sum(fs.valid))
    assert n == n_valid
    # every surfel z should be a real scene depth (0.05..4.5)
    z = np.asarray(store.pos[:n, 2])
    assert (z > 0.0).all() and (z < 4.6).all()
    # prefix-validity invariant
    assert bool(jnp.all(store.valid[:n])) and not bool(jnp.any(store.valid[n:]))


def test_fuse_merges_repeated_observation(small_cam):
    cfg = CoFusionConfig(camera=small_cam)
    fs, depth, filtered = _frame(small_cam)
    eye = jnp.eye(4)
    store = fu.initialise(fs, eye, CAP, time=1)
    n0 = int(store.count)
    conf0 = float(jnp.sum(store.conf))

    imap = rz.predict_indices(store, eye, small_cam, 2, 200, 4.5)
    mask_ok = jnp.ones(small_cam.shape, bool)
    store2 = fu.fuse(store, fs, depth, imap, mask_ok, eye, small_cam, cfg, 2, 4.5)
    n1 = int(store2.count)
    # same viewpoint: nearly all decimated pixels merge, few new surfels
    assert n1 - n0 < 0.05 * n0, (n0, n1)
    assert float(jnp.sum(store2.conf)) > conf0


def test_fuse_appends_novel_geometry(small_cam):
    cfg = CoFusionConfig(camera=small_cam)
    fs, depth, filtered = _frame(small_cam)
    eye = jnp.eye(4)
    # empty-ish store: everything becomes new
    store = sm.empty_store(CAP)
    imap = rz.predict_indices(store, eye, small_cam, 2, 200, 4.5)
    mask_ok = jnp.ones(small_cam.shape, bool)
    store2 = fu.fuse(store, fs, depth, imap, mask_ok, eye, small_cam, cfg, 2, 4.5)
    # ~1/4 of valid pixels due to the 2x2 time stagger
    n_valid = int(jnp.sum(fs.valid))
    n = int(store2.count)
    assert 0.15 * n_valid < n < 0.35 * n_valid, (n, n_valid)


def test_clean_decays_freespace_violators(small_cam):
    cfg = CoFusionConfig(camera=small_cam)
    fs, depth, filtered = _frame(small_cam)
    eye = jnp.eye(4)
    store = fu.initialise(fs, eye, CAP, time=1)
    # plant a phantom surfel in front of the wall at the center pixel
    cy, cx = int(small_cam.cy), int(small_cam.cx)
    true_z = float(depth[cy, cx])
    phantom_z = true_z - 0.5
    n = int(store.count)
    store = store._replace(
        px=store.px.at[n - 1].set(0.0),
        py=store.py.at[n - 1].set(0.0),
        pz=store.pz.at[n - 1].set(phantom_z),
        conf=store.conf.at[n - 1].set(5.0),
    )
    imap = rz.predict_indices(store, eye, small_cam, 2, 200, 4.5)
    out = fu.clean(
        store, imap, filtered, None, 0, eye, small_cam, cfg,
        time=2, time_delta=200, conf_threshold=10.0, outlier_coeff=1.0,
    )
    # the phantom lost confidence; surviving surfels on the wall did not
    # (find the phantom by position — compaction may move it)
    pos = np.asarray(out.pos[: int(out.count)])
    conf = np.asarray(out.conf[: int(out.count)])
    d = np.linalg.norm(pos - np.array([0.0, 0.0, phantom_z]), axis=1)
    j = d.argmin()
    assert d[j] < 1e-4
    assert conf[j] < 5.0 * 0.75, conf[j]


def test_clean_removes_stale_unstable(small_cam):
    cfg = CoFusionConfig(camera=small_cam)
    fs, depth, filtered = _frame(small_cam)
    eye = jnp.eye(4)
    store = fu.initialise(fs, eye, CAP, time=1)
    n0 = int(store.count)
    imap = rz.predict_indices(store, eye, small_cam, 30, 200, 4.5)
    # 29 ticks later, nothing re-observed, confidences below threshold -> all dropped
    out = fu.clean(
        store, imap, filtered, None, 0, eye, small_cam, cfg,
        time=30, time_delta=200, conf_threshold=10.0, outlier_coeff=0.02,
    )
    assert int(out.count) == 0, int(out.count)
    # but with a low threshold they survive
    out2 = fu.clean(
        store, imap, filtered, None, 0, eye, small_cam, cfg,
        time=30, time_delta=200, conf_threshold=0.01, outlier_coeff=0.02,
    )
    assert int(out2.count) == n0
