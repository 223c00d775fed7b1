"""Fern keyframe database tests: encoding determinism, novelty-gated insertion,
retrieval of the right keyframe, photometric check sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from cofusion_tpu.config import CameraConfig
from cofusion_tpu.io.synthetic import SyntheticScene, camera_trajectory
from cofusion_tpu.ops import ferns as fn
from cofusion_tpu.ops import preprocess as pp


@pytest.fixture(scope="module")
def fern_setup(small_cam):
    factor = 8
    cam_small = small_cam.at_level(3)  # 1/8 resolution
    db = fn.new_db(small_cam, num_ferns=200, capacity=32, factor=factor, seed=1)
    scene = SyntheticScene()

    def small_maps(T):
        rgb, depth, _ = scene.render(small_cam, T)
        rgb8 = jnp.asarray(rgb, jnp.float32)
        d = jnp.asarray(depth)
        # 3x half-res reductions ~ GPUResize 8x decimation
        for _ in range(3):
            rgb8 = (rgb8[0::2, 0::2] + rgb8[1::2, 0::2] + rgb8[0::2, 1::2] + rgb8[1::2, 1::2]) / 4.0
            d = d[0::2, 0::2]
        vm, va = pp.compute_vmap(d, cam_small, 10.0)
        nm, _ = pp.compute_nmap(vm, va)
        return rgb8, vm, nm

    return db, small_maps, cam_small


def test_add_and_reject_duplicate(fern_setup):
    db, small_maps, cam_small = fern_setup
    T = np.eye(4, dtype=np.float32)
    rgb, vm, nm = small_maps(T)
    db1, added = fn.add_frame(db, rgb, vm, nm, jnp.asarray(T), 0)
    assert bool(added)
    assert int(db1.count) == 1
    # same frame again: dissimilarity 0 -> rejected
    db2, added2 = fn.add_frame(db1, rgb, vm, nm, jnp.asarray(T), 1)
    assert not bool(added2)
    assert int(db2.count) == 1


def test_add_novel_views(fern_setup):
    db, small_maps, cam_small = fern_setup
    poses = camera_trajectory(4, kind="orbit", scale=14.0)  # big viewpoint changes
    count = 0
    for i, T in enumerate(poses):
        rgb, vm, nm = small_maps(T)
        db, added = fn.add_frame(db, rgb, vm, nm, jnp.asarray(T.astype(np.float32)), i)
        count += int(added)
    assert int(db.count) >= 2, int(db.count)


def test_find_frame_retrieves_right_keyframe(fern_setup):
    db, small_maps, cam_small = fern_setup
    posesA = np.eye(4, dtype=np.float32)
    posesB = camera_trajectory(2, kind="orbit", scale=16.0)[1].astype(np.float32)
    rgbA, vmA, nmA = small_maps(posesA)
    rgbB, vmB, nmB = small_maps(posesB)
    db, a1 = fn.add_frame(db, rgbA, vmA, nmA, jnp.asarray(posesA), 0)
    db, a2 = fn.add_frame(db, rgbB, vmB, nmB, jnp.asarray(posesB), 10)
    assert bool(a1) and bool(a2)
    # query with a view near A, long after both keyframes
    match = fn.find_frame(db, rgbA, vmA, time=1000, min_age=300)
    assert bool(match.found)
    assert int(match.keyframe) == 0
    np.testing.assert_allclose(np.asarray(match.fern_pose), posesA, atol=1e-6)
    # recent keyframes are excluded by the age gate
    match_young = fn.find_frame(db, rgbA, vmA, time=100, min_age=300)
    assert not bool(match_young.found)


def test_photometric_check_low_for_correct_pose(fern_setup):
    db, small_maps, cam_small = fern_setup
    T = np.eye(4, dtype=np.float32)
    rgb, vm, nm = small_maps(T)
    db, _ = fn.add_frame(db, rgb, vm, nm, jnp.asarray(T), 0)
    err_good = float(
        fn.photometric_check(db, vm, rgb, jnp.asarray(T), jnp.asarray(T), rgb, cam_small, 5.0)
    )
    T_bad = np.eye(4, dtype=np.float32)
    T_bad[0, 3] = 0.4
    err_bad = float(
        fn.photometric_check(
            db, vm, rgb, jnp.asarray(T_bad), jnp.asarray(T), rgb, cam_small, 5.0
        )
    )
    assert err_good < 10.0
    assert err_bad > err_good * 2, (err_good, err_bad)


def test_sample_constraints(fern_setup):
    db, small_maps, cam_small = fern_setup
    T = np.eye(4, dtype=np.float32)
    rgb, vm, nm = small_maps(T)
    T2 = np.eye(4, dtype=np.float32)
    T2[1, 3] = 0.25
    src, tgt, ok = fn.sample_constraints(db, vm, jnp.asarray(T), jnp.asarray(T2), 5.0)
    src, tgt, ok = np.asarray(src), np.asarray(tgt), np.asarray(ok)
    assert ok.sum() > 3
    np.testing.assert_allclose(
        tgt[ok] - src[ok], np.broadcast_to([0.0, 0.25, 0.0], (ok.sum(), 3)), atol=1e-5
    )


def test_eviction_when_full(fern_setup):
    """A full database must evict its least unique keyframe for a novel frame
    instead of silently dropping it (round-1 VERDICT item 10; the reference
    grows unboundedly, Ferns.cpp:72-142)."""
    db, small_maps, cam_small = fern_setup
    db = db._replace(
        codes=db.codes[:3], good_codes=db.good_codes[:3], poses=db.poses[:3],
        src_time=db.src_time[:3], rgb=db.rgb[:3], verts=db.verts[:3],
        norms=db.norms[:3],
    )  # capacity 3
    poses = camera_trajectory(6, kind="orbit", scale=40.0)
    added_times = []
    for i, T in enumerate(poses):
        rgb, vm, nm = small_maps(T)
        db, added = fn.add_frame(db, rgb, vm, nm, jnp.asarray(T.astype(np.float32)), i)
        if bool(added):
            added_times.append(i)
    assert int(db.count) == 3
    assert len(added_times) > 3, added_times  # overflow additions happened
    # the newest accepted keyframe must be present (eviction, not drop)
    assert added_times[-1] in np.asarray(db.src_time).tolist()
