"""Batched-model-axis tracker (od.track_models) must reproduce the unrolled
per-model solver exactly: same math, same iteration schedule, the model axis
folded into every pass (gathers flat-indexed, reductions one batched MXU
dot_general).  Reference: Core/Utils/RGBDOdometry.cpp — one RGBDOdometry per
model, identical code per model."""

import jax
import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig, TrackingParams
from cofusion_tpu.io.synthetic import make_sequence
from cofusion_tpu.ops import odometry as od
from cofusion_tpu.ops import preprocess as pp


def _setup(cam, cfg, tparams, M=3):
    frames, gt, _ = make_sequence(cam, 2, kind="orbit")
    d0 = pp.bilateral_filter(jnp.asarray(frames[0]["depth"]), 4.5)
    d1 = pp.bilateral_filter(jnp.asarray(frames[1]["depth"]), 4.5)
    i0 = pp.rgb_to_intensity(jnp.asarray(frames[0]["rgb"], jnp.float32))
    i1 = pp.rgb_to_intensity(jnp.asarray(frames[1]["rgb"], jnp.float32))

    frame_pyr = od.build_frame_pyramid(
        d1, i1, None, 0, cam, cfg, 4.5, tparams.max_depth_rgb
    )

    # model prediction = frame 0 back-projected (camera frame), per-model poses
    # slightly perturbed so each solve follows a different path
    vm, va = pp.compute_vmap(d0, cam, 4.5)
    nm, na = pp.compute_nmap(vm, va)
    valid = va & na
    rng = np.random.default_rng(3)
    poses = []
    for m in range(M):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = rng.normal(0, 0.002, 3)
        poses.append(T)
    poses = jnp.asarray(np.stack(poses))

    mpyrs = [
        od.build_model_pyramid(vm, nm, valid, i0, poses[m], cam, cfg, tparams.max_depth_rgb)
        for m in range(M)
    ]
    mpyr_b = jax.tree.map(lambda *xs: jnp.stack(xs), *mpyrs)

    # a blocky random mask (ids 0..M-1) exercises the per-model gating
    blocks = rng.integers(0, M, (cam.height // 8, cam.width // 8))
    mask = jnp.asarray(np.kron(blocks, np.ones((8, 8), np.int32)), jnp.int32)
    mask_pyrs = [mask]
    for _ in range(cfg.pyramid_levels - 1):
        mask_pyrs.append(pp.pyr_down_nearest(mask_pyrs[-1]))
    bounds = od.mask_window_bounds(mask_pyrs)

    so3_ref = i0
    for _ in range(cfg.pyramid_levels - 1):
        so3_ref = pp.pyr_down_gauss(so3_ref)
    return frame_pyr, mask_pyrs, bounds, mpyr_b, mpyrs, poses, so3_ref


def test_track_models_matches_unrolled():
    cam = CameraConfig(width=80, height=64, fx=70.0, fy=70.0, cx=40.0, cy=32.0)
    cfg = CoFusionConfig(camera=cam, max_models=3, max_surfels=1 << 12)
    tparams = TrackingParams()
    M = 3
    frame_pyr, mask_pyrs, bounds, mpyr_b, mpyrs, poses, so3_ref = _setup(
        cam, cfg, tparams, M
    )

    ref = []
    for m in range(M):
        fp = od.with_model_mask(frame_pyr, mask_pyrs, m, bounds=bounds)
        ref.append(
            od.get_incremental_transformation(
                poses[m], fp, mpyrs[m], so3_ref, cam, cfg, tparams
            )
        )
    ref = jax.tree.map(lambda *xs: jnp.stack(xs), *ref)

    ids = jnp.arange(M, dtype=jnp.int32)[:, None, None]
    valid_b = tuple(
        frame_pyr.valid[l][None] & (mask_pyrs[l][None] == ids)
        for l in range(cfg.pyramid_levels)
    )
    rgb_ok_b = tuple(
        frame_pyr.rgb_ok[l][None]
        & (bounds[l][0][None] == ids)
        & (bounds[l][1][None] == ids)
        for l in range(cfg.pyramid_levels)
    )
    out = od.track_models(
        poses, frame_pyr, valid_b, rgb_ok_b, mpyr_b, so3_ref, cam, cfg, tparams
    )

    np.testing.assert_allclose(
        np.asarray(out.pose), np.asarray(ref.pose), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.icp_count), np.asarray(ref.icp_count), atol=2
    )
    np.testing.assert_allclose(
        np.asarray(out.rgb_count), np.asarray(ref.rgb_count), atol=2
    )
    np.testing.assert_allclose(
        np.asarray(out.icp_error), np.asarray(ref.icp_error), rtol=1e-3, atol=1e-5
    )


def test_icp_error_maps_b_matches_unrolled():
    cam = CameraConfig(width=80, height=64, fx=70.0, fy=70.0, cx=40.0, cy=32.0)
    cfg = CoFusionConfig(camera=cam, max_models=3, max_surfels=1 << 12)
    tparams = TrackingParams()
    M = 3
    frame_pyr, _, _, mpyr_b, mpyrs, poses, _ = _setup(cam, cfg, tparams, M)

    ref = jnp.stack(
        [
            od.icp_error_map_ungated(
                poses[m], poses[m], frame_pyr.vmap[0], frame_pyr.nmap[0],
                frame_pyr.valid[0], mpyrs[m], cam, tparams, stride=cfg.gn_stride_l0,
            )
            for m in range(M)
        ]
    )
    out = od.icp_error_maps_b(
        poses, poses, frame_pyr.vmap[0], frame_pyr.nmap[0], frame_pyr.valid[0],
        mpyr_b, cam, tparams, stride=cfg.gn_stride_l0,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
