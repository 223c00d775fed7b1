"""Odometry integration tests on synthetic frames with known ground-truth motion.

Strategy (SURVEY.md §4): no reference test suite exists; we validate the tracker by
construction — render frame A at identity, frame B at a known small transform, feed
B's pyramids as the "current frame" and A's geometry as the "model prediction", and
require the recovered pose to match the ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from cofusion_tpu.config import CoFusionConfig, TrackingParams
from cofusion_tpu.io.synthetic import SyntheticScene
from cofusion_tpu.ops import odometry as od
from cofusion_tpu.ops import preprocess as pp


def _render(scene, cam, T):
    rgb, depth, mask = scene.render(cam, T)
    return {
        "rgb": rgb,
        "depth": jnp.asarray(depth),
        "intensity": pp.rgb_to_intensity(jnp.asarray(rgb)),
        "mask": mask,
    }


def _pose(rotvec, trans):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Rotation.from_rotvec(rotvec).as_matrix()
    T[:3, 3] = trans
    return T


def _track(cam, T_prev, T_curr, cfg=None, params=None):
    """Render prev/current frames, build pyramids, run the tracker starting at
    T_prev; returns the recovered current pose."""
    scene = SyntheticScene()
    cfg = cfg or CoFusionConfig(camera=cam)
    params = params or TrackingParams()
    prev = _render(scene, cam, T_prev)
    curr = _render(scene, cam, T_curr)

    depth_prev = pp.bilateral_filter(prev["depth"], 5.0)
    depth_curr = pp.bilateral_filter(curr["depth"], 5.0)

    frame = od.build_frame_pyramid(depth_curr, curr["intensity"], None, 0, cam, cfg, 5.0)
    # "model prediction" = previous frame geometry in its own camera frame
    pv, pvalid = pp.compute_vmap(depth_prev, cam, 5.0)
    pn, pnok = pp.compute_nmap(pv, pvalid)
    model = od.build_model_pyramid(
        pv, pn, pvalid & pnok, prev["intensity"], jnp.asarray(T_prev), cam, cfg
    )
    so3_ref = frame_so3_ref(prev["intensity"], cfg)
    res = od.get_incremental_transformation(
        jnp.asarray(T_prev), frame, model, so3_ref, cam, cfg, params
    )
    return np.asarray(res.pose), res


def frame_so3_ref(intensity, cfg):
    img = intensity
    for _ in range(cfg.pyramid_levels - 1):
        img = pp.pyr_down_gauss(img)
    return img


def _pose_error(T_est, T_gt):
    d = np.linalg.inv(T_gt) @ T_est
    trans_err = np.linalg.norm(d[:3, 3])
    rot_err = np.linalg.norm(Rotation.from_matrix(d[:3, :3]).as_rotvec())
    return trans_err, rot_err


def test_identity_motion(small_cam):
    T = np.eye(4, dtype=np.float32)
    pose, res = _track(small_cam, T, T)
    trans_err, rot_err = _pose_error(pose, T)
    assert trans_err < 2e-3, trans_err
    assert rot_err < 2e-3, rot_err
    assert float(res.icp_count) > 1000


@pytest.mark.parametrize(
    "rotvec,trans",
    [
        ((0.0, 0.0, 0.0), (0.02, 0.0, 0.0)),
        ((0.0, 0.0, 0.0), (0.0, 0.015, -0.02)),
        ((0.0, 0.02, 0.0), (0.0, 0.0, 0.0)),
        ((0.01, -0.015, 0.008), (0.015, -0.01, 0.01)),
    ],
)
def test_recovers_known_motion(small_cam, rotvec, trans):
    T_prev = np.eye(4, dtype=np.float32)
    T_curr = _pose(rotvec, trans)
    pose, res = _track(small_cam, T_prev, T_curr)
    trans_err, rot_err = _pose_error(pose, T_curr)
    assert trans_err < 4e-3, (trans_err, rot_err)
    assert rot_err < 4e-3, (trans_err, rot_err)


def test_tracking_from_offset_start(small_cam):
    """Start pose != identity: the tracker works in world frame."""
    T_prev = _pose((0.05, 0.1, -0.02), (0.3, -0.1, 0.2))
    delta = _pose((0.0, 0.015, 0.0), (0.02, 0.0, -0.01))
    T_curr = (T_prev @ delta).astype(np.float32)
    pose, _ = _track(small_cam, T_prev, T_curr)
    trans_err, rot_err = _pose_error(pose, T_curr)
    assert trans_err < 5e-3, (trans_err, rot_err)
    assert rot_err < 5e-3, (trans_err, rot_err)


def test_icp_only_tracking(small_cam):
    params = TrackingParams(icp_weight=100.0)  # icpWeight >= 100 disables RGB
    T_prev = np.eye(4, dtype=np.float32)
    T_curr = _pose((0.0, 0.01, 0.0), (0.015, 0.0, 0.0))
    pose, res = _track(small_cam, T_prev, T_curr, params=params)
    trans_err, rot_err = _pose_error(pose, T_curr)
    assert float(res.rgb_count) == 0
    assert trans_err < 5e-3
    assert rot_err < 5e-3
