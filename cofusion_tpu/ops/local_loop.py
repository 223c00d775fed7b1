"""Model-to-model odometry + local loop closure — the reference's
`CoFusion::processFrame` local-loop block (Core/CoFusion.cpp:387-459):

  1. render the global model's INACTIVE (old) surfels into the current view
     (`combinedPredict(..., INACTIVE)`, CoFusion.cpp:390);
  2. run RGB-D odometry between the ACTIVE splat prediction (current geometry)
     and the INACTIVE one (old geometry) — `modelToModel` odometry, no SO(3)
     pre-alignment (CoFusion.cpp:394-405);
  3. gate on the odometry covariance diagonal, inlier count and residual
     (CoFusion.cpp:407-423; thresholds = the `-cv`/`-ic`/`-ie` flags);
  4. sample surface constraints from the 20x-downsampled splat vertices where
     the old view has geometry (CoFusion.cpp:424-443) for the deformation graph.

Constraint poses: the reference release contains a copy-paste slip — both
`worldRawPoint` and `worldModelPoint` are built with the SAME pose
(CoFusion.cpp:429-436; the whole block is behind `assert(0)` at :447 so it was
never exercised).  ElasticFusion's live version of this code uses
currPose for the source and estPose for the target, which is what we implement:
the deformation pulls the current geometry toward its loop-corrected position.

TPU design: the whole loop is compiled into the frame step when the close-loops
flag is on.  The odometry always runs (it is the detector); the expensive
deformation solve is wrapped in `lax.cond` by the caller so it only executes on
accepted matches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cofusion_tpu.config import CameraConfig, CoFusionConfig, TrackingParams
from cofusion_tpu.ops import odometry as od
from cofusion_tpu.ops import preprocess as pp
from cofusion_tpu.ops import rasterize as rz


class LocalLoopResult(NamedTuple):
    est_pose: jnp.ndarray    # (4, 4) loop-corrected global pose
    accepted: jnp.ndarray    # () bool — covariance/inlier/residual gates passed
    icp_error: jnp.ndarray   # () residual of the model-to-model solve
    icp_count: jnp.ndarray   # () inlier count
    src: jnp.ndarray         # (C, 3) constraint sources (world, current pose)
    tgt: jnp.ndarray         # (C, 3) constraint targets (world, est pose)
    cons_valid: jnp.ndarray  # (C,) bool
    num_constraints: jnp.ndarray  # () int32


def local_loop(
    old: rz.SplatMap,
    pose: jnp.ndarray,
    splat_active: rz.SplatMap,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    tparams: TrackingParams,
    time,
    time_delta,
    depth_cutoff,
    conf_threshold,
    cov_thresh,
    icp_err_thresh,
    icp_count_thresh,
) -> LocalLoopResult:
    """One local-loop attempt for the global model.  `splat_active` must be the
    ACTIVE prediction rendered at the post-tracking `pose` (the reference calls
    predict() right before this block, CoFusion.cpp:347); `old` the INACTIVE
    prediction (surfels outside the active time window — with the two-tier
    store, the caller renders it from the stable tier and z-merges any
    aged-but-not-yet-expelled active surfels)."""
    # 2. model-to-model odometry: frame side = ACTIVE prediction, model side =
    #    INACTIVE prediction (initICP splat variant + initICPModel old textures,
    #    CoFusion.cpp:394-400); so3 disabled (CoFusion.cpp:405 passes so3=false)
    # no GN stride: the covariance/inlier-count gates are absolute thresholds
    # calibrated for full-resolution correspondence counts
    loop_cfg = cfg.replace(use_so3=False, gn_stride_l0=1)
    frame_pyr = od.build_frame_pyramid_from_maps(
        splat_active.vert_conf[..., :3],
        splat_active.normal_rad[..., :3],
        splat_active.valid,
        pp.rgb_to_intensity(splat_active.image),
        cam, loop_cfg, tparams.max_depth_rgb,
    )
    model_pyr = od.build_model_pyramid(
        old.vert_conf[..., :3], old.normal_rad[..., :3], old.valid,
        pp.rgb_to_intensity(old.image), pose, cam, loop_cfg, tparams.max_depth_rgb,
    )
    res = od.get_incremental_transformation(
        pose, frame_pyr, model_pyr, frame_pyr.intensity[cfg.pyramid_levels - 1],
        cam, loop_cfg, tparams,
    )

    # 3. gates (CoFusion.cpp:407-423): covariance = diag(A^-1)
    cov = jnp.diag(jnp.linalg.inv(res.A + 1e-12 * jnp.eye(6)))
    cov_ok = jnp.all(cov < cov_thresh) & jnp.all(jnp.isfinite(cov))
    accepted = (
        cov_ok
        & (res.icp_count > icp_count_thresh)
        & (res.icp_error < icp_err_thresh)
    )

    # 4. constraints from the `cons_sample`-strided splat vertices where the OLD
    #    view has surfels (consBuff/timesBuff resample, CoFusion.cpp:424-443)
    s = cfg.cons_sample
    sv = splat_active.vert_conf[::s, ::s, :3].reshape(-1, 3)
    # the reference gates on timesBuff > 0 as a "the old view rendered here"
    # proxy (CoFusion.cpp:432); our SplatMap carries an explicit validity mask
    ov = old.valid[::s, ::s].reshape(-1)
    cons_valid = (sv[:, 2] > 0) & (sv[:, 2] < depth_cutoff) & ov
    src = sv @ pose[:3, :3].T + pose[:3, 3]
    tgt = sv @ res.pose[:3, :3].T + res.pose[:3, 3]

    return LocalLoopResult(
        est_pose=res.pose,
        accepted=accepted,
        icp_error=res.icp_error,
        icp_count=res.icp_count,
        src=src,
        tgt=tgt,
        cons_valid=cons_valid,
        num_constraints=jnp.sum(cons_valid.astype(jnp.int32)),
    )
