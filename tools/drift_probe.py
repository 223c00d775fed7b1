"""Per-frame object-pose error probe (CPU): quantify the ~8 cm object drift
from test_multimodel and evaluate candidate fixes.  Run:
JAX_PLATFORMS=cpu python tools/drift_probe.py
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cofusion_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import make_sequence


def run(n=8, **eng_kw):
    cam = CameraConfig(width=160, height=128, fx=132.0, fy=132.0, cx=80.0, cy=64.0)
    cfg_kw = eng_kw.pop("cfg_kw", {})
    cfg = CoFusionConfig(camera=cam, max_models=3, max_surfels=1 << 16, **cfg_kw)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, model_spawn_offset=0,
            **eng_kw.pop("fp_kw", {}),
        ),
        enable_multi_model=True,
        **eng_kw,
    )
    frames, gt_cam, gt_obj = make_sequence(cam, n, kind="orbit", moving_object=True)
    for f in frames:
        engine.process_frame(f)
    log = engine.pose_log_for(1)
    spawn_i = 1
    O_s, C_s = gt_obj[spawn_i], gt_cam[spawn_i]
    errs = []
    for i in range(spawn_i, n):
        est_t = log[i][1][1][:3, 3]
        want = (gt_obj[i] @ np.linalg.inv(O_s) @ C_s)[:3, 3]
        errs.append(float(np.linalg.norm(est_t - want)))
    # camera error too (guard against regressions)
    cam_rmse = float(np.sqrt(np.mean([
        np.linalg.norm(log[i][1][0][:3, 3] - gt_cam[i][:3, 3]) ** 2 for i in range(n)
    ])))
    # object-map smear: surfel spread along the motion direction
    m1 = engine.download_model(1)
    return errs, cam_rmse, m1["pos"].std(axis=0)


def run_anchors(n=8, **eng_kw):
    cam = CameraConfig(width=160, height=128, fx=132.0, fy=132.0, cx=80.0, cy=64.0)
    cfg = CoFusionConfig(camera=cam, max_models=3, max_surfels=1 << 16)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, model_spawn_offset=0,
        ),
        enable_multi_model=True,
    )
    frames, gt_cam, gt_obj = make_sequence(cam, n, kind="orbit", moving_object=True)
    for f in frames:
        engine.process_frame(f)
    log = engine.pose_log_for(1)
    for spawn_i in (0, 1, 2):
        O_s, C_s = gt_obj[spawn_i], gt_cam[spawn_i]
        errs = []
        for i in range(2, n):
            est_t = log[i][1][1][:3, 3]
            want = (gt_obj[i] @ np.linalg.inv(O_s) @ C_s)[:3, 3]
            errs.append(float(np.linalg.norm(est_t - want)))
        print(f"anchor {spawn_i}: " + " ".join(f"{e:.4f}" for e in errs), flush=True)
    # also: fit the anchor to the FIRST tracked pose, then measure growth only
    return log, gt_cam, gt_obj


def run_vectors(n=8, **eng_kw):
    cam = CameraConfig(width=160, height=128, fx=132.0, fy=132.0, cx=80.0, cy=64.0)
    cfg = CoFusionConfig(camera=cam, max_models=3, max_surfels=1 << 16)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, model_spawn_offset=0,
            **eng_kw.pop("fp_kw", {}),
        ),
        enable_multi_model=True,
        **eng_kw,
    )
    frames, gt_cam, gt_obj = make_sequence(cam, n, kind="orbit", moving_object=True)
    for f in frames:
        engine.process_frame(f)
    log = engine.pose_log_for(1)
    spawn_i = 1
    O_s, C_s = gt_obj[spawn_i], gt_cam[spawn_i]
    print("frame   est_t                     want(i)        err    err_lag(i-1)")
    for i in range(spawn_i, n):
        est_t = log[i][1][1][:3, 3]
        want = (gt_obj[i] @ np.linalg.inv(O_s) @ C_s)[:3, 3]
        want_lag = (gt_obj[max(i - 1, spawn_i)] @ np.linalg.inv(O_s) @ C_s)[:3, 3]
        d = est_t - want
        print(
            f"{i}: est={est_t} want={want} derr={d} |e|={np.linalg.norm(d):.4f} "
            f"|e_lag|={np.linalg.norm(est_t - want_lag):.4f}",
            flush=True,
        )
    # rotation error too
    for i in range(spawn_i, n):
        est_R = log[i][1][1][:3, :3]
        want_R = (gt_obj[i] @ np.linalg.inv(O_s) @ C_s)[:3, :3]
        ang = np.degrees(np.arccos(np.clip((np.trace(est_R.T @ want_R) - 1) / 2, -1, 1)))
        print(f"rot {i}: {ang:.3f} deg", flush=True)


if __name__ == "__main__":
    import sys
    if "--vectors" in sys.argv:
        run_vectors()
    else:
        errs, cam_rmse, spread = run()
        print("default per-frame obj err:", [f"{e:.4f}" for e in errs])
        print(f"final={errs[-1]:.4f} cam_rmse={cam_rmse:.5f} spread={spread}")
        run_anchors()
