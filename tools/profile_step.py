"""Per-stage device timing of the engine's frame step on real TPU hardware.

The whole frame is ONE jit (engine._step), so Stopwatch can't attribute cost
inside it (VERDICT r2 weak #9).  This tool jits each stage separately with the
bench workload's real shapes/state and times them with readback drains,
printing a ms-per-stage table.  Run: python tools/profile_step.py [--stages a,b]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams, TrackingParams
from cofusion_tpu.engine import CoFusion, _fuse_clean_all, _fusion_weight
from cofusion_tpu.ops import fusion as fu
from cofusion_tpu.ops import odometry as od
from cofusion_tpu.ops import preprocess as pp
from cofusion_tpu.ops import rasterize as rz
from cofusion_tpu.ops import segmentation as sg


def drain(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[:1] if hasattr(leaf, "ravel") else leaf)


def timeit(name, fn, *args, reps=10):
    out = fn(*args)  # compile
    drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{name:42s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="all")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    want = args.stages.split(",")

    def on(s):
        return "all" in want or s in want

    from bench import make_multi_object_frames

    cam = CameraConfig()
    max_surfels = int(os.environ.get("BENCH_SURFELS", 1 << 22))
    M = int(os.environ.get("BENCH_MODELS", 4))
    cfg = CoFusionConfig(camera=cam, max_models=M, max_surfels=max_surfels)
    tparams = TrackingParams()
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, confidence_global=1.5,
            model_spawn_offset=4, model_deactivate_count=3,
        ),
        enable_multi_model=True,
    )
    frames = make_multi_object_frames(cam, 12)
    print("[profile] warming up engine state (9 frames)...", flush=True)
    for i in range(9):
        engine.process_frame(frames[i % 12])
    np.asarray(engine.state.models.pose)
    print("[profile] state ready; active:", np.asarray(engine.state.models.active).tolist(), flush=True)

    state = engine.state
    models = state.models
    # force every slot live so lax.cond-gated fuse/clean paths time the
    # worst case (the bench workload runs bg + 3 objects; a short warmup may
    # not have spawned them yet) — timings are shape-static, content-free
    models = models._replace(active=jnp.ones((M,), bool))
    state = state._replace(models=models)
    f = frames[9]
    rgb = jnp.asarray(f["rgb"], jnp.float32)
    depth = jnp.asarray(f["depth"], jnp.float32)
    mask = jnp.zeros(cam.shape, jnp.int32)
    fparams = engine._make_fparams(1.0, -1, True, None, None)
    td = fparams["time_delta"]
    dc = jnp.full((M,), 4.5)
    reps = args.reps

    total = {}

    if on("full"):
        import functools

        from cofusion_tpu.engine import _step

        step = jax.jit(
            functools.partial(
                _step, cam=cam, cfg=cfg, tparams=tparams,
                sparams=engine.segmentation, use_crf=True, use_reloc=False,
                use_gt_pose=False, close_loops=False,
            )
        )  # NO donation: the profiler reuses the same state every rep
        total["full_step"] = timeit(
            "FULL _step (crf)",
            lambda: step(state, rgb, depth, mask, fparams)[1],
            reps=max(3, reps // 2),
        )

    if on("preprocess"):
        fn = jax.jit(lambda d: pp.bilateral_filter(d, jnp.float32(4.5)))
        total["bilateral"] = timeit("bilateral_filter", fn, depth, reps=reps)

    if on("pindex"):
        fn = jax.jit(
            lambda st, p: rz.predict_indices_b(
                st, p, cam, state.tick, td, dc, models.conf_threshold
            )
        )
        total["predict_indices_b"] = timeit(
            "predict_indices_b (4 models)", fn, models.store, models.pose, reps=reps
        )

    if on("splat"):
        fn = jax.jit(
            lambda st, p: rz.splat_predict_b(
                st, p, cam, cfg, state.tick, td, dc, models.conf_threshold
            )
        )
        total["splat_predict_b"] = timeit(
            "splat_predict_b (idx + window, 4 models)", fn, models.store, models.pose, reps=reps
        )

    if on("splatwin"):
        imap = rz.predict_indices_b(
            models.store, models.pose, cam, state.tick, td, dc, models.conf_threshold
        )
        imap = jax.tree.map(lambda a: a, imap)
        # batched form, NOT vmap: the engine never vmaps splat_from_imap (it
        # folds the model axis into flat indices), and vmapping the Pallas
        # window kernel fails to lower (batched block spec in ANY memory space)
        fn = jax.jit(lambda im: rz.splat_from_imap(im, cam, cfg))
        total["splat_window_only"] = timeit(
            "splat_from_imap window (batched 4)", fn, imap, reps=reps
        )

    if on("track"):
        intensity = pp.rgb_to_intensity(rgb)
        filtered = pp.bilateral_filter(depth, fparams["depth_cutoff"])
        splat = rz.splat_predict_b(
            models.store, models.pose, cam, cfg, state.tick, td, dc, models.conf_threshold
        )
        pred_vert = splat.vert_conf[..., :3]
        pred_norm = splat.normal_rad[..., :3]
        pred_valid = splat.valid
        pred_image = splat.image
        operands = (filtered, intensity, state.prev_mask, pred_vert, pred_norm,
                    pred_valid, pred_image, models.pose, state.so3_ref)
        operands = jax.tree.map(jnp.asarray, operands)

        def track_all(filtered, intensity, prev_mask, pv, pn, pok, pim, poses, so3_ref):
            frame_pyr = od.build_frame_pyramid(
                filtered, intensity, None, 0, cam, cfg, fparams["depth_cutoff"],
                tparams.max_depth_rgb,
            )
            mask_pyrs = [prev_mask]
            for _ in range(cfg.pyramid_levels - 1):
                mask_pyrs.append(pp.pyr_down_nearest(mask_pyrs[-1]))
            outs = []
            for m in range(M):
                fp = od.with_model_mask(frame_pyr, mask_pyrs, models.model_id[m])
                mpyr = od.build_model_pyramid(
                    pv[m], pn[m], pok[m], pp.rgb_to_intensity(pim[m]), poses[m],
                    cam, cfg, tparams.max_depth_rgb,
                )
                r = od.get_incremental_transformation(
                    poses[m], fp, mpyr, so3_ref, cam, cfg, tparams
                )
                outs.append(r.pose)
            return jnp.stack(outs)

        fn = jax.jit(track_all)
        total["track_4models"] = timeit("track (pyr+GN x4, no err map)", fn, *operands, reps=reps)

        def track_batched(filtered, intensity, prev_mask, pv, pn, pok, pim, poses, so3_ref):
            frame_pyr = od.build_frame_pyramid(
                filtered, intensity, None, 0, cam, cfg, fparams["depth_cutoff"],
                tparams.max_depth_rgb,
            )
            mask_pyrs = [prev_mask]
            for _ in range(cfg.pyramid_levels - 1):
                mask_pyrs.append(pp.pyr_down_nearest(mask_pyrs[-1]))
            bounds = od.mask_window_bounds(mask_pyrs)
            mpyr_b = jax.vmap(
                lambda vert, norm, ok, image, pose_m: od.build_model_pyramid(
                    vert, norm, ok, pp.rgb_to_intensity(image), pose_m, cam, cfg,
                    tparams.max_depth_rgb,
                )
            )(pv, pn, pok, pim, poses)
            ids3 = models.model_id[:, None, None]
            valid_b = tuple(
                frame_pyr.valid[l][None] & (mask_pyrs[l][None] == ids3)
                for l in range(cfg.pyramid_levels)
            )
            rgb_ok_b = tuple(
                frame_pyr.rgb_ok[l][None]
                & (bounds[l][0][None] == ids3) & (bounds[l][1][None] == ids3)
                for l in range(cfg.pyramid_levels)
            )
            r = od.track_models(
                poses, frame_pyr, valid_b, rgb_ok_b, mpyr_b, so3_ref, cam, cfg, tparams
            )
            e = od.icp_error_maps_b(
                r.pose, poses, frame_pyr.vmap[0], frame_pyr.nmap[0],
                frame_pyr.valid[0], mpyr_b, cam, tparams, stride=cfg.gn_stride_l0,
            )
            return r.pose, e

        fnb = jax.jit(track_batched)
        total["track_batched"] = timeit(
            "track_models batched (pyr+GN+err, all M)", fnb, *operands, reps=reps
        )

        def track_one(filtered, intensity, prev_mask, pv, pn, pok, pim, poses, so3_ref):
            frame_pyr = od.build_frame_pyramid(
                filtered, intensity, None, 0, cam, cfg, fparams["depth_cutoff"],
                tparams.max_depth_rgb,
            )
            mpyr = od.build_model_pyramid(
                pv[0], pn[0], pok[0], pp.rgb_to_intensity(pim[0]), poses[0],
                cam, cfg, tparams.max_depth_rgb,
            )
            r = od.get_incremental_transformation(
                poses[0], frame_pyr, mpyr, so3_ref, cam, cfg, tparams
            )
            return r.pose
        fn1 = jax.jit(track_one)
        total["track_1model"] = timeit("track (pyr+GN x1, unmasked)", fn1, *operands, reps=reps)

        def err_maps(filtered, intensity, prev_mask, pv, pn, pok, pim, poses, so3_ref):
            frame_pyr = od.build_frame_pyramid(
                filtered, intensity, None, 0, cam, cfg, fparams["depth_cutoff"],
                tparams.max_depth_rgb,
            )
            outs = []
            for m in range(M):
                mpyr = od.build_model_pyramid(
                    pv[m], pn[m], pok[m], pp.rgb_to_intensity(pim[m]), poses[m],
                    cam, cfg, tparams.max_depth_rgb,
                )
                e = od.icp_error_map_ungated(
                    poses[m], poses[m], frame_pyr.vmap[0], frame_pyr.nmap[0],
                    frame_pyr.valid[0], mpyr, cam, tparams,
                )
                outs.append(e)
            return jnp.stack(outs)
        fn2 = jax.jit(err_maps)
        total["icp_err_maps"] = timeit("icp_error_map_ungated x4 (incl pyr)", fn2, *operands, reps=reps)

    if on("seg"):
        err_maps_in = jnp.asarray(state.icp_error_maps)
        conf_proj = jnp.zeros((M,) + cam.shape, jnp.float32)
        fn = jax.jit(
            lambda r, d, e, c: sg.perform_segmentation_crf(
                r, d, e, c, models.active, jnp.int32(3), jnp.bool_(False),
                cam, cfg, engine.segmentation,
            ).full_segmentation
        )
        total["segmentation_crf"] = timeit(
            "perform_segmentation_crf", fn, rgb, depth, err_maps_in, conf_proj, reps=reps
        )
        fn2 = jax.jit(lambda r: sg.slic_assign(r, cfg))
        total["slic"] = timeit("slic_assign only", fn2, rgb, reps=reps)

    if on("fuse"):
        filtered = pp.bilateral_filter(depth, fparams["depth_cutoff"])
        weight = jax.vmap(_fusion_weight)(
            models.pose, models.prev_pose, jnp.full((M,), 1.0)
        )
        operands = jax.tree.map(
            jnp.asarray,
            (models.store, models.stable, models.pose, weight, depth, filtered, rgb, mask),
        )

        def fuse_clean(stores, stables, poses, w, depth, filtered, rgb, mask):
            return _fuse_clean_all(
                stores, stables, poses, w, models.model_id,
                models.conf_threshold, models.active, dc, depth, filtered,
                rgb, mask, True, cam, cfg, state.tick, fparams,
            )[0].count
        fn = jax.jit(fuse_clean)
        total["fuse_clean_all"] = timeit("fuse+clean+expel (4 models)", fn, *operands, reps=reps)

        store0 = jax.tree.map(lambda a: jnp.asarray(a[0]), models.store)
        pose0 = jnp.asarray(models.pose[0])

        def fuse_one(store, pose, depth, filtered, rgb, mask):
            fs = fu.make_frame_surfels(depth, filtered, rgb, cam, 1.0, 4.5)
            imap = rz.predict_indices(store, pose, cam, state.tick, td, 4.5)
            fused = fu.fuse(store, fs, depth, imap, mask == 0, pose, cam, cfg, state.tick, 4.5)
            return fused.count
        fn1 = jax.jit(fuse_one)
        total["fuse_1model"] = timeit("pidx+fuse (1 model)", fn1, store0, pose0, depth, filtered, rgb, mask, reps=reps)

        def clean_one(store, pose, depth, filtered, rgb, mask):
            imap = rz.predict_indices(store, pose, cam, state.tick, td, 4.5)
            cleaned, keep = fu.clean_eval(
                store, imap, filtered, mask, 0, pose, cam, cfg,
                state.tick, td, models.conf_threshold[0], fparams["outlier_coeff"],
            )
            import cofusion_tpu.models.surfel_model as sm
            aged = (cleaned.last_time > 0) & ((state.tick.astype(jnp.float32) - cleaned.last_time) > td.astype(jnp.float32))
            st, blk = sm.expel_split(cleaned, keep, aged, cfg.expel_block)
            return st.count
        fn2 = jax.jit(clean_one)
        total["clean_1model"] = timeit("pidx+clean+expel (1 model)", fn2, store0, pose0, depth, filtered, rgb, mask, reps=reps)

    print("\n--- summary (ms) ---")
    for k, v in sorted(total.items(), key=lambda kv: -kv[1]):
        print(f"{k:30s} {v:9.2f}")


if __name__ == "__main__":
    main()
