"""Command-line entry point — the reference's MainController
(GUI/Main.cpp + GUI/MainController.cpp:94-509) rebuilt headless for the TPU host.

Honors the reference's flag names (flag list documented at
GUI/MainController.cpp:31-92; BASELINE.json requires at least
-run, -static, -l, -dir, -maskdir, -es, -ep, -em, -confO, -confG).  Flags are
single-dash, reference-style (`-dir path`), parsed permissively; GUI-only flags
are accepted and ignored (headless — an explicit non-goal, SURVEY.md §7).

Usage:
    python -m cofusion_tpu -l log.klg -static -ep -exportdir out/
    python -m cofusion_tpu -dir dataset/ -maskdir dataset/ -run -es -exportdir out/
"""

from __future__ import annotations

import os
import sys

# persistent XLA compilation cache: the engine's fused per-frame program is large;
# caching makes every run after the first start in seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams, TrackingParams
from cofusion_tpu.io import readers
from cofusion_tpu.utils import export
from cofusion_tpu.utils.stopwatch import Stopwatch


class Parse:
    """argv scanner in the style of the reference's Parse singleton
    (Core/Utils/Parse.h:31-52): `-flag value` and boolean `-flag`."""

    def __init__(self, argv: list[str]):
        self.argv = argv

    def arg(self, flag: str, default=None):
        if flag in self.argv:
            i = self.argv.index(flag)
            if i + 1 < len(self.argv):
                nxt = self.argv[i + 1]
                # a token starting with '-' is the next flag UNLESS it parses as
                # a number (negative / signed-exponent values, e.g. `-or -3`)
                if not nxt.startswith("-") or _is_number(nxt):
                    return nxt
        return default

    def float_arg(self, flag: str, default: float) -> float:
        v = self.arg(flag)
        return float(v) if v is not None else default

    def int_arg(self, flag: str, default: int) -> int:
        v = self.arg(flag)
        return int(v) if v is not None else default

    def flag(self, flag: str) -> bool:
        return flag in self.argv


def _is_number(token: str) -> bool:
    try:
        float(token)
        return True
    except ValueError:
        return False


def build_from_args(argv: list[str]):
    """Construct (reader, engine, options) from reference-style argv."""
    from cofusion_tpu.engine import CoFusion

    p = Parse(argv)
    base = p.arg("-basedir", "")

    def rel(path):
        return os.path.join(base, path) if path and base else path

    width, height = 640, 480
    fx, fy, cx, cy = 528.0, 528.0, 320.0, 240.0  # MainController.cpp:108-110

    # an explicit -cal is loaded BEFORE reader construction (the reference sets
    # Resolution from it first, MainController.cpp:105-115 — the klg reader
    # needs the true dimensions)
    cal_explicit = rel(p.arg("-cal"))
    if cal_explicit:
        fx, fy, cx, cy, w2, h2 = readers.load_calibration(cal_explicit)
        if w2 and h2:
            width, height = w2, h2

    log = rel(p.arg("-l"))
    directory = rel(p.arg("-dir"))
    mask_dir = rel(p.arg("-maskdir")) or directory
    depth_dir = rel(p.arg("-depthdir"))

    # -nm: without a value = ignore masks entirely; with a value N = stop
    # providing masks from frame N on (MainController.cpp:150-156)
    max_masks = None
    if p.flag("-nm"):
        max_masks = p.int_arg("-nm", 0)

    reader: readers.LogReader
    if log:
        reader = readers.KlgLogReader(log, width, height)
    elif directory:
        reader = readers.ImageLogReader(
            directory,
            mask_directory=mask_dir if (p.arg("-maskdir") or _has_masks(mask_dir)) else None,
            depth_directory=depth_dir,
            color_prefix=p.arg("-colorprefix"),
            depth_prefix=p.arg("-depthprefix"),
            mask_prefix=p.arg("-maskprefix"),
            max_masks=max_masks,
            index_width=p.int_arg("-indexW", 0) or None,
            # 16-bit PNG depth scale; the reference hard-codes x0.0006 for the
            # car4/room4 Blender datasets (ImageLogReader.cpp:260).  Extension
            # flag: '-pngScale 0.001' for mm-encoded PNG depth.
            png_depth_scale=p.float_arg("-pngScale", 0.0006),
        )
    else:
        raise SystemExit("need -l <log.klg> or -dir <dataset dir>")

    if not cal_explicit and directory:
        cal = reader.calibration_file()
        if cal:
            fx, fy, cx, cy, w2, h2 = readers.load_calibration(cal)
            if w2 and h2:
                width, height = w2, h2

    cam = CameraConfig(width=width, height=height, fx=fx, fy=fy, cx=cx, cy=cy)
    static = p.flag("-static")
    # '-o' open-loop mode (MainController.cpp:202 hardwires openLoop=true with
    # a FIXME; the documented flag's effect is MainController.cpp:328-329:
    # timeDelta -> INT_MAX/2, i.e. no time-window aging, and closeLoops=false).
    open_loop = p.flag("-o")
    from cofusion_tpu.config import CoFusionConfig as _Cfg

    cfg = CoFusionConfig(
        camera=cam,
        max_models=1 if static else 4,
        fast_odom=p.flag("-fo"),
        use_so3=not p.flag("-nso"),
        time_delta=(1 << 30) if open_loop else p.int_arg("-t", 200),
        # '-ns': per-model surfel capacity — the runtime analogue of the
        # reference's compile-time COFUSION_NUM_SURFELS (Model.cpp:92-98)
        max_surfels=p.int_arg("-ns", _Cfg.max_surfels),
    )
    tracking = TrackingParams(
        icp_weight=p.float_arg("-i", 10.0),
        rgb_only=False,
    )
    fusion = FusionParams(
        depth_cutoff=p.float_arg("-d", 5.0),
        confidence_object=p.float_arg("-confO", 0.01),
        confidence_global=p.float_arg("-confG", 10.0),
        model_spawn_offset=p.int_arg("-offset", 22),
        # fed directly into the free-space decay 1/(1+coeff*avgViolation) and the
        # mask-mismatch penalty 0.5+0.5*(1-coeff/10), like the reference's -or
        # value reaching copy_unstable.vert:140-149 unscaled
        outlier_coefficient=p.float_arg("-or", 3.0),
        local_loop_err_thresh=p.float_arg("-ie", 5e-5),
        local_loop_count_thresh=p.float_arg("-ic", 40000.0),
        local_loop_cov_thresh=p.float_arg("-cv", 1e-5),
        fern_photo_thresh=p.float_arg("-pt", 115.0),
        fern_thresh=p.float_arg("-ft", 0.3095),
    )
    engine = CoFusion(
        cfg,
        tracking=tracking,
        fusion_params=fusion,
        enable_multi_model=not static,
        enable_relocalization=p.flag("-rl"),
        # the reference forces openLoop=true (MainController.cpp:203 FIXME), so
        # its local-loop machinery never runs; '-cl' enables ours (SURVEY §7:
        # "machinery implemented, gated off by default"); '-o' forces it off
        close_loops=p.flag("-cl") and not open_loop,
        frame_to_frame_rgb=p.flag("-ftf"),
        # '-keep': keep all deactivated models' data (disables smart delete,
        # MainController.cpp:69,236 -> CoFusion.cpp:612-626)
        keep_models=p.flag("-keep"),
    )
    # CRF segmentation tuning flags (MainController.cpp:222-231 push these into
    # the GUI Vars the live system runs with, GUI/Tools/GUI.h:210-227).  The
    # -crf* flags are STDs: the kernel features are scaled by their inverse.
    from cofusion_tpu.config import SegmentationParams

    sp = SegmentationParams()
    engine.segmentation = SegmentationParams(
        scale_rgb=1.0 / p.float_arg("-crfRGB", 1.0 / sp.scale_rgb),
        scale_depth=1.0 / p.float_arg("-crfDepth", 1.0 / sp.scale_depth),
        scale_pos=1.0 / p.float_arg("-crfPos", 1.0 / sp.scale_pos),
        weight_appearance=p.float_arg("-crfAppearance", sp.weight_appearance),
        weight_smoothness=p.float_arg("-crfSmooth", sp.weight_smoothness),
        unary_threshold_new=p.float_arg("-thNew", sp.unary_threshold_new),
        unary_k_error=p.float_arg("-k", sp.unary_k_error),
        min_rel_size_new=p.float_arg("-segMinNew", sp.min_rel_size_new),
        max_rel_size_new=p.float_arg("-segMaxNew", sp.max_rel_size_new),
    )
    # '-a N' preallocates N object models in the reference
    # (preallocatedModelsCount, MainController.cpp:198) to hide allocation
    # hiccups at spawn time; here every slot is statically allocated in the
    # compiled program, so the flag is accepted and a no-op.
    _ = p.int_arg("-a", 0)

    # -p: ground-truth pose override (GroundTruthOdometry)
    ground_truth = None
    pose_file = rel(p.arg("-p"))
    if pose_file:
        from cofusion_tpu.io.ground_truth import GroundTruthOdometry

        ground_truth = GroundTruthOdometry(pose_file)

    reader.flip_colors = p.flag("-f")
    options = {
        "run": p.flag("-run"),
        "quit_on_end": p.flag("-q"),
        "start": p.int_arg("-s", 0),
        "end": p.int_arg("-e", -1),
        "frame_skip": p.flag("-fs"),
        "export_dir": rel(p.arg("-exportdir")),
        "export_poses": p.flag("-ep"),
        # '-icl' = ICL-NUIM mode (MainController.cpp:98): its engine-side
        # effect is savePly() at shutdown (CoFusion.cpp:80-82), hence the model
        # export; its other effect (GUI up-vector flip, MainController.cpp:520)
        # is a headless non-goal
        "export_models": p.flag("-em") or p.flag("-icl"),
        "icl": p.flag("-icl"),
        "rewind": p.flag("-r"),
        "export_segmentation": p.flag("-es"),
        "export_labels": p.flag("-el"),
        "export_normals": p.flag("-en"),
        "export_viewport": p.flag("-ev"),
        "keep_models": p.flag("-keep"),
        "static": static,
        "checkpoint": p.arg("-checkpoint"),
        "resume": p.arg("-resume"),
        "ground_truth": ground_truth,
    }
    return reader, engine, options


def _has_masks(directory) -> bool:
    if not directory or not os.path.isdir(directory):
        return False
    import glob

    return bool(glob.glob(os.path.join(directory, "Mask*")))


def _write_drained_masks(drained: list, opt: dict) -> None:
    """Write masks pulled from the engine's device-side ring ('-es'/'-el').
    Naming + THRESH_TOZERO_INV parity with CoFusion.cpp:235-240."""
    for tick, mask in drained:
        if opt["export_segmentation"]:
            export.export_mask_png(
                os.path.join(opt["export_dir"], f"Segmentation{tick}.png"), mask
            )
        if opt["export_labels"]:
            export.export_label_png(
                os.path.join(opt["export_dir"], f"Labels{tick - 1}.png"), mask
            )


def run(argv: list[str] | None = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    reader, engine, opt = build_from_args(argv)
    sw = Stopwatch.get()

    if opt["resume"]:
        from cofusion_tpu.utils import checkpoint as ckpt

        ckpt.load_engine(engine, opt["resume"])
        print(f"Resumed from {opt['resume']} at tick {int(engine.state.tick)}.")

    if opt["start"]:
        reader.fast_forward(opt["start"])

    end = opt["end"] if opt["end"] >= 0 else reader.num_frames()
    if opt["rewind"] and opt["end"] < 0:
        # '-r' ping-pong playback (MainController.cpp:352-363) has no natural
        # log end; headless default = one full forward + backward sweep.  Pass
        # '-e N' for longer loops (N counts processed frames, like the
        # reference's tick bound).
        end = max(2 * reader.num_frames() - 2, 1)
    direction = 1
    processed = 0
    any_frame_export = opt["export_segmentation"] or opt["export_labels"] or opt[
        "export_normals"
    ] or opt["export_viewport"]
    if opt["export_dir"] and any_frame_export:
        os.makedirs(opt["export_dir"], exist_ok=True)
    while True:
        if opt["rewind"]:
            if processed >= end:
                break
            if direction > 0 and not reader.has_more():
                direction = -1
            if direction < 0 and reader.current_frame <= 1:
                # bounced off the log start: restart forward playback
                reader.rewind()
                direction = 1
            frame = reader.get_next() if direction > 0 else reader.get_previous()
        else:
            if not (reader.has_more() and reader.current_frame < end):
                break
            frame = reader.get_next()
        gt_pose = None
        if opt["ground_truth"] is not None:
            gt_pose = opt["ground_truth"].pose_for(frame.get("timestamp", 0))
        stats = engine.process_frame(frame, gt_pose=gt_pose)
        processed += 1
        # real-time frame-skip policy (GUI/MainController.cpp:413-415)
        if opt["frame_skip"] and sw.timings().get("Run", 0.0) > 1000.0 / 30.0:
            skip = int(sw.timings()["Run"] / (1000.0 / 30.0))
            for _ in range(skip):
                if reader.has_more() and reader.current_frame < end:
                    reader.get_next()
        if opt["export_dir"]:
            # reference tick during this frame's processing == frames seen so far
            tick = int(engine.state.tick)
            if opt["export_segmentation"] or opt["export_labels"]:
                # masks arrive in bulk from the device ring (one transfer per
                # ~R frames) — the async loop never blocks on a mask readback
                _write_drained_masks(engine.drain_segmentation(), opt)
            if opt["export_normals"] or opt["export_viewport"]:
                views = engine.render_views()
                if opt["export_normals"]:
                    export.export_normal_png(
                        os.path.join(opt["export_dir"], f"Normals{tick - 1}.png"),
                        views["normal"], views["valid"],
                    )
                if opt["export_viewport"]:
                    export.export_viewport_png(
                        os.path.join(opt["export_dir"], f"Viewport{tick - 1}.png"),
                        views["image"], views["valid"],
                    )

    if opt["export_dir"]:
        os.makedirs(opt["export_dir"], exist_ok=True)
        if opt["export_segmentation"] or opt["export_labels"]:
            _write_drained_masks(engine.drain_segmentation(flush=True), opt)
        if opt["export_poses"]:
            # model 0 = camera (cam->world); objects = P_cam * P_obj^-1
            # (CoFusion.cpp:502-519) — engine.pose_log already stores this form
            for m in range(engine.cfg.max_models):
                if m == 0 or engine.model_ever_active(m):
                    export.export_poses("", engine.pose_log_for(m), m, opt["export_dir"])
        if opt["export_models"]:
            poses = np.asarray(engine.state.models.pose)
            for m in range(engine.cfg.max_models):
                if m == 0 or engine.model_ever_active(m):
                    surfels = engine.download_model(m)
                    # object clouds go to world frame: Tp = P_cam * P_obj^-1
                    # (CoFusion.cpp:695-698); model 0 is already world-frame
                    transform = None if m == 0 else poses[0] @ np.linalg.inv(poses[m])
                    export.export_ply(
                        os.path.join(opt["export_dir"], f"cloud-{m}.ply"),
                        surfels,
                        conf_threshold=float(engine.state.models.conf_threshold[m]),
                        transform=transform,
                    )
    if opt["checkpoint"]:
        from cofusion_tpu.utils import checkpoint as ckpt

        ckpt.save_engine(engine, opt["checkpoint"])
        print(f"Checkpoint saved to {opt['checkpoint']}.")

    print(f"Processed {processed} frames.")
    print(sw.report())
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
