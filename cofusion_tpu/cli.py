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
            if i + 1 < len(self.argv) and not self.argv[i + 1].startswith("-"):
                return self.argv[i + 1]
        return default

    def float_arg(self, flag: str, default: float) -> float:
        v = self.arg(flag)
        return float(v) if v is not None else default

    def int_arg(self, flag: str, default: int) -> int:
        v = self.arg(flag)
        return int(v) if v is not None else default

    def flag(self, flag: str) -> bool:
        return flag in self.argv


def build_from_args(argv: list[str]):
    """Construct (reader, engine, options) from reference-style argv."""
    from cofusion_tpu.engine import CoFusion

    p = Parse(argv)
    base = p.arg("-basedir", "")

    def rel(path):
        return os.path.join(base, path) if path and base else path

    width, height = 640, 480
    fx, fy, cx, cy = 528.0, 528.0, 320.0, 240.0  # MainController.cpp:108-110

    log = rel(p.arg("-l"))
    directory = rel(p.arg("-dir"))
    mask_dir = rel(p.arg("-maskdir")) or directory

    reader: readers.LogReader
    if log:
        reader = readers.KlgLogReader(log, width, height)
    elif directory:
        reader = readers.ImageLogReader(
            directory,
            mask_directory=mask_dir if (p.arg("-maskdir") or _has_masks(mask_dir)) else None,
            color_prefix=p.arg("-colorprefix"),
            depth_prefix=p.arg("-depthprefix"),
            mask_prefix=p.arg("-maskprefix"),
        )
    else:
        raise SystemExit("need -l <log.klg> or -dir <dataset dir>")

    cal = rel(p.arg("-cal")) or (reader.calibration_file() if directory else None)
    if cal:
        fx, fy, cx, cy, w2, h2 = readers.load_calibration(cal)
        if w2 and h2:
            width, height = w2, h2

    cam = CameraConfig(width=width, height=height, fx=fx, fy=fy, cx=cx, cy=cy)
    static = p.flag("-static")
    cfg = CoFusionConfig(
        camera=cam,
        max_models=1 if static else 4,
        fast_odom=p.flag("-fo"),
        use_so3=not p.flag("-nso"),
        time_delta=p.int_arg("-t", 200),
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
        outlier_coefficient=p.float_arg("-or", 3.0) / 150.0,
    )
    engine = CoFusion(
        cfg,
        tracking=tracking,
        fusion_params=fusion,
        enable_multi_model=not static,
        enable_relocalization=p.flag("-rl"),
    )

    reader.flip_colors = p.flag("-f")
    options = {
        "run": p.flag("-run"),
        "quit_on_end": p.flag("-q"),
        "start": p.int_arg("-s", 0),
        "end": p.int_arg("-e", -1),
        "frame_skip": p.flag("-fs"),
        "export_dir": rel(p.arg("-exportdir")),
        "export_poses": p.flag("-ep"),
        "export_models": p.flag("-em"),
        "export_segmentation": p.flag("-es"),
        "keep_models": p.flag("-keep"),
        "static": static,
        "checkpoint": p.arg("-checkpoint"),
        "resume": p.arg("-resume"),
    }
    return reader, engine, options


def _has_masks(directory) -> bool:
    if not directory or not os.path.isdir(directory):
        return False
    import glob

    return bool(glob.glob(os.path.join(directory, "Mask*")))


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
    processed = 0
    while reader.has_more() and reader.current_frame < end:
        frame = reader.get_next()
        stats = engine.process_frame(frame)
        processed += 1
        # real-time frame-skip policy (GUI/MainController.cpp:413-415)
        if opt["frame_skip"] and sw.timings().get("Run", 0.0) > 1000.0 / 30.0:
            skip = int(sw.timings()["Run"] / (1000.0 / 30.0))
            for _ in range(skip):
                if reader.has_more() and reader.current_frame < end:
                    reader.get_next()
        if opt["export_dir"] and opt["export_segmentation"]:
            os.makedirs(opt["export_dir"], exist_ok=True)
            mask = engine.current_segmentation()
            if mask is not None:
                export.export_mask_png(
                    os.path.join(opt["export_dir"], f"Mask{reader.current_frame - 1:04d}.png"),
                    mask,
                )

    if opt["export_dir"]:
        os.makedirs(opt["export_dir"], exist_ok=True)
        if opt["export_poses"]:
            # model 0 = camera (cam->world); objects = P_cam * P_obj^-1
            # (CoFusion.cpp:502-519) — engine.pose_log already stores this form
            for m in range(engine.cfg.max_models):
                if m == 0 or engine.model_ever_active(m):
                    export.export_poses("", engine.pose_log_for(m), m, opt["export_dir"])
        if opt["export_models"]:
            for m in range(engine.cfg.max_models):
                if m == 0 or engine.model_ever_active(m):
                    surfels = engine.download_model(m)
                    export.export_ply(
                        os.path.join(opt["export_dir"], f"cloud-{m}.ply"),
                        surfels,
                        conf_threshold=float(engine.state.models.conf_threshold[m]),
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
