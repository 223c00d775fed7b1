"""Benchmark: steady-state SLAM frame rate on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the CUDA reference runs "real-time" at ~30 Hz on a
TitanX at 640x480; the rebuild target is >= 30 FPS with active models on one
TPU v5e chip.  This measures the full engine loop (preprocess -> track -> fuse
-> clean) on a synthetic 640x480 sequence, excluding compilation and the first
warm-up frames, with the host loop running async (device-bound).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams
from cofusion_tpu.engine import CoFusion
from cofusion_tpu.io.synthetic import make_sequence


def main():
    cam = CameraConfig()  # 640x480 reference default
    cfg = CoFusionConfig(camera=cam, max_models=1, max_surfels=1 << 20)
    engine = CoFusion(cfg, fusion_params=FusionParams(depth_cutoff=4.5))

    n_unique = 12
    frames, _, _ = make_sequence(cam, n_unique, kind="orbit")

    warmup = 3
    measured = 20
    # warm-up (includes compile)
    for i in range(warmup):
        engine.process_frame(frames[i % n_unique])
    jax.block_until_ready(engine.state.models.pose)

    t0 = time.perf_counter()
    for i in range(measured):
        engine.process_frame(frames[(warmup + i) % n_unique])
    jax.block_until_ready(engine.state.models.pose)
    dt = time.perf_counter() - t0

    fps = measured / dt
    baseline_fps = 30.0
    print(
        json.dumps(
            {
                "metric": "engine_fps_640x480_static",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
