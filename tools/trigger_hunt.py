"""Bisect WHAT degrades the axon TPU server into the slow-gather mode.

Round-4 discovery: the degraded mode is NOT uniform dispatch slowness — tiny
gathers stay fast (the old canary is blind) while gathers/scatters whose table
exceeds ~VMEM run at ~0.6 GB/s (~1000x off).  This script runs candidate
triggers one at a time, measuring a BIG-table canary between each:

    python tools/trigger_hunt.py [--steps alloc,splat,track,fuse,step,upload]

Healthy big-canary: ~0.02-0.06 ms.  Degraded: ~3-8 ms.
"""

import argparse
import gc
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cofusion_tpu.utils import tpu_health


def canary(tag):
    c = tpu_health.canary_ms()
    print(f"[canary] {tag:44s} {c:8.3f} ms  ({'HEALTHY' if tpu_health.is_healthy(c) else 'DEGRADED'})",
          flush=True)
    return c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default="alloc,upload,splat,track,fuse,step")
    ap.add_argument("--alloc-gb", type=float, default=1.2)
    args = ap.parse_args()
    steps = args.steps.split(",")

    canary("baseline")

    if "alloc" in steps:
        # pure allocation: does holding ~bench-scale device memory degrade it?
        n = int(args.alloc_gb * 1e9 / 4 / 16)
        bufs = [jnp.zeros((n,), jnp.float32) + i for i in range(16)]
        jax.block_until_ready(bufs[-1])
        canary(f"after alloc {args.alloc_gb:.1f} GB (held)")
        del bufs
        gc.collect()
        canary("after free")

    if "upload" in steps:
        # H2D transfer volume: ~40 frame-sized uploads
        for i in range(40):
            a = jax.device_put(np.ones((480, 640, 3), np.float32))
        jax.block_until_ready(a)
        canary("after 40x frame uploads")

    engine = None
    if {"splat", "track", "fuse", "step"} & set(steps):
        from bench import build_engine, make_multi_object_frames
        from cofusion_tpu.config import CameraConfig

        cam = CameraConfig()
        max_surfels = int(os.environ.get("BENCH_SURFELS", 1 << 22))
        engine = build_engine(cam, max_surfels, 4)
        frames = make_multi_object_frames(cam, 12)
        canary("after engine state alloc (pre-step)")

    if "step" in steps and engine is not None:
        t0 = time.perf_counter()
        engine.process_frame(frames[0])
        np.asarray(engine.state.models.pose)
        print(f"[step] first frame (compile+run) {time.perf_counter()-t0:.1f} s", flush=True)
        canary("after first engine step")
        for i in range(1, 4):
            engine.process_frame(frames[i])
        np.asarray(engine.state.models.pose)
        canary("after 3 more steps")
        t0 = time.perf_counter()
        for i in range(4, 9):
            engine.process_frame(frames[i])
        np.asarray(engine.state.models.pose)
        dt = (time.perf_counter() - t0) / 5
        print(f"[step] steady-state {dt*1000:.1f} ms/frame ({1/dt:.1f} FPS)", flush=True)
        canary("after 5 timed steps")


if __name__ == "__main__":
    main()
