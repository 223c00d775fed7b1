"""Frame-by-frame canary bisect: which frame poisons the process, and is it
the CRF active-flag sync (np.asarray of a bool array) or the first spawn?

Usage: python tools/micro_canary2.py [--no-sync] [--frames N]
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams

N = 524288
_state = {}


def canary(tag):
    if not _state:
        _state["t"] = jax.random.uniform(jax.random.PRNGKey(0), (N,))
        _state["i"] = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N)
        _state["fn"] = jax.jit(lambda t, i: jnp.take(t, i))
        np.asarray(_state["t"][:1])
    fn, t, i = _state["fn"], _state["t"], _state["i"]
    out = fn(t, i)
    np.asarray(out[:1])  # real readback drain
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(t, i)
    np.asarray(out[:1])
    print(f"canary[{tag:24s}] {(time.perf_counter()-t0)/10*1000:9.3f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-sync", action="store_true")
    ap.add_argument("--frames", type=int, default=12)
    args = ap.parse_args()

    from bench import make_multi_object_frames
    from cofusion_tpu.engine import CoFusion

    cam = CameraConfig()
    cfg = CoFusionConfig(camera=cam, max_models=4, max_surfels=1 << 22)
    frames = make_multi_object_frames(cam, 12)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, confidence_global=1.5,
            model_spawn_offset=4, model_deactivate_count=3,
        ),
        enable_multi_model=True,
    )
    if args.no_sync:
        # suppress the periodic CRF active-flag sync readback
        engine._frames_since_sync = -(10**9)

    canary("start")
    for i in range(args.frames):
        t0 = time.perf_counter()
        engine.process_frame(frames[i % 12])
        np.asarray(engine.state.tick)  # real completion drain
        dt = (time.perf_counter() - t0) * 1000
        print(f"  frame {i + 1:2d} wall: {dt:10.1f} ms", flush=True)
        canary(f"after frame {i + 1}")


if __name__ == "__main__":
    main()
