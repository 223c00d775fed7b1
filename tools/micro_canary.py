"""Find what poisons the bench process: time a canary gather after each
host-side stage of the real bench workload."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams

N = 524288
_table = None
_idx = None
_canary_fn = None


def canary(tag):
    global _table, _idx, _canary_fn
    if _table is None:
        _table = jax.random.uniform(jax.random.PRNGKey(0), (N,))
        _idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N)
        _canary_fn = jax.jit(lambda t, i: jnp.take(t, i))
        jax.block_until_ready((_table, _idx))
    out = _canary_fn(_table, _idx)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(10):
        out = _canary_fn(_table, _idx)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"canary[{tag:32s}] {(time.perf_counter()-t0)/10*1000:9.3f} ms", flush=True)


def main():
    canary("start")

    from bench import make_multi_object_frames
    from cofusion_tpu.engine import CoFusion

    cam = CameraConfig()
    cfg = CoFusionConfig(camera=cam, max_models=4, max_surfels=1 << 22)
    frames = make_multi_object_frames(cam, 12)
    canary("frames built")

    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, confidence_global=1.5,
            model_spawn_offset=4, model_deactivate_count=3,
        ),
        enable_multi_model=True,
    )
    canary("engine constructed")

    engine.process_frame(frames[0])
    jax.block_until_ready(engine.state.models.pose)
    canary("frame 1 (init)")

    for i in range(1, 4):
        t0 = time.perf_counter()
        engine.process_frame(frames[i])
        jax.block_until_ready(engine.state.models.pose)
        dt = (time.perf_counter() - t0) * 1000
        print(f"  frame {i + 1} step wall: {dt:9.1f} ms", flush=True)
        canary(f"after frame {i + 1}")

    # steady-state frame timing
    t0 = time.perf_counter()
    for i in range(4, 10):
        engine.process_frame(frames[i % 12])
    jax.block_until_ready(engine.state.models.pose)
    print(f"steady frames 5-10 avg: {(time.perf_counter()-t0)/6*1000:9.1f} ms", flush=True)
    canary("end")


if __name__ == "__main__":
    main()
