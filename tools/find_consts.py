"""Trace the engine's _step (bench config) and list embedded jaxpr constants
larger than 1 KB — any such constant triggers the axon constant-poisoning
slowdown (see tools/micro_poison.py).  Runs on CPU (trace only)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams, TrackingParams
from cofusion_tpu.engine import CoFusion, _step


def main():
    cam = CameraConfig()
    cfg = CoFusionConfig(camera=cam, max_models=4, max_surfels=1 << 22)
    engine = CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, confidence_global=1.5,
            model_spawn_offset=4, model_deactivate_count=3,
        ),
        enable_multi_model=True,
    )
    rgb = jnp.zeros(cam.shape + (3,), jnp.float32)
    depth = jnp.ones(cam.shape, jnp.float32)
    mask = jnp.zeros(cam.shape, jnp.int32)
    state = engine._init_state(rgb, depth, mask)
    fparams = engine._make_fparams(1.0, -1, True, None, None)

    fn = functools.partial(
        _step, cam=cam, cfg=cfg, tparams=engine.tracking,
        sparams=engine.segmentation, use_crf=True, use_reloc=False,
        use_gt_pose=False, close_loops=False,
    )
    closed = jax.make_jaxpr(fn)(state, rgb, depth, mask, fparams)
    total = 0
    print("=== embedded constants > 1KB ===")
    for c in closed.consts:
        a = np.asarray(c)
        if a.nbytes > 1024:
            total += a.nbytes
            print(f"  shape={a.shape} dtype={a.dtype} bytes={a.nbytes}")
    print(f"total big-const bytes: {total}")
    n_small = sum(1 for c in closed.consts if np.asarray(c).nbytes <= 1024)
    print(f"small consts (<=1KB): {n_small}")


if __name__ == "__main__":
    main()
