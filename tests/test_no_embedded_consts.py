"""Guard: no engine program may embed a large array constant.

On the axon TPU platform, executing ANY program whose jaxpr carries a big
(>~1KB) embedded array constant permanently degrades the whole process to a
~7 ms-per-op dispatch mode (~100-1000x measured slowdown; see
tools/micro_poison.py).  Large arrays must enter jitted code as ARGUMENTS
(or be computed inside), never as closed-over device/numpy values.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofusion_tpu.config import (
    CameraConfig,
    CoFusionConfig,
    FusionParams,
)
from cofusion_tpu.engine import CoFusion, _step

LIMIT = 1024  # bytes


def _big_consts(closed_jaxpr):
    out = []
    for c in closed_jaxpr.consts:
        a = np.asarray(c)
        if a.nbytes > LIMIT:
            out.append((a.shape, a.dtype, a.nbytes))
    return out


def _make_engine(small_cam, **kw):
    cfg = CoFusionConfig(
        camera=small_cam, max_models=3, max_surfels=1 << 14,
        active_surfels=1 << 13, max_log_frames=64,
    )
    return CoFusion(
        cfg,
        fusion_params=FusionParams(
            depth_cutoff=4.5, confidence_object=0.01, confidence_global=1.5,
            model_spawn_offset=4, model_deactivate_count=3,
        ),
        enable_multi_model=True,
        **kw,
    )


@pytest.mark.parametrize(
    "use_crf,use_reloc,close_loops",
    [
        (True, False, False),   # the bench/north-star variant
        (False, False, False),  # GT-mask variant
        (True, True, True),     # everything on
    ],
)
def test_step_has_no_big_consts(small_cam, use_crf, use_reloc, close_loops):
    engine = _make_engine(
        small_cam,
        enable_relocalization=use_reloc,
        close_loops=close_loops,
    )
    cam = engine.cam
    rgb = jnp.zeros(cam.shape + (3,), jnp.float32)
    depth = jnp.ones(cam.shape, jnp.float32)
    mask = jnp.zeros(cam.shape, jnp.int32)
    state = engine._init_state(rgb, depth, mask)
    fparams = engine._make_fparams(1.0, -1, use_crf, None, None)

    fn = functools.partial(
        _step, cam=cam, cfg=engine.cfg, tparams=engine.tracking,
        sparams=engine.segmentation, use_crf=use_crf, use_reloc=use_reloc,
        use_gt_pose=False, close_loops=close_loops,
    )
    jaxpr = jax.make_jaxpr(fn)(state, rgb, depth, mask, fparams)
    big = _big_consts(jaxpr)
    assert big == [], f"embedded constants in _step: {big}"


def test_gt_pose_step_has_no_big_consts(small_cam):
    engine = _make_engine(small_cam)
    cam = engine.cam
    rgb = jnp.zeros(cam.shape + (3,), jnp.float32)
    depth = jnp.ones(cam.shape, jnp.float32)
    mask = jnp.zeros(cam.shape, jnp.int32)
    state = engine._init_state(rgb, depth, mask)
    fparams = engine._make_fparams(1.0, -1, False, None, np.eye(4, dtype=np.float32))

    fn = functools.partial(
        _step, cam=cam, cfg=engine.cfg, tparams=engine.tracking,
        sparams=engine.segmentation, use_crf=False, use_reloc=False,
        use_gt_pose=True, close_loops=False,
    )
    jaxpr = jax.make_jaxpr(fn)(state, rgb, depth, mask, fparams)
    big = _big_consts(jaxpr)
    assert big == [], f"embedded constants in _step_gt_pose: {big}"


def test_render_fn_has_no_big_consts(small_cam):
    engine = _make_engine(small_cam)
    rgb = jnp.zeros(engine.cam.shape + (3,), jnp.float32)
    depth = jnp.ones(engine.cam.shape, jnp.float32)
    engine.process_frame({"rgb": rgb, "depth": depth, "timestamp": 0})
    engine.render_views()  # builds self._render_fn
    # re-trace the same callable the engine jitted
    fn = engine._render_fn.__wrapped__
    st = engine.state
    fp = dict(
        time_delta=jnp.int32(engine.cfg.time_delta),
        depth_cutoff=jnp.float32(engine.fusion.depth_cutoff),
        conf=st.models.conf_threshold[0],
    )
    jaxpr = jax.make_jaxpr(fn)(
        st.models.store, st.models.stable, st.models.pose, st.tick, fp
    )
    big = _big_consts(jaxpr)
    assert big == [], f"embedded constants in render fn: {big}"
