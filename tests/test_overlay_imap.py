"""overlay_imap (ops/fusion.py): the post-fuse index render built by patching
the pre-fuse render must match a TRUE re-render (rasterize.predict_indices of
the fused store) everywhere the two are defined to agree — i.e. up to merged
surfels whose position nudge crossed a pixel boundary (sub-pixel by the fuse
gates; zero in a static scene).  The reference re-renders between fuse and
clean (CoFusion.cpp:474); the overlay replaces that second z-buffer pass.
"""

import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CoFusionConfig
from cofusion_tpu.io.synthetic import SyntheticScene
from cofusion_tpu.ops import fusion as fu
from cofusion_tpu.ops import rasterize as rz


def _setup(small_cam, time=2):
    cfg = CoFusionConfig(camera=small_cam, max_surfels=1 << 16)
    scene = SyntheticScene()
    rgb0, depth0, _ = scene.render(small_cam, np.eye(4))
    fs0 = fu.make_frame_surfels(
        jnp.asarray(depth0), jnp.asarray(depth0), jnp.asarray(rgb0, jnp.float32),
        small_cam, 1.0, 4.5,
    )
    store = fu.initialise(fs0, jnp.eye(4), cfg.active_capacity, time=1)
    # second frame: slightly moved camera -> a mix of merges and appends
    pose = np.eye(4)
    pose[0, 3] = 0.004
    rgb1, depth1, _ = scene.render(small_cam, pose)
    fs1 = fu.make_frame_surfels(
        jnp.asarray(depth1), jnp.asarray(depth1), jnp.asarray(rgb1, jnp.float32),
        small_cam, 1.0, 4.5,
    )
    posej = jnp.asarray(pose, jnp.float32)
    imap = rz.predict_indices(store, posej, small_cam, time, 200, 4.5)
    mask_ok = jnp.ones(small_cam.shape, bool)
    fused, aux = fu.fuse(
        store, fs1, jnp.asarray(depth1), imap, mask_ok, posej, small_cam, cfg,
        time, 4.5, return_aux=True,
    )
    overlay = fu.overlay_imap(fused, imap, aux, fs1, posej, small_cam, time)
    rerender = rz.predict_indices(fused, posej, small_cam, time, 200, 4.5)
    return overlay, rerender, int(np.asarray(aux.new_s).sum())


def test_overlay_matches_rerender(small_cam):
    overlay, rerender, n_new = _setup(small_cam)
    assert n_new > 0, "fixture must exercise the append path"
    ov_idx = np.asarray(overlay.index)
    rr_idx = np.asarray(rerender.index)
    agree = ov_idx == rr_idx
    # sub-pixel merge nudges may flip a few boundary pixels' winners
    assert np.mean(agree) > 0.98, np.mean(agree)
    # where the index agrees, every channel must agree numerically
    for name in ("vert_conf", "normal_rad", "color_time"):
        a = np.asarray(getattr(overlay, name))
        b = np.asarray(getattr(rerender, name))
        np.testing.assert_allclose(
            a[agree], b[agree], atol=1e-4,
            err_msg=f"{name} mismatch on agreeing pixels",
        )
    np.testing.assert_allclose(
        np.asarray(overlay.last_time)[agree],
        np.asarray(rerender.last_time)[agree], atol=0,
    )
    np.testing.assert_array_equal(
        np.asarray(overlay.valid)[agree], np.asarray(rerender.valid)[agree]
    )


def test_overlay_appended_surfels_present(small_cam):
    overlay, rerender, n_new = _setup(small_cam)
    # every appended surfel that won the re-render z-test must be present in
    # the overlay at the same pixel
    rr_idx = np.asarray(rerender.index)
    ov_idx = np.asarray(overlay.index)
    appended_won = rr_idx[rr_idx >= 0] != ov_idx[rr_idx >= 0]
    assert np.mean(appended_won) < 0.02
