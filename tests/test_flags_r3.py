"""Round-3 flag parity: the 9 CRF segmentation tuning flags
(GUI/MainController.cpp:222-231), '-a' preallocated pool, '-r' rewind
playback, '-icl' savePly-at-end semantics, and '-pngScale' 16-bit PNG depth
conversion (reference hard-codes x0.0006, ImageLogReader.cpp:260)."""

import numpy as np
import pytest

from cofusion_tpu.config import CameraConfig, CoFusionConfig, SegmentationParams
from cofusion_tpu.io import readers
from cofusion_tpu.io.synthetic import make_sequence


@pytest.fixture(scope="module")
def tiny_cam():
    return CameraConfig(width=80, height=64, fx=66.0, fy=66.0, cx=40.0, cy=32.0)


def _klg(tmp_path, cam, n=4):
    frames, gt, _ = make_sequence(cam, n, kind="orbit")
    path = str(tmp_path / "log.klg")
    readers.write_klg(path, frames, cam.width, cam.height)
    return path


def test_crf_flags_reach_segmentation_params(tmp_path, tiny_cam):
    from cofusion_tpu import cli

    klg = _klg(tmp_path, tiny_cam)
    _, engine, opt = cli.build_from_args(
        [
            "-l", klg, "-crfRGB", "20", "-crfDepth", "0.45", "-crfPos", "3.6",
            "-crfAppearance", "9", "-crfSmooth", "4", "-segMinNew", "0.02",
            "-segMaxNew", "0.3", "-thNew", "7.5", "-k", "0.05", "-a", "3", "-r",
        ]
    )
    sp = engine.segmentation
    assert sp.scale_rgb == pytest.approx(1 / 20)
    assert sp.scale_depth == pytest.approx(1 / 0.45)
    assert sp.scale_pos == pytest.approx(1 / 3.6)
    assert sp.weight_appearance == 9 and sp.weight_smoothness == 4
    assert sp.min_rel_size_new == pytest.approx(0.02)
    assert sp.max_rel_size_new == pytest.approx(0.3)
    assert sp.unary_threshold_new == pytest.approx(7.5)
    assert sp.unary_k_error == pytest.approx(0.05)
    assert opt["rewind"] is True
    # defaults when flags absent = the reference's live GUI values
    _, engine2, opt2 = cli.build_from_args(["-l", klg])
    assert engine2.segmentation == SegmentationParams()
    assert opt2["rewind"] is False


def test_icl_exports_models(tmp_path, tiny_cam):
    """-icl's engine-side effect is savePly at shutdown (CoFusion.cpp:80-82)."""
    from cofusion_tpu import cli

    klg = _klg(tmp_path, tiny_cam)
    _, _, opt = cli.build_from_args(["-l", klg, "-icl"])
    assert opt["export_models"] is True and opt["icl"] is True


def test_thnew_changes_spawning():
    """-thNew raises/zeroes the new-label unary: a moving region must win a new
    label at the default threshold and lose it at ~0 (op-level)."""
    import jax.numpy as jnp

    from cofusion_tpu.ops import segmentation as sg

    cam = CameraConfig(width=80, height=64, fx=66.0, fy=66.0, cx=40.0, cy=32.0)
    cfg = CoFusionConfig(camera=cam, max_models=2)
    rgb = jnp.zeros((64, 80, 3), jnp.float32) + 100.0
    depth = jnp.full((64, 80), 2.0, jnp.float32)
    err = jnp.zeros((2, 64, 80), jnp.float32)
    # background tracks poorly in a central blob -> candidate new object
    err = err.at[0, 20:44, 24:56].set(0.5)
    conf = jnp.full((2, 64, 80), 1.0, jnp.float32)
    active = jnp.asarray([True, False])

    def run(params):
        seg = sg.perform_segmentation_crf(
            rgb, depth, err, conf, active, jnp.int32(1), jnp.bool_(True),
            cam, cfg, params,
        )
        return bool(seg.has_new_label)

    assert run(SegmentationParams())  # default threshold 5.5 spawns
    assert not run(SegmentationParams(unary_threshold_new=0.0))


def test_rewind_pingpong_replays(tmp_path, tiny_cam):
    """-r: after the log end, frames come back in reverse (getPrevious)."""
    frames, _, _ = make_sequence(tiny_cam, 5, kind="orbit")
    path = str(tmp_path / "pp.klg")
    readers.write_klg(path, frames, tiny_cam.width, tiny_cam.height)
    r = readers.KlgLogReader(path, tiny_cam.width, tiny_cam.height)
    fwd = [r.get_next()["timestamp"] for _ in range(5)]
    assert not r.has_more()
    back = [r.get_previous()["timestamp"] for _ in range(4)]
    assert fwd == [f["timestamp"] for f in frames]
    assert back == fwd[-2::-1], (fwd, back)


def test_png_depth_scale(tmp_path, tiny_cam):
    """16-bit PNG depth converts at the reference's x0.0006 by default
    (ImageLogReader.cpp:260); -pngScale overrides."""
    import cv2

    frames, _, _ = make_sequence(tiny_cam, 2, kind="still")
    d = tmp_path / "data"
    d.mkdir()
    for i, f in enumerate(frames):
        cv2.imwrite(str(d / f"Color{i:04d}.png"), f["rgb"][..., ::-1])
        cv2.imwrite(
            str(d / f"Depth{i:04d}.png"),
            np.round(f["depth"] / 0.0006).astype(np.uint16),
        )
    r = readers.ImageLogReader(str(d))
    got = r.get_next()["depth"]
    np.testing.assert_allclose(got, frames[0]["depth"], atol=0.001)
    r2 = readers.ImageLogReader(str(d), png_depth_scale=0.001)
    got2 = r2.get_next()["depth"]
    np.testing.assert_allclose(got2, frames[0]["depth"] / 0.6, atol=0.002)
