"""Round-2 flag parity: -p ground-truth poses, -ftf frame-to-frame RGB,
-depthdir/-nm/-indexW reader options, -el/-en/-ev render exports, -cal for
klg logs, -ns surfel capacity."""

import os

import numpy as np
import pytest

from cofusion_tpu.config import CameraConfig
from cofusion_tpu.io import readers
from cofusion_tpu.io.synthetic import make_sequence
from cofusion_tpu.utils import export


@pytest.fixture(scope="module")
def tiny_cam():
    return CameraConfig(width=80, height=64, fx=66.0, fy=66.0, cx=40.0, cy=32.0)


@pytest.fixture(scope="module")
def tiny_frames(tiny_cam):
    frames, gt, _ = make_sequence(tiny_cam, 5, kind="orbit")
    return frames, gt


def _write_gt(path, gt, timestamps):
    with open(path, "w") as f:
        for ts, T in zip(timestamps, gt):
            f.write(export.pose_to_tum_line(ts, T.astype(np.float32)) + "\n")


def test_ground_truth_odometry_accumulates(tmp_path, tiny_frames):
    from cofusion_tpu.io.ground_truth import GroundTruthOdometry

    frames, gt = tiny_frames
    path = str(tmp_path / "gt.txt")
    _write_gt(path, gt, [f["timestamp"] for f in frames])
    gto = GroundTruthOdometry(path)
    # accumulated pose_t == T_0^-1 T_t (trajectory replayed relative to start;
    # here T_0 == identity so pose_t == T_t)
    for i, f in enumerate(frames):
        p = gto.pose_for(f["timestamp"])
        np.testing.assert_allclose(p, gt[i], atol=1e-5)


def test_cli_gt_pose_and_render_exports(tmp_path, tiny_cam, tiny_frames):
    """-p replays the GT trajectory to float tolerance; -es/-el/-en/-ev write
    per-frame images with reference-style names."""
    from cofusion_tpu import cli

    frames, gt = tiny_frames
    klg = str(tmp_path / "log.klg")
    readers.write_klg(klg, frames, tiny_cam.width, tiny_cam.height)
    cal = tmp_path / "cal.txt"
    cal.write_text(
        f"{tiny_cam.fx} {tiny_cam.fy} {tiny_cam.cx} {tiny_cam.cy} "
        f"{tiny_cam.width} {tiny_cam.height}"
    )
    gt_file = str(tmp_path / "gt.txt")
    _write_gt(gt_file, gt, [f["timestamp"] for f in frames])
    out = str(tmp_path / "export")

    rc = cli.run(
        [
            "-l", klg, "-cal", str(cal), "-static", "-run", "-q",
            "-p", gt_file, "-ep", "-es", "-el", "-en", "-ev",
            "-exportdir", out, "-ns", "8192", "-d", "4.5",
        ]
    )
    assert rc == 0
    # poses-0.txt must reproduce the GT trajectory (quaternion round-trip tol)
    ts, poses = export.load_tum_trajectory(os.path.join(out, "poses-0.txt"))
    assert len(ts) == len(frames)
    for i in range(len(frames)):
        np.testing.assert_allclose(poses[i][:3, 3], gt[i][:3, 3], atol=1e-4)
        np.testing.assert_allclose(poses[i][:3, :3], gt[i][:3, :3], atol=1e-4)
    # per-frame render exports, reference naming (Segmentation<tick>,
    # Labels/Normals/Viewport<tick-1>)
    n = len(frames)
    for t in range(2, n + 1):
        assert os.path.exists(os.path.join(out, f"Segmentation{t}.png")), t
        assert os.path.exists(os.path.join(out, f"Labels{t - 1}.png")), t
        assert os.path.exists(os.path.join(out, f"Normals{t - 1}.png")), t
        assert os.path.exists(os.path.join(out, f"Viewport{t - 1}.png")), t


def test_ftf_changes_tracking(tiny_cam, tiny_frames):
    """-ftf must change the photometric target (prediction -> previous raw
    frame) and therefore the estimated trajectory."""
    from cofusion_tpu.config import CoFusionConfig, FusionParams
    from cofusion_tpu.engine import CoFusion

    frames, gt = tiny_frames
    cfg = CoFusionConfig(
        camera=tiny_cam, max_models=1, max_surfels=1 << 13,
        deform_nodes=64, cons_sample=8,
    )
    poses = {}
    for ftf in (False, True):
        # low global confidence so the splat prediction actually renders within
        # 5 frames — otherwise FillIn passes raw through in BOTH modes and the
        # image channel is identical
        e = CoFusion(
            cfg,
            fusion_params=FusionParams(depth_cutoff=4.5, confidence_global=0.5),
            frame_to_frame_rgb=ftf,
        )
        for f in frames:
            e.process_frame(f)
        poses[ftf] = e.camera_pose()
        # both modes stay sane on an easy sequence
        assert np.linalg.norm(poses[ftf][:3, 3] - gt[-1][:3, 3]) < 0.02
    assert not np.allclose(poses[False], poses[True]), "ftf had no effect"


def test_reader_depthdir_and_max_masks(tmp_path, tiny_cam, tiny_frames):
    import cv2

    frames, _ = tiny_frames
    c = tmp_path / "color"
    d = tmp_path / "depthsep"
    m = tmp_path / "masks"
    for p in (c, d, m):
        p.mkdir()
    for i, f in enumerate(frames):
        cv2.imwrite(str(c / f"Color{i:04d}.png"), f["rgb"][..., ::-1])
        cv2.imwrite(str(d / f"Depth{i:04d}.png"), np.round(f["depth"] * 1000).astype(np.uint16))
        cv2.imwrite(str(m / f"Mask{i:04d}.png"), f["mask"])

    r = readers.ImageLogReader(
        str(c), mask_directory=str(m), depth_directory=str(d), max_masks=2,
        png_depth_scale=0.001,  # mm-encoded test PNGs (default is x0.0006)
    )
    assert r.num_frames() == len(frames)
    f0 = r.get_next()
    np.testing.assert_allclose(f0["depth"], frames[0]["depth"], atol=6e-4)
    assert f0["mask"] is not None
    f1 = r.get_next()
    assert f1["mask"] is not None
    f2 = r.get_next()  # index 2 >= max_masks=2 -> no mask (-nm semantics)
    assert f2["mask"] is None

    # -nm without value: ignore masks entirely
    r2 = readers.ImageLogReader(
        str(c), mask_directory=str(m), depth_directory=str(d), max_masks=0
    )
    assert r2.get_next()["mask"] is None


def test_reader_index_width(tmp_path, tiny_cam, tiny_frames):
    import cv2

    frames, _ = tiny_frames
    c = tmp_path / "imgs"
    c.mkdir()
    for i, f in enumerate(frames[:3]):
        cv2.imwrite(str(c / f"Color{i:04d}.png"), f["rgb"][..., ::-1])
        cv2.imwrite(str(c / f"Depth{i:04d}.png"), np.round(f["depth"] * 1000).astype(np.uint16))
    # a decoy series with 6-digit indices must be excluded by -indexW 4
    cv2.imwrite(str(c / "Color000099.png"), frames[3]["rgb"][..., ::-1])
    cv2.imwrite(str(c / "Depth000099.png"), np.round(frames[3]["depth"] * 1000).astype(np.uint16))

    r = readers.ImageLogReader(str(c), index_width=4)
    assert r.num_frames() == 3


def test_colorize_labels():
    mask = np.array([[0, 1, 2], [3, 255, 1]], np.uint8)
    rgb = export.colorize_labels(mask)
    np.testing.assert_array_equal(rgb[0, 1], [0, 0, 255])   # label 1 = blue
    np.testing.assert_array_equal(rgb[0, 2], [255, 0, 0])   # label 2 = red
    np.testing.assert_array_equal(rgb[1, 1], [0, 0, 0])     # suppressed = black
