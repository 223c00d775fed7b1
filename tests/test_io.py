"""I/O round-trip tests: klg write/read (native C++ decoder), image directories,
calibration parsing, PLY + pose export formats."""

import os

import numpy as np
import pytest

from cofusion_tpu.config import CameraConfig
from cofusion_tpu.io import readers
from cofusion_tpu.io.synthetic import make_sequence
from cofusion_tpu.utils import export


@pytest.fixture(scope="module")
def tiny_seq(small_cam):
    frames, gt, _ = make_sequence(small_cam, 4, kind="orbit")
    return frames


def test_klg_roundtrip(tmp_path, small_cam, tiny_seq):
    path = str(tmp_path / "test.klg")
    readers.write_klg(path, tiny_seq, small_cam.width, small_cam.height, compress=True)
    r = readers.KlgLogReader(path, small_cam.width, small_cam.height)
    assert r.num_frames() == 4
    f0 = r.get_next()
    assert f0["rgb"].shape == (small_cam.height, small_cam.width, 3)
    assert f0["depth"].shape == (small_cam.height, small_cam.width)
    # depth quantized to mm
    np.testing.assert_allclose(f0["depth"], tiny_seq[0]["depth"], atol=6e-4)
    # rgb was stored raw (we wrote uncompressed rgb): exact
    np.testing.assert_array_equal(f0["rgb"], tiny_seq[0]["rgb"])
    assert f0["timestamp"] == 0
    # skip + rewind
    r.fast_forward(3)
    f3 = r.get_next()
    np.testing.assert_allclose(f3["depth"], tiny_seq[3]["depth"], atol=6e-4)
    assert not r.has_more()
    r.rewind()
    assert r.has_more()
    f0b = r.get_next()
    np.testing.assert_array_equal(f0b["rgb"], f0["rgb"])
    r.close()


def test_klg_python_fallback(tmp_path, small_cam, tiny_seq, monkeypatch):
    path = str(tmp_path / "test2.klg")
    readers.write_klg(path, tiny_seq, small_cam.width, small_cam.height)
    r = readers.KlgLogReader(path, small_cam.width, small_cam.height)
    monkeypatch.setattr(r, "_lib", None)
    r._fp = open(path, "rb")
    r._fp.seek(4)
    f0 = r.get_next()
    np.testing.assert_allclose(f0["depth"], tiny_seq[0]["depth"], atol=6e-4)
    np.testing.assert_array_equal(f0["rgb"], tiny_seq[0]["rgb"])


def test_image_dir_reader(tmp_path, small_cam, tiny_seq):
    import cv2

    d = tmp_path / "imgs"
    m = tmp_path / "masks"
    d.mkdir()
    m.mkdir()
    for i, f in enumerate(tiny_seq):
        cv2.imwrite(str(d / f"Color{i:04d}.png"), f["rgb"][..., ::-1])
        cv2.imwrite(
            str(d / f"Depth{i:04d}.png"),
            np.round(f["depth"] * 1000).astype(np.uint16),
        )
        cv2.imwrite(str(m / f"Mask{i:04d}.png"), f["mask"])
    (d / "calibration.txt").write_text("132.0 132.0 80.0 64.0")

    # mm-encoded PNG depth needs the explicit x0.001 scale (the DEFAULT is the
    # reference's hard-coded x0.0006 Blender-dataset quirk, ImageLogReader.cpp:260)
    r = readers.ImageLogReader(str(d), mask_directory=str(m), png_depth_scale=0.001)
    assert r.num_frames() == 4
    assert r.calibration_file() is not None
    fx, fy, cx, cy, w, h = readers.load_calibration(r.calibration_file())
    assert (fx, fy, cx, cy) == (132.0, 132.0, 80.0, 64.0)
    f0 = r.get_next()
    np.testing.assert_array_equal(f0["rgb"], tiny_seq[0]["rgb"])
    np.testing.assert_allclose(f0["depth"], tiny_seq[0]["depth"], atol=6e-4)
    np.testing.assert_array_equal(f0["mask"], tiny_seq[0]["mask"])
    for _ in range(3):
        assert r.has_more()
        r.get_next()
    assert not r.has_more()


def test_pose_export_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    log = []
    for t in range(5):
        T = np.eye(4, dtype=np.float32)
        w = rng.standard_normal(3) * 0.1
        from scipy.spatial.transform import Rotation

        T[:3, :3] = Rotation.from_rotvec(w).as_matrix()
        T[:3, 3] = rng.standard_normal(3)
        log.append((t * 1000, T[None]))
    path = export.export_poses("unused", log, 0, str(tmp_path))
    ts, poses = export.load_tum_trajectory(path)
    assert len(ts) == 5
    for i in range(5):
        np.testing.assert_allclose(poses[i][:3, 3], log[i][1][0][:3, 3], atol=1e-4)
        np.testing.assert_allclose(poses[i][:3, :3], log[i][1][0][:3, :3], atol=1e-4)


def test_ply_export_roundtrip(tmp_path):
    n = 100
    rng = np.random.default_rng(1)
    surfels = {
        "pos": rng.standard_normal((n, 3)).astype(np.float32),
        "normal": rng.standard_normal((n, 3)).astype(np.float32),
        "color": (rng.random((n, 3)) * 255).astype(np.float32),
        "radius": rng.random(n).astype(np.float32),
        "conf": np.linspace(0, 20, n).astype(np.float32),
    }
    path = str(tmp_path / "cloud-0.ply")
    written = export.export_ply(path, surfels, conf_threshold=10.0)
    assert written == (surfels["conf"] > 10.0).sum()
    back = export.read_ply(path)
    keep = surfels["conf"] > 10.0
    np.testing.assert_allclose(back["pos"], surfels["pos"][keep], atol=1e-6)
    np.testing.assert_allclose(back["normal"], -surfels["normal"][keep], atol=1e-6)
    np.testing.assert_allclose(back["radius"], surfels["radius"][keep], atol=1e-6)


def test_ate_rmse_alignment():
    # a rigidly-transformed trajectory has zero ATE after alignment
    rng = np.random.default_rng(2)
    gt = []
    for t in range(10):
        T = np.eye(4)
        T[:3, 3] = rng.standard_normal(3)
        gt.append(T)
    from scipy.spatial.transform import Rotation

    Rg = Rotation.from_rotvec([0.1, 0.2, -0.1]).as_matrix()
    tg = np.array([1.0, -2.0, 0.5])
    est = []
    for T in gt:
        E = np.eye(4)
        E[:3, 3] = Rg @ T[:3, 3] + tg
        est.append(E)
    assert export.ate_rmse(est, gt) < 1e-9
    assert export.ate_rmse(est, gt, align=False) > 1.0
