"""Round-5 flag parity: '-o' open-loop mode (MainController.cpp:202,328-329 —
openLoop forces timeDelta to INT_MAX/2 and closeLoops=false)."""

import numpy as np


def _dataset(tmp_path):
    import cv2

    d = tmp_path / "ds"
    d.mkdir()
    cv2.imwrite(str(d / "Color0000.png"), np.zeros((480, 640, 3), np.uint8))
    cv2.imwrite(str(d / "Depth0000.png"), np.full((480, 640), 1500, np.uint16))
    return str(d)


def test_open_loop_flag(tmp_path):
    from cofusion_tpu import cli

    d = _dataset(tmp_path)
    _, engine, _ = cli.build_from_args(["-dir", d, "-o", "-cl"])
    assert engine.cfg.time_delta == (1 << 30)
    assert not engine.close_loops, "-o must force loop closure off"
    _, engine2, _ = cli.build_from_args(["-dir", d, "-cl"])
    assert engine2.cfg.time_delta == 200
    assert engine2.close_loops


def test_open_loop_does_not_shadow_or_offset(tmp_path):
    """'-o' is exact-token: '-or'/'-offset' must not trigger it."""
    from cofusion_tpu import cli

    d = _dataset(tmp_path)
    _, engine, _ = cli.build_from_args(["-dir", d, "-or", "5", "-offset", "10"])
    assert engine.cfg.time_delta == 200
