"""Large-store z-buffer depth fidelity (VERDICT r3 item 4).

Stores beyond 2^19 surfels leave < 12 quantized-z bits in the packed int32
key, so `_zbuffer` switches to the exact two-pass form (float32 z scatter-min
+ index scatter-min).  These tests pin that the switch exists and that depth
ordering is EXACT (sub-millimeter separation resolved) at the bench's 4.2M
capacity and at the reference's own 3072^2 = 9.4M scale
(Core/Model/Model.cpp:92-98; GL 24-bit depth test ModelProjection.cpp:105-157).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cofusion_tpu.config import CameraConfig
from cofusion_tpu.models import surfel_model as sm
from cofusion_tpu.ops import rasterize as rz


def _store_with_pairs(capacity: int, cam: CameraConfig, dz: float):
    """Surfel pairs projecting to the same pixel, separated by `dz` meters.
    The FAR surfel of each pair has the SMALLER index, so a quantized key that
    collapses the pair would pick the far one (tie -> low index) — ordering
    errors are visible, not maskable."""
    store = sm.empty_store(capacity)
    n_pairs = 64
    us = 8 + 2 * np.arange(n_pairs)
    z_near = 1.0 + 0.01 * np.arange(n_pairs)
    v = cam.height // 2
    # aim at PIXEL CENTERS so both pair members floor() to the same pixel
    # (corner rays are bit-fragile under the projective round trip)
    xs = (us + 0.5 - cam.cx) / cam.fx
    ys = (v + 0.5 - cam.cy) / cam.fy

    px = np.zeros(capacity, np.float32)
    py = np.zeros(capacity, np.float32)
    pz = np.zeros(capacity, np.float32)
    # far surfels first (low indices), then near
    px[:n_pairs] = xs * (z_near + dz)
    py[:n_pairs] = ys * (z_near + dz)
    pz[:n_pairs] = z_near + dz
    px[n_pairs:2 * n_pairs] = xs * z_near
    py[n_pairs:2 * n_pairs] = ys * z_near
    pz[n_pairs:2 * n_pairs] = z_near

    valid = np.zeros(capacity, bool)
    valid[: 2 * n_pairs] = True
    return store._replace(
        px=jnp.asarray(px), py=jnp.asarray(py), pz=jnp.asarray(pz),
        nz=jnp.where(jnp.asarray(valid), -1.0, 0.0),
        radius=jnp.where(jnp.asarray(valid), 0.01, 0.0),
        conf=jnp.where(jnp.asarray(valid), 1.0, 0.0),
        last_time=jnp.where(jnp.asarray(valid), 1.0, 0.0),
        valid=jnp.asarray(valid),
        count=jnp.int32(2 * n_pairs),
    ), us, v, n_pairs


@pytest.mark.parametrize("capacity", [1 << 22, 9437184])
def test_large_store_depth_resolution(small_cam, capacity):
    """<= 2 mm separation must resolve at 4M+ capacity (the quantized key at
    4.2M had ~9 mm steps; at 9.4M ~35 mm — both would collapse these pairs)."""
    dz = 0.002
    store, us, v, n_pairs = _store_with_pairs(capacity, small_cam, dz)
    imap = rz.predict_indices(
        store, jnp.eye(4), small_cam, time=1, time_delta=200, max_depth=4.5
    )
    idx = np.asarray(imap.index)
    got = idx[v, us]
    expect = n_pairs + np.arange(n_pairs)  # the NEAR surfel of each pair
    np.testing.assert_array_equal(got, expect)


def test_small_store_still_single_pass(small_cam):
    """Small stores keep the packed-key fast path; ordering at sensor-noise
    separation (2 mm) still must resolve (12+ z bits = ~1.1 mm steps)."""
    dz = 0.004
    store, us, v, n_pairs = _store_with_pairs(1 << 16, small_cam, dz)
    imap = rz.predict_indices(
        store, jnp.eye(4), small_cam, time=1, time_delta=200, max_depth=4.5
    )
    got = np.asarray(imap.index)[v, us]
    np.testing.assert_array_equal(got, n_pairs + np.arange(n_pairs))


def test_exact_path_tie_breaks_to_low_index(small_cam):
    """Equal depths: deterministic tie -> smaller index (both paths)."""
    store, us, v, n_pairs = _store_with_pairs(1 << 20, small_cam, 0.0)
    imap = rz.predict_indices(
        store, jnp.eye(4), small_cam, time=1, time_delta=200, max_depth=4.5
    )
    got = np.asarray(imap.index)[v, us]
    np.testing.assert_array_equal(got, np.arange(n_pairs))
