"""ops/pallas_splat.py: the VMEM-tiled window-splat kernel must match the XLA
tap loop in rasterize._splat_window_xla on the same candidate geometry.  On
CPU the kernel runs in pallas interpret mode; the real-TPU compile path was
validated on hardware (see the module docstring measurements)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cofusion_tpu.config import CameraConfig
from cofusion_tpu.ops import pallas_splat as ps
from cofusion_tpu.ops import rasterize as rz


@pytest.mark.parametrize("shape", [(2, 48, 64), (1, 32, 40)])
def test_splat_window_pallas_matches_xla(shape, monkeypatch):
    B, H, W = shape
    cam = CameraConfig(width=W, height=H, fx=60.0, fy=60.0, cx=W / 2, cy=H / 2)
    rng = np.random.default_rng(7)

    # candidate disks: positions along each pixel's ray at random depths with
    # random (normalized) normals and radii large enough that windows overlap
    u = np.arange(W, dtype=np.float32)[None, :]
    v = np.arange(H, dtype=np.float32)[:, None]
    z = rng.uniform(0.5, 3.0, size=(B, H, W)).astype(np.float32)
    px = (u - cam.cx) / cam.fx * z
    py = (v - cam.cy) / cam.fy * z
    nr = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    nr[..., 2] -= 1.5  # bias toward camera-facing
    nr /= np.linalg.norm(nr, axis=-1, keepdims=True)
    rad = rng.uniform(0.0, 0.2, size=(B, H, W)).astype(np.float32)
    valid = rng.random((B, H, W)) < 0.6

    cand_pos = jnp.asarray(np.stack([px, py, z], axis=-1))
    cand_norm = jnp.asarray(nr)
    cand_rad = jnp.asarray(rad)
    cand_valid = jnp.asarray(valid)

    # XLA reference (the exact loop splat_from_imap runs off-TPU)
    def shifted_b(x, dy, dx, fill=0.0):
        pt, pb = max(0, -dy), max(0, dy)
        pl_, pr = max(0, -dx), max(0, dx)
        pad = [(0, 0), (pt, pb), (pl_, pr)] + [(0, 0)] * (x.ndim - 3)
        xp = jnp.pad(x, pad, constant_values=fill)
        return jax.lax.slice(
            xp,
            (0, pt + dy, pl_ + dx) + (0,) * (x.ndim - 3),
            (B, pt + dy + H, pl_ + dx + W) + x.shape[3:],
        )

    uu = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    lx = (uu - cam.cx) / cam.fx
    ly = (vv - cam.cy) / cam.fy
    lnorm = jnp.sqrt(lx * lx + ly * ly + 1.0)
    l = jnp.stack([lx / lnorm, ly / lnorm, 1.0 / lnorm], axis=-1)[None]

    r = 3
    normal_rad = jnp.concatenate([cand_norm, cand_rad[..., None]], axis=-1)
    z_ref, tap_ref = rz._splat_window_xla(
        cand_pos, normal_rad, cand_valid, l, shifted_b, r
    )

    # pallas kernel in interpret mode (no TPU on CI)
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig(*a, **dict(kw, interpret=True))
    )
    z_k, tap_k = ps.splat_window_pallas(
        cand_pos, cand_norm, cand_rad, cand_valid, r,
        (cam.fx, cam.fy, cam.cx, cam.cy),
    )

    tap_ref, tap_k = np.asarray(tap_ref), np.asarray(tap_k)
    z_ref, z_k = np.asarray(z_ref), np.asarray(z_k)
    hit = tap_ref >= 0
    assert hit.mean() > 0.3, "test scene produced too few hits to be meaningful"
    np.testing.assert_array_equal(tap_k, tap_ref)
    # z agrees to float32 rounding; FMA-contraction differences between the
    # precomputed pos.normal channel and XLA's per-tap sum amplify by 1/|l.n|
    # on near-grazing rays — winners (taps) are still identical because the
    # winner compare runs on 0.24 mm-quantized z
    np.testing.assert_allclose(z_k[hit], z_ref[hit], rtol=1e-4, atol=1e-5)
    # misses agree too (both inf/-1)
    assert np.all(tap_k[~hit] == -1)
