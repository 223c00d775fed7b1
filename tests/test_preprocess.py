import jax.numpy as jnp
import numpy as np

from cofusion_tpu.io.synthetic import SyntheticScene
from cofusion_tpu.ops import preprocess as pp


def _np_bilateral(depth, max_depth, radius=6):
    """Brute-force NumPy reference of depth_bilateral_metric.frag."""
    H, W = depth.shape
    out = np.zeros_like(depth)
    ssi, sci = 0.024691358, 555.556
    for y in range(H):
        for x in range(W):
            value = depth[y, x]
            if value > max_depth or value < 0.3:
                continue
            s1 = s2 = 0.0
            for cy in range(max(y - radius, 0), min(y + radius + 1, H)):
                for cx in range(max(x - radius, 0), min(x + radius + 1, W)):
                    tmp = depth[cy, cx]
                    space2 = (x - cx) ** 2 + (y - cy) ** 2
                    color2 = (value - tmp) ** 2
                    w = np.exp(-(space2 * ssi + color2 * sci))
                    s1 += tmp * w
                    s2 += w
            out[y, x] = s1 / s2
    return out


def test_bilateral_matches_bruteforce(rng):
    depth = (1.0 + rng.random((20, 24)) * 2.0).astype(np.float32)
    depth[3, 4] = 0.0  # invalid pixel
    depth[10, 11] = 5.0  # out of range
    got = np.asarray(pp.bilateral_filter(jnp.asarray(depth), 4.0))
    want = _np_bilateral(depth.astype(np.float64), 4.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bilateral_preserves_planes(small_cam):
    depth = np.full(small_cam.shape, 2.0, np.float32)
    out = np.asarray(pp.bilateral_filter(jnp.asarray(depth), 5.0))
    np.testing.assert_allclose(out, 2.0, atol=1e-5)


def test_pyr_down_shapes_and_smoothing(rng):
    img = rng.random((64, 96)).astype(np.float32) + 0.5
    down = np.asarray(pp.pyr_down_gauss(jnp.asarray(img)))
    assert down.shape == (32, 48)
    # interior: close to local mean
    assert abs(down[10:20, 10:30].mean() - img.mean()) < 0.05


def test_pyr_down_ignores_invalid():
    img = np.full((32, 32), 3.0, np.float32)
    img[::2, ::2] = 0.0  # invalid holes
    down = np.asarray(pp.pyr_down_gauss(jnp.asarray(img)))
    np.testing.assert_allclose(down, 3.0, atol=1e-5)


def test_vmap_backprojection(small_cam):
    scene = SyntheticScene()
    rgb, depth, mask = scene.render(small_cam, np.eye(4))
    vmap, valid = pp.compute_vmap(jnp.asarray(depth), small_cam, 10.0)
    vmap = np.asarray(vmap)
    # reproject: u = fx*x/z + cx must equal the pixel coordinate
    z = vmap[..., 2]
    ok = np.asarray(valid)
    u = small_cam.fx * vmap[..., 0] / np.where(ok, z, 1.0) + small_cam.cx
    v = small_cam.fy * vmap[..., 1] / np.where(ok, z, 1.0) + small_cam.cy
    uu, vv = np.meshgrid(np.arange(small_cam.width), np.arange(small_cam.height))
    np.testing.assert_allclose(u[ok], uu[ok], atol=1e-3)
    np.testing.assert_allclose(v[ok], vv[ok], atol=1e-3)


def test_nmap_on_frontal_wall(small_cam):
    # flat wall at z=2 -> normals along +z (reference convention: away from camera)
    depth = np.full(small_cam.shape, 2.0, np.float32)
    vmap, valid = pp.compute_vmap(jnp.asarray(depth), small_cam, 10.0)
    nmap, nvalid = pp.compute_nmap(vmap, valid)
    nmap = np.asarray(nmap)
    ok = np.asarray(nvalid)
    assert ok[:-1, :-1].all()
    np.testing.assert_allclose(
        nmap[ok], np.broadcast_to([0.0, 0.0, 1.0], nmap[ok].shape), atol=1e-4
    )


def test_sobel_gradient_direction():
    # intensity ramp increasing to the right -> dIdx > 0, dIdy == 0
    img = np.tile(np.arange(32, dtype=np.float32) * 8.0, (16, 1))
    dx, dy = pp.sobel_gradients(jnp.asarray(img))
    dx, dy = np.asarray(dx), np.asarray(dy)
    interior = np.s_[2:-2, 2:-2]
    # sum of |coeffs| = 2*(2*0.52201 + 0.79451) = 3.67706; ramp step 8 => dx ~ 29.4
    np.testing.assert_allclose(dx[interior], np.trunc(8 * 2 * (2 * 0.52201 + 0.79451)), atol=1.0)
    np.testing.assert_allclose(dy[interior], 0.0, atol=1e-3)


def test_resize_map_half():
    m = np.zeros((8, 8, 3), np.float32)
    m[..., 2] = 2.0
    valid = np.ones((8, 8), bool)
    valid[0, 1] = False
    half, ok = pp.resize_map_half(jnp.asarray(m), jnp.asarray(valid))
    assert half.shape == (4, 4, 3)
    np.testing.assert_allclose(np.asarray(half)[..., 2], 2.0, atol=1e-6)
    assert np.asarray(ok).all()


def test_intensity_range(rng):
    rgb = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    lum = np.asarray(pp.rgb_to_intensity(jnp.asarray(rgb)))
    assert (lum >= 0).all() and (lum <= 255).all()
    want = np.floor(rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114)
    np.testing.assert_allclose(lum, want, atol=1e-3)
