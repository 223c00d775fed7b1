"""Frame preprocessing: bilateral depth filter, intensity conversion, pyramids,
vertex/normal maps, Sobel gradients.

TPU-native equivalents of the reference's GLSL bilateral pass
(Core/Shaders/depth_bilateral_metric.frag:30-76) and CUDA image kernels
(Core/Cuda/cudafuncs.cu: pyrDownGaussF :333-364, pyrDownUcharGauss :534-588,
createVMap :109-150, createNMap :152-205, imageBGRToIntensity :624-653,
computeDerivativeImages :655-715, verticesToDepth :602-622, projectToPointCloud
:718-751, resizeMap :366-445).

Design notes (TPU-first):
  * images are (H, W[, C]) float32; W = 640 = 5*128 keeps the lane dimension aligned;
  * invalid pixels are encoded as explicit boolean `valid` masks + zeroed values,
    NOT NaNs (NaN payloads poison MXU reductions; masks fuse into the elementwise
    pipeline for free);
  * window ops are built from statically-unrolled shifted slices of a padded array —
    XLA fuses the whole stencil into one elementwise loop over VMEM tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cofusion_tpu.config import CameraConfig


def _shifted(x: jnp.ndarray, dy: int, dx: int, fill=0.0) -> jnp.ndarray:
    """x shifted so that out[y, x] = x[y + dy, x + dx], padded with `fill`."""
    H, W = x.shape[:2]
    pad_top = max(0, -dy)
    pad_bot = max(0, dy)
    pad_left = max(0, -dx)
    pad_right = max(0, dx)
    pad = [(pad_top, pad_bot), (pad_left, pad_right)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad, constant_values=fill)
    return jax.lax.slice(
        xp, (pad_top + dy, pad_left + dx) + (0,) * (x.ndim - 2), (pad_top + dy + H, pad_left + dx + W) + x.shape[2:]
    )


def rgb_to_intensity(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB (H, W, 3) uint8/float -> luma, float32 in [0, 255], floor-rounded to
    match the reference's integer cast (cudafuncs.cu:636-638)."""
    rgb = rgb.astype(jnp.float32)
    value = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    return jnp.floor(value)


def bilateral_filter(depth: jnp.ndarray, max_depth: float | jnp.ndarray, radius: int = 6) -> jnp.ndarray:
    """13x13 metric bilateral depth filter.

    sigma_space^2 = 20.25 px^2, sigma_color^2 = 9e-4 m^2; depth outside
    [0.3, max_depth] maps to 0 (invalid) — depth_bilateral_metric.frag:30-76.

    On the TPU backend the 169-tap stencil runs as a VMEM-tiled pallas kernel
    (ops/pallas_stencil.py, bit-exact vs the form below and at timing parity
    with it — see its module docstring for the measurements); other backends
    use the shift-and-accumulate form below.
    """
    if radius == 6:
        import jax as _jax

        if _jax.default_backend() in ("tpu", "axon"):
            from cofusion_tpu.ops.pallas_stencil import (
                bilateral_filter_pallas,
                bilateral_pallas_available,
            )

            if bilateral_pallas_available(depth.shape[0]):
                return bilateral_filter_pallas(depth, max_depth)
    sigma_space2_inv_half = 0.024691358
    sigma_color2_inv_half = 555.556

    center_ok = (depth >= 0.3) & (depth <= max_depth)
    num = jnp.zeros_like(depth)
    den = jnp.zeros_like(depth)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nbr = _shifted(depth, dy, dx, fill=jnp.inf)
            inb = jnp.isfinite(nbr)
            nbr = jnp.where(inb, nbr, 0.0)
            space2 = float(dy * dy + dx * dx)
            color2 = (depth - nbr) ** 2
            w = jnp.exp(-(space2 * sigma_space2_inv_half + color2 * sigma_color2_inv_half))
            w = jnp.where(inb, w, 0.0)
            num = num + nbr * w
            den = den + w
    out = num / jnp.maximum(den, 1e-12)
    return jnp.where(center_ok, out, 0.0)


_BINOMIAL5 = (1.0, 4.0, 6.0, 4.0, 1.0)


def pyr_down_gauss(img: jnp.ndarray, valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Halve resolution with a 5x5 binomial kernel, renormalizing over valid
    (non-zero / in-bounds) samples only (pyrDownGaussF / pyrDownUcharGauss).

    `valid`: which source pixels participate; defaults to img > 0 (the reference
    skips NaN depth and zero intensity).
    """
    if valid is None:
        valid = img > 0
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            w = float(_BINOMIAL5[dy + 2] * _BINOMIAL5[dx + 2])
            nbr = _shifted(img, dy, dx, fill=0.0)
            ok = _shifted(valid.astype(img.dtype), dy, dx, fill=0.0)
            num = num + nbr * ok * w
            den = den + ok * w
    smoothed = num / jnp.maximum(den, 1e-12)
    return smoothed[::2, ::2]


def pyr_down_nearest(img: jnp.ndarray) -> jnp.ndarray:
    """Mask / label pyramid: nearest-neighbor decimation."""
    return img[::2, ::2]


def compute_vmap(
    depth: jnp.ndarray,
    cam: CameraConfig,
    depth_cutoff: float | jnp.ndarray,
    mask_ok: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Back-project a depth map into a camera-frame vertex map.

    Returns (vmap (H, W, 3), valid (H, W)).  Matches computeVmapKernel
    (cudafuncs.cu:109-150) with the mask gate *enabled* (the reference has it
    commented out with a FIXME; per-model tracking needs it, and our masked
    tracking path relies on it — pass mask_ok=None for the ungated behavior).
    """
    H, W = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    valid = (depth > 0) & (depth < depth_cutoff)
    if mask_ok is not None:
        valid = valid & mask_ok
    z = jnp.where(valid, depth, 0.0)
    vx = z * (u - cam.cx) / cam.fx
    vy = z * (v - cam.cy) / cam.fy
    return jnp.stack([vx, vy, z], axis=-1), valid


def compute_nmap(vmap: jnp.ndarray, valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Normals from right/down finite differences: n = norm((v01-v00) x (v10-v00))
    (computeNmapKernel, cudafuncs.cu:152-205).  Normals face +z (away from camera)
    for surfaces seen front-on, matching the reference convention."""
    v00 = vmap
    v01 = _shifted(vmap, 0, 1)
    v10 = _shifted(vmap, 1, 0)
    ok = valid & _shifted(valid, 0, 1, fill=False) & _shifted(valid, 1, 0, fill=False)
    n = jnp.cross(v01 - v00, v10 - v00)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.where((norm > 1e-12) & ok[..., None], n / jnp.maximum(norm, 1e-12), 0.0)
    ok = ok & (norm[..., 0] > 1e-12)
    return n, ok


def sobel_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scharr-style 3x3 derivative images (computeDerivativeImages,
    cudafuncs.cu:655-715; coefficients 0.52201/0.79451, truncated to integers by the
    reference's `short` store — we keep float precision).

    Returns (dIdx, dIdy) UNSCALED (multiply by sobel_scale = 1/8 at use sites,
    matching RGBDOdometry.cpp:32).
    """
    a, b = 0.52201, 0.79451
    left = _shifted(img, 0, -1)
    right = _shifted(img, 0, 1)
    up = _shifted(img, -1, 0)
    down = _shifted(img, 1, 0)
    ul = _shifted(img, -1, -1)
    ur = _shifted(img, -1, 1)
    dl = _shifted(img, 1, -1)
    dr = _shifted(img, 1, 1)
    dIdx = a * (ur - ul) + b * (right - left) + a * (dr - dl)
    dIdy = a * (dl - ul) + b * (down - up) + a * (dr - ur)
    # match the short truncation of the reference store (towards zero)
    return jnp.trunc(dIdx), jnp.trunc(dIdy)


def vertices_to_depth(vmap: jnp.ndarray, valid: jnp.ndarray, max_depth: float) -> jnp.ndarray:
    """Predicted vertex map -> depth image; out-of-range/invalid -> 0
    (verticesToDepth, cudafuncs.cu:602-622)."""
    z = vmap[..., 2]
    ok = valid & (z > 0) & (z < max_depth)
    return jnp.where(ok, z, 0.0)


def project_to_point_cloud(depth: jnp.ndarray, cam: CameraConfig) -> jnp.ndarray:
    """Depth -> camera-frame point cloud (projectToPointCloud, cudafuncs.cu:718-751);
    zero depth yields the zero point (gated by depth > 0 at use sites)."""
    H, W = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = depth * (u - cam.cx) / cam.fx
    y = depth * (v - cam.cy) / cam.fy
    return jnp.stack([x, y, depth], axis=-1)


def resize_map_half(m: jnp.ndarray, valid: jnp.ndarray, normalize: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2x downsample of a vertex/normal map by averaging the valid samples of each
    2x2 block (resizeMapKernel, cudafuncs.cu:366-445)."""
    blocks = jnp.stack([m[0::2, 0::2], m[0::2, 1::2], m[1::2, 0::2], m[1::2, 1::2]], axis=0)
    oks = jnp.stack(
        [valid[0::2, 0::2], valid[0::2, 1::2], valid[1::2, 0::2], valid[1::2, 1::2]], axis=0
    ).astype(m.dtype)
    den = jnp.sum(oks, axis=0)
    avg = jnp.sum(blocks * oks[..., None], axis=0) / jnp.maximum(den[..., None], 1.0)
    ok = den > 0
    if normalize:
        norm = jnp.linalg.norm(avg, axis=-1, keepdims=True)
        avg = jnp.where(norm > 1e-12, avg / jnp.maximum(norm, 1e-12), 0.0)
        ok = ok & (norm[..., 0] > 1e-12)
    return jnp.where(ok[..., None], avg, 0.0), ok


@functools.partial(jax.jit, static_argnames=("levels",))
def depth_pyramid(depth: jnp.ndarray, levels: int = 3) -> tuple[jnp.ndarray, ...]:
    out = [depth]
    for _ in range(levels - 1):
        out.append(pyr_down_gauss(out[-1]))
    return tuple(out)
