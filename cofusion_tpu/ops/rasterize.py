"""Point/splat rasterization of surfel maps — the TPU replacement for the
reference's OpenGL render passes (Core/Model/ModelProjection.{h,cpp} + shaders
index_map.vert, splat.vert, combo_splat.frag).

Two products, mirroring the reference:

  * `predict_indices` — a 1x point render: for each pixel, the index of the
    nearest surfel whose projection lands in it (z-buffered), plus its camera-frame
    attributes.  Drives data association in the fuse pass and the clean pass
    (index_map.vert:38-63; FACTOR == 1, ModelProjection.cpp:22).

  * `splat_predict` — disk splatting: the predicted image/vertex/normal/time maps
    used as tracking targets and for fill-in (splat.vert:54-88 point-size math,
    combo_splat.frag:37-65 ray-disk intersection).

TPU-first design: there is no rasterizer, so the z-buffer is a `scatter-min` over
a packed (depth, index) key and splatting is a *gather*: each output pixel scans a
static (2r+1)^2 neighborhood of the point-rendered index map and intersects its
view ray with the candidate disks, keeping the nearest hit.  This bounds splat
radius by `cfg.splat_radius` pixels (the reference rasterizes arbitrary point
sizes; beyond-window splats only matter for extreme close-ups).  Gather beats
scatter here because every pixel does identical dense work — no atomics, no
collisions, fully vectorized on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cofusion_tpu.config import CameraConfig, CoFusionConfig
from cofusion_tpu.models.surfel_model import SurfelStore
from cofusion_tpu.ops.lie import invert_rt

_HI = jax.lax.Precision.HIGHEST


class IndexMap(NamedTuple):
    """Per-pixel nearest-surfel render (camera frame of the rendering pose)."""

    index: jnp.ndarray      # (H, W) int32, -1 = empty
    vert_conf: jnp.ndarray  # (H, W, 4) camera-frame position + confidence
    normal_rad: jnp.ndarray  # (H, W, 4) camera-frame normal + radius
    color_time: jnp.ndarray  # (H, W, 4) rgb + init_time
    last_time: jnp.ndarray  # (H, W) last-update tick of the rendered surfel
    valid: jnp.ndarray      # (H, W) bool


class SplatMap(NamedTuple):
    """Predicted view (combinedPredict outputs)."""

    image: jnp.ndarray      # (H, W, 3) rgb
    vert_conf: jnp.ndarray  # (H, W, 4)
    normal_rad: jnp.ndarray  # (H, W, 4)
    time: jnp.ndarray       # (H, W) last-update tick
    valid: jnp.ndarray      # (H, W) bool


def _project(local_pos: jnp.ndarray, cam: CameraConfig):
    """Camera-frame points -> continuous pixel coords (u, v) and depth z."""
    z = local_pos[..., 2]
    zs = jnp.where(z == 0, 1.0, z)
    u = local_pos[..., 0] * cam.fx / zs + cam.cx
    v = local_pos[..., 1] * cam.fy / zs + cam.cy
    return u, v, z


def _rotate(R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            R[0, 0] * x + R[0, 1] * y + R[0, 2] * z,
            R[1, 0] * x + R[1, 1] * y + R[1, 2] * z,
            R[2, 0] * x + R[2, 1] * y + R[2, 2] * z,
        ],
        axis=-1,
    )


def predict_indices(
    store: SurfelStore,
    pose: jnp.ndarray,
    cam: CameraConfig,
    time,
    time_delta,
    max_depth,
    conf_threshold=None,
    active_window: bool = True,
) -> IndexMap:
    """Z-buffered 1x point render of the surfel map into the camera at `pose`.

    Gates mirror index_map.vert:45-50: 0 < z <= maxDepth and (when active_window)
    time - last_time <= timeDelta.  `conf_threshold` adds the splat.vert:58 gate
    (used when this render feeds splatting).  Set active_window=False with a
    custom gate for the INACTIVE render (old surfels only) by passing
    conf_threshold and inverting externally — see `splat_predict`.
    """
    H, W = cam.height, cam.width
    t_inv = invert_rt(pose)
    local = _rotate(t_inv[:3, :3], store.pos) + t_inv[:3, 3]
    local_n = _rotate(t_inv[:3, :3], store.normal)
    u, v, z = _project(local, cam)

    ok = store.valid & (z > 0) & (z <= max_depth)
    if active_window:
        ok = ok & ((time - store.last_time) <= time_delta)
    else:
        ok = ok & ((time - store.last_time) > time_delta)
    if conf_threshold is not None:
        ok = ok & (store.conf >= conf_threshold)

    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    inb = (ui >= 0) & (vi >= 0) & (ui < W) & (vi < H)
    ok = ok & inb

    lin = jnp.where(ok, vi * W + ui, H * W)  # out-of-range -> dropped

    # pass 1: scatter-min depth per pixel (the z-buffer)
    zbuf = jnp.full((H * W,), jnp.inf, jnp.float32).at[lin].min(
        jnp.where(ok, z, jnp.inf), mode="drop"
    )
    # pass 2: among depth winners, scatter-min surfel index (deterministic ties)
    zwin = ok & (z <= jnp.take(zbuf, jnp.clip(lin, 0, H * W - 1)))
    n = store.capacity
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    ibuf = jnp.full((H * W,), jnp.int32(n)).at[jnp.where(zwin, lin, H * W)].min(idx, mode="drop")

    index = ibuf.reshape(H, W)
    has = index < n
    index = jnp.where(has, index, 0)

    def take(arr):
        flat = arr.reshape((n,) + arr.shape[1:])
        return jnp.take(flat, index.reshape(-1), axis=0).reshape((H, W) + arr.shape[1:])

    vert_conf = jnp.concatenate([take(local), take(store.conf)[..., None]], axis=-1)
    normal_rad = jnp.concatenate([take(local_n), take(store.radius)[..., None]], axis=-1)
    color_time = jnp.concatenate(
        [take(store.color), take(store.init_time)[..., None]], axis=-1
    )
    return IndexMap(
        index=jnp.where(has, index, -1),
        vert_conf=jnp.where(has[..., None], vert_conf, 0.0),
        normal_rad=jnp.where(has[..., None], normal_rad, 0.0),
        color_time=jnp.where(has[..., None], color_time, 0.0),
        last_time=jnp.where(has, take(store.last_time), 0.0),
        valid=has,
    )


def splat_predict(
    store: SurfelStore,
    pose: jnp.ndarray,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    time,
    time_delta,
    max_depth,
    conf_threshold,
    active_window: bool = True,
) -> SplatMap:
    """Surfel-disk splatting via windowed gather over the point render.

    For each pixel: view ray l = ((u-cx)/fx, (v-cy)/fy, 1)/|.|; for each candidate
    surfel s in the (2r+1)^2 neighborhood of the index render, intersect the ray
    with the disk (combo_splat.frag:37-49): t = (p_s . n_s)/(l . n_s), keep if
    |t l - p_s|^2 <= radius^2, z-test on (t l).z.
    """
    H, W = cam.height, cam.width
    imap = predict_indices(
        store, pose, cam, time, time_delta, max_depth,
        conf_threshold=conf_threshold, active_window=active_window,
    )
    last_t = imap.last_time

    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    lx = (u - cam.cx) / cam.fx
    ly = (v - cam.cy) / cam.fy
    lnorm = jnp.sqrt(lx * lx + ly * ly + 1.0)
    l = jnp.stack([lx / lnorm, ly / lnorm, 1.0 / lnorm], axis=-1)

    r = cfg.splat_radius
    best_z = jnp.full((H, W), jnp.inf)
    best = {
        "pos": jnp.zeros((H, W, 3)),
        "conf": jnp.zeros((H, W)),
        "normal": jnp.zeros((H, W, 3)),
        "radius": jnp.zeros((H, W)),
        "color": jnp.zeros((H, W, 3)),
        "itime": jnp.zeros((H, W)),
        "ltime": jnp.zeros((H, W)),
    }

    def shift(a, dy, dx, fill=0.0):
        from cofusion_tpu.ops.preprocess import _shifted

        return _shifted(a, dy, dx, fill)

    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            cand_ok = shift(imap.valid, dy, dx, False)
            cpos = shift(imap.vert_conf[..., :3], dy, dx)
            cconf = shift(imap.vert_conf[..., 3], dy, dx)
            cnorm = shift(imap.normal_rad[..., :3], dy, dx)
            crad = shift(imap.normal_rad[..., 3], dy, dx)
            ccol = shift(imap.color_time[..., :3], dy, dx)
            citime = shift(imap.color_time[..., 3], dy, dx)
            cltime = shift(last_t, dy, dx)

            ln = jnp.sum(l * cnorm, axis=-1)
            t = jnp.sum(cpos * cnorm, axis=-1) / jnp.where(jnp.abs(ln) < 1e-12, 1.0, ln)
            hit = t[..., None] * l
            d2 = jnp.sum((hit - cpos) ** 2, axis=-1)
            zhit = hit[..., 2]
            good = (
                cand_ok
                & (jnp.abs(ln) >= 1e-12)
                & (d2 <= crad * crad)
                & (zhit > 0)
                & (zhit < best_z)
            )
            best_z = jnp.where(good, zhit, best_z)
            gb = good[..., None]
            best["pos"] = jnp.where(gb, hit, best["pos"])
            best["conf"] = jnp.where(good, cconf, best["conf"])
            best["normal"] = jnp.where(gb, cnorm, best["normal"])
            best["radius"] = jnp.where(good, crad, best["radius"])
            best["color"] = jnp.where(gb, ccol, best["color"])
            best["itime"] = jnp.where(good, citime, best["itime"])
            best["ltime"] = jnp.where(good, cltime, best["ltime"])

    valid = jnp.isfinite(best_z)
    # reference reconstructs the vertex from the corrected depth along the pixel
    # ray (combo_splat.frag:53-55)
    z = jnp.where(valid, best_z, 0.0)
    vx = (u - cam.cx) * z / cam.fx
    vy = (v - cam.cy) * z / cam.fy
    vert = jnp.stack([vx, vy, z], axis=-1)
    return SplatMap(
        image=jnp.where(valid[..., None], best["color"], 0.0),
        vert_conf=jnp.concatenate([vert, best["conf"][..., None]], axis=-1),
        normal_rad=jnp.concatenate(
            [jnp.where(valid[..., None], best["normal"], 0.0), best["radius"][..., None]], axis=-1
        ),
        time=best["ltime"],
        valid=valid,
    )
