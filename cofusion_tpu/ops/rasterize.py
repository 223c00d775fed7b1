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
view ray with the candidate disks, keeping the nearest hit.  Gather beats
scatter here because every pixel does identical dense work — no atomics, no
collisions, fully vectorized on the VPU.

Performance rules this file is built around (measured on a v5e, N = 4M):
  * all per-surfel math is COORDINATE-WISE over the store's scalar (N,) arrays —
    slicing/stacking an (N, 3) array relayouts it across lanes at ~60x memory
    bandwidth once it exceeds VMEM (8.9 ms vs 0.05 ms for the same rotate);
  * the z-buffer is ONE flat 1D scatter-min (batched over models by folding the
    model index into the linear pixel index) — vmapping a scatter lowers to
    XLA's batched-dimension form, which is orders of magnitude off the TPU
    fast path (141 ms vs 0.1 ms for a 4x512k index render);
  * per-pixel products (the IndexMap/SplatMap images) stay (H, W[, C]) — they
    fit in VMEM, where relayouts are cheap, and the window passes want them
    dense.
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


def _rotate(R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Stacked-form rotate for SMALL (image-scale or cold-path) arrays."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            R[0, 0] * x + R[0, 1] * y + R[0, 2] * z,
            R[1, 0] * x + R[1, 1] * y + R[1, 2] * z,
            R[2, 0] * x + R[2, 1] * y + R[2, 2] * z,
        ],
        axis=-1,
    )


def _project(local_pos: jnp.ndarray, cam: CameraConfig):
    """Camera-frame points -> continuous pixel coords (u, v) and depth z
    (stacked form, image-scale use only)."""
    z = local_pos[..., 2]
    zs = jnp.where(z == 0, 1.0, z)
    u = local_pos[..., 0] * cam.fx / zs + cam.cx
    v = local_pos[..., 1] * cam.fy / zs + cam.cy
    return u, v, z


def rotate_planar(R, x, y, z, t=None):
    """Coordinate-wise rotate (+ optional translate) of scalar component
    arrays; R is (3, 3) (or (M, 3, 3) with (M, N) components and brc=True
    handled by the caller via reshaped R entries)."""
    ox = R[0, 0] * x + R[0, 1] * y + R[0, 2] * z
    oy = R[1, 0] * x + R[1, 1] * y + R[1, 2] * z
    oz = R[2, 0] * x + R[2, 1] * y + R[2, 2] * z
    if t is not None:
        ox = ox + t[0]
        oy = oy + t[1]
        oz = oz + t[2]
    return ox, oy, oz


def _project_store(store: SurfelStore, pose: jnp.ndarray, cam: CameraConfig):
    """Coordinate-wise camera-frame transform + projection of a whole store.
    Returns (lx, ly, lz, lnx, lny, lnz, ui, vi, inb)."""
    t_inv = invert_rt(pose)
    R, t = t_inv[:3, :3], t_inv[:3, 3]
    lx, ly, lz = rotate_planar(R, store.px, store.py, store.pz, t)
    lnx, lny, lnz = rotate_planar(R, store.nx, store.ny, store.nz)
    zs = jnp.where(lz == 0, 1.0, lz)
    u = lx * cam.fx / zs + cam.cx
    v = ly * cam.fy / zs + cam.cy
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    inb = (ui >= 0) & (vi >= 0) & (ui < cam.width) & (vi < cam.height)
    return lx, ly, lz, lnx, lny, lnz, ui, vi, inb


def _window_gate(store: SurfelStore, time, time_delta, active_window: bool):
    age = time - store.last_time
    return (age <= time_delta) if active_window else (age > time_delta)


def _zkey_bits(capacity: int) -> int:
    """Bits of the packed z-key used for quantized depth: the single int32
    scatter-min key is (zq << idx_bits) | surfel_idx, so nearer-z wins and ties
    break to the smaller index deterministically.  idx_bits = ceil(log2(N));
    the remaining (31 - idx_bits) bits quantize depth (e.g. 12 bits over a
    4.5 m cutoff = 1.1 mm steps — below sensor noise; the reference's GL
    z-buffer ties are rasterization-order nondeterministic, so this is
    stronger, not weaker).  One scatter replaces the reference-style two-pass
    (z scatter-min + index scatter-min + per-surfel z re-read) at a third of
    the cost."""
    idx_bits = max(1, (capacity - 1).bit_length())
    zbits = 31 - idx_bits
    return zbits


def _zbuffer(lin, ok, z, idx_dim, n_buckets, capacity, max_depth):
    """Single-pass packed-key z-buffer: one int32 scatter-min of
    (quantized_z << idx_bits) | idx.  `lin` already carries the fold of any
    batch axes; entries with ~ok must equal n_buckets (dropped).  Returns the
    winner surfel index per bucket (capacity = no winner).

    Capacities beyond 2^19 leave < 12 z-quantization bits in an int32 key:
    steps coarser than ~1.1 mm over a 4.5 m cutoff, degrading toward the fuse
    pass's 10 mm dup gate and 30 mm free-space gate (ops/fusion.py) that
    consume these renders.  Those capacities (including the reference's own
    3072^2 = 9.4M scale, Model.cpp:92-98) take a two-pass EXACT form — float32 z scatter-min, then an index scatter-min
    restricted to entries matching the winning depth (ties break to the
    smaller index, same determinism; full float32 depth resolution, matching
    the reference's 24-bit GL depth test ModelProjection.cpp:105-157) — at ~2x the scatter cost."""
    idx_bits = max(1, (capacity - 1).bit_length())
    zbits = _zkey_bits(capacity)
    idx = jax.lax.broadcasted_iota(jnp.int32, lin.shape, idx_dim)
    if zbits < 12:
        zm = jnp.where(ok, z, jnp.inf)
        zbuf = jnp.full((n_buckets,), jnp.inf).at[lin.reshape(-1)].min(
            zm.reshape(-1), mode="drop"
        )
        win = ok & (z <= jnp.take(zbuf, jnp.clip(lin, 0, n_buckets - 1)))
        return jnp.full((n_buckets,), capacity, jnp.int32).at[lin.reshape(-1)].min(
            jnp.where(win, idx, capacity).reshape(-1), mode="drop"
        )
    zscale = jnp.float32((1 << zbits) - 1)
    zq = jnp.clip(
        (z / jnp.maximum(max_depth, 1e-6)) * zscale, 0.0, zscale
    ).astype(jnp.int32)
    key = (zq << idx_bits) | idx
    init = jnp.int32(2147483647)
    kbuf = jnp.full((n_buckets,), init).at[lin.reshape(-1)].min(
        jnp.where(ok, key, init).reshape(-1), mode="drop"
    )
    has = kbuf != init
    return jnp.where(has, kbuf & ((1 << idx_bits) - 1), capacity)


def _gather_channels(store, lx, ly, lz, lnx, lny, lnz, i0, has, out_shape):
    """Gather the rendered surfel's attributes per pixel as ONE row-packed
    gather (ops/rows.py: gather cost is per ROW, ~independent of width — 13
    scalar takes cost 13x one (N,13) take; the pack itself is an HBM-speed
    relayout)."""
    from cofusion_tpu.ops.rows import take_rows

    (glx, gly, glz, gconf, gnx, gny, gnz, grad, gcr, gcg, gcb, git, glt) = take_rows(
        (lx, ly, lz, store.conf, lnx, lny, lnz, store.radius,
         store.cr, store.cg, store.cb, store.init_time, store.last_time),
        i0,
    )

    def r(a):
        return a.reshape(out_shape)

    hasx = has.reshape(out_shape)
    hx = hasx[..., None]
    vert_conf = jnp.stack([r(glx), r(gly), r(glz), r(gconf)], axis=-1)
    normal_rad = jnp.stack([r(gnx), r(gny), r(gnz), r(grad)], axis=-1)
    color_time = jnp.stack([r(gcr), r(gcg), r(gcb), r(git)], axis=-1)
    return IndexMap(
        index=jnp.where(hasx, i0.reshape(out_shape), -1),
        vert_conf=jnp.where(hx, vert_conf, 0.0),
        normal_rad=jnp.where(hx, normal_rad, 0.0),
        color_time=jnp.where(hx, color_time, 0.0),
        last_time=jnp.where(hasx, r(glt), 0.0),
        valid=hasx,
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
    (used when this render feeds splatting)."""
    H, W = cam.height, cam.width
    n = store.capacity
    lx, ly, lz, lnx, lny, lnz, ui, vi, inb = _project_store(store, pose, cam)

    ok = store.valid & (lz > 0) & (lz <= max_depth) & inb
    ok = ok & _window_gate(store, time, time_delta, active_window)
    if conf_threshold is not None:
        ok = ok & (store.conf >= conf_threshold)

    lin = jnp.where(ok, vi * W + ui, H * W)
    ibuf = _zbuffer(lin, ok, lz, 0, H * W, n, max_depth)
    has = ibuf < n
    i0 = jnp.where(has, ibuf, 0)
    return _gather_channels(store, lx, ly, lz, lnx, lny, lnz, i0, has, (H, W))


def predict_indices_b(
    store: SurfelStore,
    poses: jnp.ndarray,
    cam: CameraConfig,
    time,
    time_delta,
    max_depth: jnp.ndarray,
    conf_threshold: jnp.ndarray | None = None,
    active_window: bool = True,
) -> IndexMap:
    """Batched `predict_indices` over the model axis (store leaves (M, N),
    poses (M, 4, 4), max_depth/conf_threshold (M,)).

    NOT a vmap: the model index is folded into one flat linear pixel index so
    the z-buffer stays a plain 1D scatter-min (a vmapped scatter lowers to
    XLA's batched form, ~2 orders of magnitude off the TPU fast path); the
    attribute gathers are per-model unrolled scalar takes."""
    M, N = store.px.shape
    H, W = cam.height, cam.width
    t_inv = jax.vmap(invert_rt)(poses)

    def rot_b(R, x, y, z, t=None):
        c = lambda i, j: R[:, i, j][:, None]
        ox = c(0, 0) * x + c(0, 1) * y + c(0, 2) * z
        oy = c(1, 0) * x + c(1, 1) * y + c(1, 2) * z
        oz = c(2, 0) * x + c(2, 1) * y + c(2, 2) * z
        if t is not None:
            ox = ox + t[:, 0][:, None]
            oy = oy + t[:, 1][:, None]
            oz = oz + t[:, 2][:, None]
        return ox, oy, oz

    lx, ly, lz = rot_b(t_inv[:, :3, :3], store.px, store.py, store.pz, t_inv[:, :3, 3])
    lnx, lny, lnz = rot_b(t_inv[:, :3, :3], store.nx, store.ny, store.nz)
    zs = jnp.where(lz == 0, 1.0, lz)
    u = lx * cam.fx / zs + cam.cx
    v = ly * cam.fy / zs + cam.cy
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    inb = (ui >= 0) & (vi >= 0) & (ui < W) & (vi < H)

    ok = store.valid & (lz > 0) & (lz <= max_depth[:, None]) & inb
    ok = ok & _window_gate(store, time, time_delta, active_window)
    if conf_threshold is not None:
        ok = ok & (store.conf >= conf_threshold[:, None])

    m_iota = jax.lax.broadcasted_iota(jnp.int32, (M, N), 0)
    lin = jnp.where(ok, m_iota * (H * W) + vi * W + ui, M * H * W)
    # per-model max_depth in the quantizer: use the max so keys stay comparable
    ibuf = _zbuffer(
        lin, ok, lz, 1, M * H * W, N, jnp.max(max_depth)
    ).reshape(M, H * W)
    has = ibuf < N
    i0 = jnp.where(has, ibuf, 0)

    # attribute fetch: the model index folds into the flat source index (an
    # (M, N) leaf reshaped to (M*N,) is contiguous, i.e. free) and ALL 13
    # channels ride ONE row-packed gather (ops/rows.py)
    gi = (
        jax.lax.broadcasted_iota(jnp.int32, (M, H * W), 0) * N + i0
    ).reshape(-1)

    from cofusion_tpu.ops.rows import take_rows

    (glx, gly, glz, gconf, gnx, gny, gnz, grad, gcr, gcg, gcb, git, glt) = take_rows(
        (lx, ly, lz, store.conf, lnx, lny, lnz, store.radius,
         store.cr, store.cg, store.cb, store.init_time, store.last_time),
        gi,
    )

    def r(a):
        return a.reshape(M, H, W)

    hasx = has.reshape(M, H, W)
    hx = hasx[..., None]
    vert_conf = jnp.stack([r(glx), r(gly), r(glz), r(gconf)], axis=-1)
    normal_rad = jnp.stack([r(gnx), r(gny), r(gnz), r(grad)], axis=-1)
    color_time = jnp.stack([r(gcr), r(gcg), r(gcb), r(git)], axis=-1)
    return IndexMap(
        index=jnp.where(hasx, i0.reshape(M, H, W), -1),
        vert_conf=jnp.where(hx, vert_conf, 0.0),
        normal_rad=jnp.where(hx, normal_rad, 0.0),
        color_time=jnp.where(hx, color_time, 0.0),
        last_time=jnp.where(hasx, r(glt), 0.0),
        valid=hasx,
    )


def _splat_window_xla(cand_pos, normal_rad, cand_valid, l, shifted_b, r: int):
    """XLA form of the window sweep: one shifted copy of the packed geometry
    image per tap (the TPU backend uses ops/pallas_splat.py instead — same
    math, VMEM-tiled; tests/test_pallas_splat.py pins the two equal)."""
    B, H, W = cand_valid.shape
    geo = jnp.concatenate(
        [
            cand_pos,
            normal_rad[..., :4],
            cand_valid[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )  # (B, H, W, 8): pos, normal, radius, valid

    best_z = jnp.full((B, H, W), jnp.inf)
    best_zq = jnp.full((B, H, W), jnp.inf)
    best_tap = jnp.full((B, H, W), -1, jnp.int32)
    k = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            g = shifted_b(geo, dy, dx, 0.0)
            cpos = g[..., 0:3]
            cnorm = g[..., 3:6]
            crad = g[..., 6]
            cand_ok = g[..., 7] > 0.5
            ln = jnp.sum(l * cnorm, axis=-1)
            t = jnp.sum(cpos * cnorm, axis=-1) / jnp.where(jnp.abs(ln) < 1e-12, 1.0, ln)
            hit = t[..., None] * l
            d2 = jnp.sum((hit - cpos) ** 2, axis=-1)
            zhit = hit[..., 2]
            # winner compare on QUANTIZED z (0.24 mm buckets), first tap wins
            # ties: candidates on one planar surface intersect the ray at
            # z values equal to the last ulp, so an exact float compare lets
            # reduction-order noise (e.g. sharded scatter-add merges upstream)
            # flip winners pervasively — the z-buffer render is immune for the
            # same reason (quantized key + index tie-break, _zkey_bits)
            zq = jnp.floor(zhit * 4096.0)
            good = (
                cand_ok
                & (jnp.abs(ln) >= 1e-12)
                & (d2 <= crad * crad)
                & (zhit > 0)
                & (zq < best_zq)
            )
            best_zq = jnp.where(good, zq, best_zq)
            best_z = jnp.where(good, zhit, best_z)
            best_tap = jnp.where(good, k, best_tap)
            k += 1
    return best_z, best_tap


def splat_from_imap(
    imap: IndexMap, cam: CameraConfig, cfg: CoFusionConfig, conf_threshold=None
) -> SplatMap:
    """The windowed-gather splatting pass over a point render: for each pixel,
    view ray l = ((u-cx)/fx, (v-cy)/fy, 1)/|.|; for each candidate surfel s in
    the (2r+1)^2 neighborhood of the index render, intersect the ray with the
    disk (combo_splat.frag:37-49): t = (p_s . n_s)/(l . n_s), keep if
    |t l - p_s|^2 <= radius^2, z-test on (t l).z.

    Accepts single (H, W, ...) or batched (M, H, W, ...) index maps — the
    batch folds into flat gather indices (do NOT vmap this function: a vmapped
    gather lowers to XLA's batched form, orders of magnitude off the fast
    path).  Phase 1 is static shifts over a packed geometry image; phase 2
    fetches the winner's 9 attributes with ONE row-packed gather (ops/rows.py).

    `conf_threshold` (scalar or (B,)) applies the splat.vert:58 confidence gate
    at the WINDOW level: candidates below it never splat.  This lets ONE
    all-surfel index render serve both fuse/clean (ungated) and the tracking
    prediction (gated).  Divergence from gating at the index render: a pixel
    whose z-winner is an unconfident surfel occluding a confident one renders
    invalid here instead of showing the confident surfel behind — the two sit
    within millimeters in practice (fresh unstable surfels lie ON the observed
    surface), so the prediction loses the pixel, not accuracy."""
    H, W = cam.height, cam.width
    batched = imap.last_time.ndim == 3
    B = imap.last_time.shape[0] if batched else 1

    def b3(a):  # canonicalize to (B, H, W, ...) leaves
        return a if batched else a[None]

    vert_conf = b3(imap.vert_conf)
    normal_rad = b3(imap.normal_rad)
    color_time = b3(imap.color_time)
    last_time = b3(imap.last_time)
    ivalid = b3(imap.valid)

    def shifted_b(x, dy, dx, fill=0.0):
        # out[b, y, x] = x[b, y+dy, x+dx]
        pt, pb = max(0, -dy), max(0, dy)
        pl, pr = max(0, -dx), max(0, dx)
        pad = [(0, 0), (pt, pb), (pl, pr)] + [(0, 0)] * (x.ndim - 3)
        xp = jnp.pad(x, pad, constant_values=fill)
        return jax.lax.slice(
            xp,
            (0, pt + dy, pl + dx) + (0,) * (x.ndim - 3),
            (B, pt + dy + H, pl + dx + W) + x.shape[3:],
        )

    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    lx = (u - cam.cx) / cam.fx
    ly = (v - cam.cy) / cam.fy
    lnorm = jnp.sqrt(lx * lx + ly * ly + 1.0)
    l = jnp.stack([lx / lnorm, ly / lnorm, 1.0 / lnorm], axis=-1)[None]  # (1,H,W,3)

    r = cfg.splat_radius
    cand_valid = ivalid
    if conf_threshold is not None:
        thr = jnp.asarray(conf_threshold, jnp.float32)
        thr = thr.reshape((B,) + (1,) * 2) if thr.ndim == 1 else thr
        cand_valid = cand_valid & (vert_conf[..., 3] >= thr)

    use_pallas = False
    if jax.default_backend() in ("tpu", "axon"):
        from cofusion_tpu.ops.pallas_splat import (
            splat_window_pallas,
            splat_window_pallas_available,
        )

        use_pallas = splat_window_pallas_available(H, r)
    if use_pallas:
        # the 49-tap sweep as a VMEM-tiled kernel (ops/pallas_splat.py): the
        # XLA form below materializes one ~39 MB shifted copy of the packed
        # geometry per tap at the measured ~75 GB/s shift bandwidth
        best_z, best_tap = splat_window_pallas(
            vert_conf[..., :3], normal_rad[..., :3], normal_rad[..., 3],
            cand_valid, r, (cam.fx, cam.fy, cam.cx, cam.cy),
        )
    else:
        best_z, best_tap = _splat_window_xla(
            vert_conf[..., :3], normal_rad, cand_valid, l, shifted_b, r
        )

    valid = best_tap >= 0
    side = 2 * r + 1
    tap = jnp.maximum(best_tap, 0)
    sy = jnp.clip(
        jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1) + tap // side - r, 0, H - 1
    )
    sx = jnp.clip(
        jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2) + tap % side - r, 0, W - 1
    )
    bofs = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 0) * (H * W)
    src = (bofs + sy * W + sx).reshape(-1)

    from cofusion_tpu.ops.rows import take_rows

    fetched = take_rows(
        (vert_conf[..., 3], normal_rad[..., 0], normal_rad[..., 1],
         normal_rad[..., 2], normal_rad[..., 3], color_time[..., 0],
         color_time[..., 1], color_time[..., 2], last_time),
        src,
    )
    conf, nx_, ny_, nz_, rad, c0, c1, c2, ltime = (
        jnp.where(valid, f.reshape(B, H, W), 0.0) for f in fetched
    )
    col = jnp.stack([c0, c1, c2], axis=-1)

    # reference reconstructs the vertex from the corrected depth along the pixel
    # ray (combo_splat.frag:53-55)
    z = jnp.where(valid, best_z, 0.0)
    vx = (u[None] - cam.cx) * z / cam.fx
    vy = (v[None] - cam.cy) * z / cam.fy
    out = SplatMap(
        image=col,
        vert_conf=jnp.stack([vx, vy, z, conf], axis=-1),
        normal_rad=jnp.stack([nx_, ny_, nz_, rad], axis=-1),
        time=ltime,
        valid=valid,
    )
    if not batched:
        out = jax.tree.map(lambda a: a[0], out)
    return out


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
    """Surfel-disk splatting via windowed gather over the point render."""
    imap = predict_indices(
        store, pose, cam, time, time_delta, max_depth,
        conf_threshold=conf_threshold, active_window=active_window,
    )
    return splat_from_imap(imap, cam, cfg)


def splat_predict_b(
    store: SurfelStore,
    poses: jnp.ndarray,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    time,
    time_delta,
    max_depth: jnp.ndarray,
    conf_threshold: jnp.ndarray,
    active_window: bool = True,
) -> SplatMap:
    """Batched `splat_predict`: flat-index batched point render + batch-aware
    window splatting (splat_from_imap folds the model axis into its gather
    indices — NOT a vmap, which would lower the phase-2 row gather to XLA's
    batched form)."""
    imap = predict_indices_b(
        store, poses, cam, time, time_delta, max_depth,
        conf_threshold=conf_threshold, active_window=active_window,
    )
    return splat_from_imap(imap, cam, cfg)


def splat_merge(a: SplatMap, b: SplatMap) -> SplatMap:
    """Z-merge two splat predictions (nearest valid hit wins) — used to combine
    per-tier renders of the two-tier surfel store into one predicted view."""
    za = jnp.where(a.valid, a.vert_conf[..., 2], jnp.inf)
    zb = jnp.where(b.valid, b.vert_conf[..., 2], jnp.inf)
    pick_a = za <= zb
    sel = lambda x, y: jnp.where(
        pick_a.reshape(pick_a.shape + (1,) * (x.ndim - pick_a.ndim)), x, y
    )
    return SplatMap(
        image=sel(a.image, b.image),
        vert_conf=sel(a.vert_conf, b.vert_conf),
        normal_rad=sel(a.normal_rad, b.normal_rad),
        time=sel(a.time, b.time),
        valid=a.valid | b.valid,
    )
