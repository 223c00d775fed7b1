"""Dense RGB-D frame-to-model odometry: joint point-to-plane ICP + direct photometric
alignment, coarse-to-fine over a 3-level pyramid, with optional SO(3) rotation
pre-alignment — the reference's hot path (Core/Utils/RGBDOdometry.{h,cpp} +
Core/Cuda/reduce.cu) rebuilt TPU-first.

Key architectural difference from the reference: the ENTIRE Gauss-Newton loop runs
inside one XLA program.  The reference downloads a 29-float JtJ/Jtr payload to the
host and LDLT-solves on CPU for every iteration (~38 device->host syncs per model
per frame, reduce.cu:481-499 / RGBDOdometry.cpp:431-446); here the 7x7 normal-matrix
reduction is one tall-skinny matmul on the MXU, the 6x6 solve happens on-device, and
`lax.fori_loop` carries the pose — zero host syncs.

Math parity notes (all conventions match the reference):
  * ICP residual row = [n, s x n, n.(s-d)] in the *previous camera frame*
    (reduce.cu:336-357); association gates dist <= 0.10 m, sin(angle) < sin 20deg
    (reduce.cu:331-333).
  * RGB term: gradient-magnitude-gated photometric correspondences warped by
    K R K^-1 (reduce.cu:785-865), Jacobian rows with weight 1/(sigma+|diff|)
    (reduce.cu:521-604).
  * Combined system A = A_rgbd + w^2 A_icp, b = b_rgbd + w b_icp, w = icpWeight
    (RGBDOdometry.cpp:431-446); update resultRt = exp(xi) * resultRt with
    xi = (t, rodrigues-vec) (OdometryProvider::computeUpdateSE3).
  * SO(3) pre-alignment via image homography at pyramid level 2 with divergence
    rollback (RGBDOdometry.cpp:239-310, reduce.cu:973-1111).

One deliberate divergence: the reference's `initRGB` computes the current frame's
RGB-warp depth from a stale prediction buffer (`vmaps_tmp`, RGBDOdometry.cpp:203-204
NOTE comment); we use the actual current-frame depth, which is what the depth-delta
gate (reduce.cu:838) semantically wants.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cofusion_tpu.config import CameraConfig, CoFusionConfig, TrackingParams
from cofusion_tpu.ops import lie
from cofusion_tpu.ops import preprocess as pp

_HI = jax.lax.Precision.HIGHEST


def _gn_stride(cfg: CoFusionConfig, lvl: int) -> int:
    """Frame-side correspondence decimation per pyramid level (config.py:
    gn_stride_l0/l1 — level 2 always full-res)."""
    if lvl == 0:
        return cfg.gn_stride_l0
    if lvl == 1:
        return cfg.gn_stride_l1
    return 1


# ---------------------------------------------------------------------------
# pyramid containers


class FramePyramid(NamedTuple):
    """Current-frame ("next") tracking inputs; tuples indexed by pyramid level."""

    vmap: tuple      # (H, W, 3) camera-frame vertices (mask-gated)
    nmap: tuple      # (H, W, 3)
    valid: tuple     # (H, W) bool — vertex+normal validity
    depth: tuple     # (H, W) metric depth, 0 = invalid (capped at max_depth_rgb)
    intensity: tuple  # (H, W) float32 luma [0, 255]
    didx: tuple      # (H, W) unscaled Scharr d/dx
    didy: tuple
    rgb_ok: tuple    # (H, W) bool — photometric-validity window gate


class ModelPyramid(NamedTuple):
    """Model-prediction ("last"/"prev") tracking inputs per level.

    `icp_pack` / `rgb_pack` are row-packed flat gather tables rebuilt once per
    solve and reused by every GN iteration: one 8-wide row gather costs about
    half of ONE scalar gather on this TPU, so packing the 7 ICP channels
    (vmap_w, nmap_w, valid) and the 2 RGB channels (depth, intensity) cuts the
    per-iteration gather bill ~5x."""

    vmap_w: tuple    # (H, W, 3) world-frame predicted vertices
    nmap_w: tuple    # (H, W, 3) world-frame predicted normals
    valid: tuple     # (H, W) bool
    depth: tuple     # (H, W) predicted camera-frame depth ("lastDepth")
    intensity: tuple  # (H, W) predicted luma
    icp_pack: tuple  # (H*W, 8) [vx,vy,vz,nx,ny,nz,valid,0]
    rgb_pack: tuple  # (H*W, 2) [depth, intensity]


class OdometryResult(NamedTuple):
    pose: jnp.ndarray       # (4, 4) updated camera/model pose (camera-to-world)
    A: jnp.ndarray          # (6, 6) final combined normal matrix ("lastA")
    b: jnp.ndarray          # (6,)
    icp_error: jnp.ndarray  # sqrt(residual)/count of the final ICP evaluation
    icp_count: jnp.ndarray
    rgb_error: jnp.ndarray
    rgb_count: jnp.ndarray
    so3_error: jnp.ndarray
    # NOTE: the per-pixel ICP error surface the CRF needs is computed separately
    # (icp_error_map_ungated) and only in CRF configurations — recomputing it
    # here for every model every frame would be pure dead work otherwise.


def _rotate(R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(3,3) @ (..., 3) as explicit VPU multiply-adds (full f32, no MXU bf16)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            R[0, 0] * x + R[0, 1] * y + R[0, 2] * z,
            R[1, 0] * x + R[1, 1] * y + R[1, 2] * z,
            R[2, 0] * x + R[2, 1] * y + R[2, 2] * z,
        ],
        axis=-1,
    )


def _gather2d(img: jnp.ndarray, vy: jnp.ndarray, vx: jnp.ndarray) -> jnp.ndarray:
    """img[(vy, vx)] with clipped indices; caller masks out-of-bounds."""
    H, W = img.shape[:2]
    vy = jnp.clip(vy, 0, H - 1)
    vx = jnp.clip(vx, 0, W - 1)
    lin = vy * W + vx
    flat = img.reshape((H * W,) + img.shape[2:])
    return jnp.take(flat, lin.reshape(-1), axis=0).reshape(vy.shape + img.shape[2:])


def _reduce_system(rows: jnp.ndarray, found: jnp.ndarray):
    """Per-pixel Jacobian rows (P, 7) -> (A (6,6), b (6,), err, count).

    The reference reduces a 27-element upper-triangular outer product with warp
    shuffles (reduce.cu:90-255); on TPU the whole thing is one (7xP)@(Px7) matmul
    that the MXU eats whole.  fp32 accumulate, HIGHEST precision.
    """
    rows = jnp.where(found[..., None], rows, 0.0)
    flat = rows.reshape(-1, rows.shape[-1])
    M = jax.lax.dot_general(
        flat, flat, (((0,), (0,)), ((), ())), precision=_HI, preferred_element_type=jnp.float32
    )
    A = M[:6, :6]
    b = M[:6, 6]
    err = M[6, 6]
    count = jnp.sum(found.astype(jnp.float32))
    return A, b, err, count


# ---------------------------------------------------------------------------
# pyramid builders


def _window_ok(ok: jnp.ndarray) -> jnp.ndarray:
    """All-true over the RGB-residual validity window [y-2, y+1] x [x-2, x+1]
    (the reference's asymmetric 4x4 loop, reduce.cu:800-812)."""
    out = ok
    for dy in range(-2, 2):
        for dx in range(-2, 2):
            if dy == 0 and dx == 0:
                continue
            out = out & pp._shifted(ok, dy, dx, fill=False)
    return out


def build_frame_pyramid(
    filtered_depth: jnp.ndarray,
    intensity: jnp.ndarray,
    mask: jnp.ndarray | None,
    mask_id,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    depth_cutoff,
    max_depth_rgb: float = 6.0,
) -> FramePyramid:
    """Build current-frame tracking pyramids.  If `mask` is given, vertex creation
    and the photometric gate are restricted to mask == mask_id (per-model masked
    tracking — Co-Fusion's addition)."""
    levels = cfg.pyramid_levels
    depths = [filtered_depth]
    intens = [intensity]
    masks = [mask] if mask is not None else [None]
    for _ in range(levels - 1):
        depths.append(pp.pyr_down_gauss(depths[-1]))
        intens.append(pp.pyr_down_gauss(intens[-1]))
        masks.append(pp.pyr_down_nearest(masks[-1]) if mask is not None else None)

    vmaps, nmaps, valids, dxs, dys, rgb_oks, dcap = [], [], [], [], [], [], []
    H, W = cam.height, cam.width
    for lvl in range(levels):
        cam_l = cam.at_level(lvl)
        mask_ok = (masks[lvl] == mask_id) if mask is not None else None
        vm, va = pp.compute_vmap(depths[lvl], cam_l, depth_cutoff, mask_ok)
        nm, na = pp.compute_nmap(vm, va)
        vmaps.append(vm)
        nmaps.append(nm)
        valids.append(va & na)
        dx, dy = pp.sobel_gradients(intens[lvl])
        dxs.append(dx)
        dys.append(dy)
        ok = intens[lvl] > 0
        if mask_ok is not None:
            ok = ok & mask_ok
        Hl, Wl = cam_l.height, cam_l.width
        u = jax.lax.broadcasted_iota(jnp.int32, (Hl, Wl), 1)
        v = jax.lax.broadcasted_iota(jnp.int32, (Hl, Wl), 0)
        border = (u < Wl - 5) & (v < Hl - 1)
        rgb_oks.append(_window_ok(ok) & border)
        dcap.append(jnp.where(depths[lvl] < max_depth_rgb, depths[lvl], 0.0))

    return FramePyramid(
        vmap=tuple(vmaps),
        nmap=tuple(nmaps),
        valid=tuple(valids),
        depth=tuple(dcap),
        intensity=tuple(intens),
        didx=tuple(dxs),
        didy=tuple(dys),
        rgb_ok=tuple(rgb_oks),
    )


def mask_window_bounds(mask_pyrs):
    """Shared per-level (min, max) of the int mask over the RGB-residual
    window [y-2, y+1] x [x-2, x+1].  `_window_ok(mask == id)` for ANY id is
    then just `(min == id) & (max == id)` — the 15 window shifts are computed
    ONCE per level instead of once per model per level (out-of-bounds taps
    fill with -1, which can never equal a mask id, reproducing
    `_window_ok`'s fill=False)."""
    out = []
    for m in mask_pyrs:
        mn, mx = m, m
        for dy in range(-2, 2):
            for dx in range(-2, 2):
                if dy == 0 and dx == 0:
                    continue
                s = pp._shifted(m, dy, dx, fill=-1)
                mn = jnp.minimum(mn, s)
                mx = jnp.maximum(mx, s)
        out.append((mn, mx))
    return out


def with_model_mask(frame: FramePyramid, mask_pyrs, model_id, bounds=None) -> FramePyramid:
    """Per-model mask gating applied to a SHARED frame pyramid (Co-Fusion's
    masked tracking, Segmentation-driven):

      * ICP: correspondence validity &= (mask == maskID).  The reference
        intends this gate in createVMap but ships it FIXME-disabled
        (cudafuncs.cu:119); without it a moving object's pixels contaminate
        the background solve (measured: 7 mm/frame camera drift on the
        moving-object test).  Gating validity on the shared pyramid (instead
        of rebuilding masked vertex/normal pyramids per model) keeps the
        expensive pyramid build shared; only boundary-pixel normals differ
        from a fully masked rebuild, and the angle gate screens those.
      * RGB: mask == maskID inside the residual window (reduce.cu:810 — this
        one the reference does apply).  window_ok distributes over &, so
        combining the shared rgb_ok with window_ok(mask == id) is exact."""
    valids = tuple(
        frame.valid[lvl] & (mask_pyrs[lvl] == model_id)
        for lvl in range(len(frame.valid))
    )
    if bounds is not None:
        # shared precomputed window bounds (see mask_window_bounds): the
        # 15-shift erosion collapses to two integer compares per model
        rgb_oks = tuple(
            frame.rgb_ok[lvl]
            & (bounds[lvl][0] == model_id)
            & (bounds[lvl][1] == model_id)
            for lvl in range(len(frame.rgb_ok))
        )
    else:
        rgb_oks = tuple(
            frame.rgb_ok[lvl] & _window_ok(mask_pyrs[lvl] == model_id)
            for lvl in range(len(frame.rgb_ok))
        )
    return frame._replace(valid=valids, rgb_ok=rgb_oks)


def build_frame_pyramid_from_maps(
    vmap_c: jnp.ndarray,
    nmap_c: jnp.ndarray,
    valid: jnp.ndarray,
    intensity: jnp.ndarray,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    max_depth_rgb: float = 6.0,
) -> FramePyramid:
    """FramePyramid from PREDICTED camera-frame maps instead of a raw depth
    frame — the model-to-model odometry's "current" side (the reference's
    splat-prediction initICP variant, RGBDOdometry.cpp:120-141: copyMaps +
    resizeVMap/resizeNMap on the splat textures)."""
    levels = cfg.pyramid_levels
    vms = [jnp.where(valid[..., None], vmap_c, 0.0)]
    nms = [jnp.where(valid[..., None], nmap_c, 0.0)]
    oks = [valid]
    for _ in range(levels - 1):
        vm, ok_v = pp.resize_map_half(vms[-1], oks[-1])
        nm, _ = pp.resize_map_half(nms[-1], oks[-1], normalize=True)
        vms.append(vm)
        nms.append(nm)
        oks.append(ok_v)

    depth0 = pp.vertices_to_depth(vmap_c, valid, max_depth_rgb)
    depths = [depth0]
    intens = [intensity]
    for _ in range(levels - 1):
        depths.append(pp.pyr_down_gauss(depths[-1]))
        intens.append(pp.pyr_down_gauss(intens[-1]))

    dxs, dys, rgb_oks = [], [], []
    for lvl in range(levels):
        dx, dy = pp.sobel_gradients(intens[lvl])
        dxs.append(dx)
        dys.append(dy)
        Hl, Wl = intens[lvl].shape
        u = jax.lax.broadcasted_iota(jnp.int32, (Hl, Wl), 1)
        v = jax.lax.broadcasted_iota(jnp.int32, (Hl, Wl), 0)
        border = (u < Wl - 5) & (v < Hl - 1)
        rgb_oks.append(_window_ok(intens[lvl] > 0) & border)

    return FramePyramid(
        vmap=tuple(vms),
        nmap=tuple(nms),
        valid=tuple(oks),
        depth=tuple(depths),
        intensity=tuple(intens),
        didx=tuple(dxs),
        didy=tuple(dys),
        rgb_ok=tuple(rgb_oks),
    )


def build_model_pyramid(
    pred_vmap: jnp.ndarray,
    pred_nmap: jnp.ndarray,
    pred_valid: jnp.ndarray,
    pred_intensity: jnp.ndarray,
    pose: jnp.ndarray,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    max_depth_rgb: float = 6.0,
) -> ModelPyramid:
    """Model-prediction pyramids (initICPModel + initRGBModel,
    RGBDOdometry.cpp:143-199): camera-frame prediction -> world-frame v/n pyramids
    + predicted-depth / intensity / point-cloud pyramids."""
    levels = cfg.pyramid_levels
    R, t = pose[:3, :3], pose[:3, 3]
    vm_w = _rotate(R, pred_vmap) + t
    nm_w = _rotate(R, pred_nmap)
    vms, nms, oks = [jnp.where(pred_valid[..., None], vm_w, 0.0)], [nm_w], [pred_valid]
    for _ in range(levels - 1):
        vm, ok_v = pp.resize_map_half(vms[-1], oks[-1])
        nm, _ = pp.resize_map_half(nms[-1], oks[-1], normalize=True)
        vms.append(vm)
        nms.append(nm)
        oks.append(ok_v)

    depth0 = pp.vertices_to_depth(pred_vmap, pred_valid, max_depth_rgb)
    depths = [depth0]
    intens = [pred_intensity]
    for _ in range(levels - 1):
        depths.append(pp.pyr_down_gauss(depths[-1]))
        intens.append(pp.pyr_down_gauss(intens[-1]))

    icp_packs = [
        jnp.concatenate(
            [vms[l], nms[l], oks[l][..., None].astype(jnp.float32),
             jnp.zeros_like(depths[l])[..., None]],
            axis=-1,
        ).reshape(-1, 8)
        for l in range(levels)
    ]
    rgb_packs = [
        jnp.stack([depths[l], intens[l]], axis=-1).reshape(-1, 2)
        for l in range(levels)
    ]

    return ModelPyramid(
        vmap_w=tuple(vms),
        nmap_w=tuple(nms),
        valid=tuple(oks),
        depth=tuple(depths),
        intensity=tuple(intens),
        icp_pack=tuple(icp_packs),
        rgb_pack=tuple(rgb_packs),
    )


# ---------------------------------------------------------------------------
# per-level term builders


def _icp_terms(Rcurr, tcurr, Rprev_inv, tprev, frame, model, lvl, cam_l, params,
               stride: int = 1):
    """Projective data association + point-to-plane rows (ICPReduction::search /
    getProducts, reduce.cu:283-394).  Returns (A, b, err, count, dist_map).

    `stride`: correspondence decimation on the frame side (TPU-first
    divergence: at full resolution 1/4 of 307k correspondences still
    over-determines the 6-DoF system by ~4 orders of magnitude; the model side
    stays full-res so association is unchanged).  dist_map is only valid for
    stride == 1."""
    vm_c = frame.vmap[lvl]
    nm_c = frame.nmap[lvl]
    f_ok = frame.valid[lvl]
    H, W = f_ok.shape
    if stride > 1:
        vm_c = vm_c[::stride, ::stride]
        nm_c = nm_c[::stride, ::stride]
        f_ok = f_ok[::stride, ::stride]

    vcurr_g = _rotate(Rcurr, vm_c) + tcurr
    vcurr_cp = _rotate(Rprev_inv, vcurr_g - tprev)
    z = vcurr_cp[..., 2]
    u = jnp.round(vcurr_cp[..., 0] * cam_l.fx / jnp.where(z == 0, 1.0, z) + cam_l.cx).astype(jnp.int32)
    v = jnp.round(vcurr_cp[..., 1] * cam_l.fy / jnp.where(z == 0, 1.0, z) + cam_l.cy).astype(jnp.int32)
    inb = (u >= 0) & (v >= 0) & (u < W) & (v < H) & (z > 0)

    # ONE packed row-gather for the 7 model channels
    lin = jnp.clip(v, 0, H - 1) * W + jnp.clip(u, 0, W - 1)
    rows_m = jnp.take(model.icp_pack[lvl], lin.reshape(-1), axis=0).reshape(
        lin.shape + (8,)
    )
    vprev_g = rows_m[..., 0:3]
    nprev_g = rows_m[..., 3:6]
    m_ok = rows_m[..., 6] > 0.5

    ncurr_g = _rotate(Rcurr, nm_c)
    diff = vprev_g - vcurr_g
    dist = jnp.linalg.norm(diff, axis=-1)
    sine = jnp.linalg.norm(jnp.cross(ncurr_g, nprev_g), axis=-1)

    found = (
        f_ok
        & inb
        & m_ok
        & (sine < params.angle_thresh_sin)
        & (dist <= params.dist_thresh)
    )

    s_cp = _rotate(Rprev_inv, vcurr_g - tprev)
    d_cp = _rotate(Rprev_inv, vprev_g - tprev)
    n_cp = _rotate(Rprev_inv, nprev_g)
    r = jnp.sum(n_cp * (s_cp - d_cp), axis=-1)
    rows = jnp.concatenate(
        [n_cp, jnp.cross(s_cp, n_cp), r[..., None]], axis=-1
    )
    A, b, err, count = _reduce_system(rows, found)
    # per-pixel error surface for segmentation unaries (reduce.cu:301,327): the
    # reference writes `dist` for every pixel whose projection lands in-bounds
    # (even gated-out correspondences) and 0 otherwise
    dist_map = jnp.where(f_ok & inb & m_ok & jnp.isfinite(dist), dist, 0.0)
    return A, b, err, count, dist_map


def _rgb_terms(resultRt, frame, model, lvl, cam_l, params, rgb_only,
               stride: int = 1):
    """Photometric correspondences + Jacobian rows (RGBResidual::getProducts,
    reduce.cu:785-865 + RGBReduction::getProducts, reduce.cu:521-604).
    `stride` decimates the frame-side pixel set (see _icp_terms)."""
    H, W = frame.intensity[lvl].shape
    K = jnp.array(
        [[cam_l.fx, 0.0, cam_l.cx], [0.0, cam_l.fy, cam_l.cy], [0.0, 0.0, 1.0]], jnp.float32
    )
    Kinv = jnp.array(
        [
            [1.0 / cam_l.fx, 0.0, -cam_l.cx / cam_l.fx],
            [0.0, 1.0 / cam_l.fy, -cam_l.cy / cam_l.fy],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    Rt = lie.invert_rt(resultRt)
    R = Rt[:3, :3]
    krkinv = jnp.matmul(jnp.matmul(K, R, precision=_HI), Kinv, precision=_HI)
    kt = jnp.matmul(K, Rt[:3, 3:4], precision=_HI)[:, 0]

    s = stride
    Hs, Ws = (H + s - 1) // s, (W + s - 1) // s
    # pixel coordinates of the strided subset (original-resolution coords)
    x = jax.lax.broadcasted_iota(jnp.float32, (Hs, Ws), 1) * s
    y = jax.lax.broadcasted_iota(jnp.float32, (Hs, Ws), 0) * s
    d1 = frame.depth[lvl][::s, ::s]
    cur_i = frame.intensity[lvl][::s, ::s]
    frame_rgb_ok = frame.rgb_ok[lvl][::s, ::s]

    min_scale = (params.min_grad_mags[lvl] ** 2) / (params.sobel_scale**2)
    didx, didy = frame.didx[lvl][::s, ::s], frame.didy[lvl][::s, ::s]
    grad_ok = (didx * didx + didy * didy) >= min_scale

    td1 = d1 * (krkinv[2, 0] * x + krkinv[2, 1] * y + krkinv[2, 2]) + kt[2]
    td1_safe = jnp.where(td1 == 0, 1.0, td1)
    u0 = jnp.round((d1 * (krkinv[0, 0] * x + krkinv[0, 1] * y + krkinv[0, 2]) + kt[0]) / td1_safe).astype(jnp.int32)
    v0 = jnp.round((d1 * (krkinv[1, 0] * x + krkinv[1, 1] * y + krkinv[1, 2]) + kt[1]) / td1_safe).astype(jnp.int32)
    inb = (u0 >= 0) & (v0 >= 0) & (u0 < W) & (v0 < H)

    lin0 = jnp.clip(v0, 0, H - 1) * W + jnp.clip(u0, 0, W - 1)
    rows_m = jnp.take(model.rgb_pack[lvl], lin0.reshape(-1), axis=0).reshape(
        lin0.shape + (2,)
    )
    d0 = rows_m[..., 0]
    last_i = rows_m[..., 1]
    found = (
        frame_rgb_ok
        & grad_ok
        & (d1 > 0)
        & inb
        & (d0 > 0)
        & (jnp.abs(td1 - d0) <= params.max_depth_delta_rgb)
        & (last_i > 0)
    )
    diff = cur_i - last_i
    sigma = jnp.sum(jnp.where(found, diff * diff, 0.0))
    count = jnp.sum(found.astype(jnp.float32))

    tmp_error = jnp.sqrt(sigma) / jnp.maximum(count, 1.0)
    # sigmaVal quirk preserved from RGBDOdometry.cpp:373-386: pass the inlier COUNT
    # as the Huber offset (or 1 when the error is zero; or uniform weights rgb-only)
    sigma_val = jnp.where(tmp_error == 0, 1.0, count)

    if rgb_only:
        w = jnp.ones_like(diff)
    else:
        wden = sigma_val + jnp.abs(diff)
        w = jnp.where(wden > 1.19209290e-07, 1.0 / wden, 1.0)

    # back-project the gathered depth inline instead of gathering a separate
    # cloud pyramid: cloud[v0,u0] = ((u0-cx)/fx*d0, (v0-cy)/fy*d0, d0) exactly
    cz = d0
    cx_ = (u0.astype(jnp.float32) - cam_l.cx) / cam_l.fx * d0
    cy_ = (v0.astype(jnp.float32) - cam_l.cy) / cam_l.fy * d0
    invz = 1.0 / jnp.where(cz == 0, 1.0, cz)
    dIdx_v = w * params.sobel_scale * didx
    dIdy_v = w * params.sobel_scale * didy
    r0 = dIdx_v * cam_l.fx * invz
    r1 = dIdy_v * cam_l.fy * invz
    r2 = -(r0 * cx_ + r1 * cy_) * invz
    r3 = -cz * r1 + cy_ * r2
    r4 = cz * r0 - cx_ * r2
    r5 = -cy_ * r0 + cx_ * r1
    r6 = -w * diff
    rows = jnp.stack([r0, r1, r2, r3, r4, r5, r6], axis=-1)
    A, b, err, _ = _reduce_system(rows, found)
    return A, b, sigma, count, tmp_error


# ---------------------------------------------------------------------------
# batched-model-axis term builders (one program for all M models)
#
# The per-model GN solves are independent, and at 640x480 each solver pass is
# dominated by per-kernel fixed overhead, not bandwidth — running M models
# UNROLLED multiplies the pass count by M (measured 106 ms for 4 models vs
# 37 ms for 1).  Folding the model axis INTO each pass keeps the pass count
# constant.  The fold is manual: gathers use flat indices with the model id
# folded in (a vmapped gather lowers to XLA's batched form, ~100x off the TPU
# fast path — CLAUDE.md), reductions become one batched MXU dot_general, and
# everything else broadcasts.


def _rotate_bm(R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(M, 3, 3) rotations applied to (M, h, w, 3) or SHARED (h, w, 3) points."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]

    def c(i, j):
        return R[:, i, j][:, None, None]

    return jnp.stack(
        [
            c(0, 0) * x + c(0, 1) * y + c(0, 2) * z,
            c(1, 0) * x + c(1, 1) * y + c(1, 2) * z,
            c(2, 0) * x + c(2, 1) * y + c(2, 2) * z,
        ],
        axis=-1,
    )


def _reduce_system_b(rows: jnp.ndarray, found: jnp.ndarray):
    """(M, h, w, 7) rows -> per-model (A (M,6,6), b (M,6), err (M,), count (M,)):
    ONE batched MXU dot_general instead of M separate reductions."""
    rows = jnp.where(found[..., None], rows, 0.0)
    flat = rows.reshape(rows.shape[0], -1, rows.shape[-1])
    Mm = jax.lax.dot_general(
        flat, flat, (((1,), (1,)), ((0,), (0,))),
        precision=_HI, preferred_element_type=jnp.float32,
    )
    count = jnp.sum(found.astype(jnp.float32), axis=(1, 2))
    return Mm[:, :6, :6], Mm[:, :6, 6], Mm[:, 6, 6], count


def _icp_terms_b(Rcurr, tcurr, Rprev_inv, tprev, vm_c, nm_c, f_ok_b, icp_pack,
                 cam_l, params, stride: int = 1):
    """Batched _icp_terms: poses (M, ...), frame geometry SHARED (h, w, 3),
    per-model validity f_ok_b (M, h, w), model pack (M, Hl*Wl, 8)."""
    H, W = cam_l.height, cam_l.width
    if stride > 1:
        vm_c = vm_c[::stride, ::stride]
        nm_c = nm_c[::stride, ::stride]
        f_ok_b = f_ok_b[:, ::stride, ::stride]
    M = Rcurr.shape[0]
    t_b = tcurr[:, None, None, :]
    vcurr_g = _rotate_bm(Rcurr, vm_c) + t_b
    vcurr_cp = _rotate_bm(Rprev_inv, vcurr_g - tprev[:, None, None, :])
    z = vcurr_cp[..., 2]
    zs = jnp.where(z == 0, 1.0, z)
    u = jnp.round(vcurr_cp[..., 0] * cam_l.fx / zs + cam_l.cx).astype(jnp.int32)
    v = jnp.round(vcurr_cp[..., 1] * cam_l.fy / zs + cam_l.cy).astype(jnp.int32)
    inb = (u >= 0) & (v >= 0) & (u < W) & (v < H) & (z > 0)

    # ONE flat row-gather for all models: model id folds into the row index
    lin = jnp.clip(v, 0, H - 1) * W + jnp.clip(u, 0, W - 1)
    lin = lin + (jnp.arange(M, dtype=jnp.int32) * (H * W))[:, None, None]
    rows_m = jnp.take(icp_pack.reshape(M * H * W, 8), lin.reshape(-1), axis=0).reshape(
        lin.shape + (8,)
    )
    vprev_g = rows_m[..., 0:3]
    nprev_g = rows_m[..., 3:6]
    m_ok = rows_m[..., 6] > 0.5

    ncurr_g = _rotate_bm(Rcurr, nm_c)
    diff = vprev_g - vcurr_g
    dist = jnp.linalg.norm(diff, axis=-1)
    sine = jnp.linalg.norm(jnp.cross(ncurr_g, nprev_g), axis=-1)
    found = (
        f_ok_b & inb & m_ok
        & (sine < params.angle_thresh_sin)
        & (dist <= params.dist_thresh)
    )

    s_cp = _rotate_bm(Rprev_inv, vcurr_g - tprev[:, None, None, :])
    d_cp = _rotate_bm(Rprev_inv, vprev_g - tprev[:, None, None, :])
    n_cp = _rotate_bm(Rprev_inv, nprev_g)
    r = jnp.sum(n_cp * (s_cp - d_cp), axis=-1)
    rows = jnp.concatenate([n_cp, jnp.cross(s_cp, n_cp), r[..., None]], axis=-1)
    A, b, err, count = _reduce_system_b(rows, found)
    dist_map = jnp.where(f_ok_b & inb & m_ok & jnp.isfinite(dist), dist, 0.0)
    return A, b, err, count, dist_map


def _rgb_terms_b(resultRt, frame, rgb_ok_b, rgb_pack, lvl, cam_l, params,
                 rgb_only, stride: int = 1):
    """Batched _rgb_terms: resultRt (M, 4, 4), shared frame images, per-model
    photometric gate rgb_ok_b (M, Hl, Wl) (strided internally like the rest),
    model pack (M, Hl*Wl, 2)."""
    H, W = frame.intensity[lvl].shape
    M = resultRt.shape[0]
    K = jnp.array(
        [[cam_l.fx, 0.0, cam_l.cx], [0.0, cam_l.fy, cam_l.cy], [0.0, 0.0, 1.0]], jnp.float32
    )
    Kinv = jnp.array(
        [
            [1.0 / cam_l.fx, 0.0, -cam_l.cx / cam_l.fx],
            [0.0, 1.0 / cam_l.fy, -cam_l.cy / cam_l.fy],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    Rt = lie.invert_rt(resultRt)                       # (M, 4, 4)
    krkinv = jnp.einsum(
        "ij,mjk,kl->mil", K, Rt[:, :3, :3], Kinv, precision=_HI
    )
    kt = jnp.einsum("ij,mj->mi", K, Rt[:, :3, 3], precision=_HI)

    s = stride
    Hs, Ws = (H + s - 1) // s, (W + s - 1) // s
    x = jax.lax.broadcasted_iota(jnp.float32, (Hs, Ws), 1) * s
    y = jax.lax.broadcasted_iota(jnp.float32, (Hs, Ws), 0) * s
    d1 = frame.depth[lvl][::s, ::s]
    cur_i = frame.intensity[lvl][::s, ::s]
    rgb_ok_s = rgb_ok_b[:, ::s, ::s]

    min_scale = (params.min_grad_mags[lvl] ** 2) / (params.sobel_scale**2)
    didx, didy = frame.didx[lvl][::s, ::s], frame.didy[lvl][::s, ::s]
    grad_ok = (didx * didx + didy * didy) >= min_scale

    def kc(i, j):
        return krkinv[:, i, j][:, None, None]

    td1 = d1 * (kc(2, 0) * x + kc(2, 1) * y + kc(2, 2)) + kt[:, 2][:, None, None]
    td1_safe = jnp.where(td1 == 0, 1.0, td1)
    u0 = jnp.round(
        (d1 * (kc(0, 0) * x + kc(0, 1) * y + kc(0, 2)) + kt[:, 0][:, None, None]) / td1_safe
    ).astype(jnp.int32)
    v0 = jnp.round(
        (d1 * (kc(1, 0) * x + kc(1, 1) * y + kc(1, 2)) + kt[:, 1][:, None, None]) / td1_safe
    ).astype(jnp.int32)
    inb = (u0 >= 0) & (v0 >= 0) & (u0 < W) & (v0 < H)

    lin0 = jnp.clip(v0, 0, H - 1) * W + jnp.clip(u0, 0, W - 1)
    lin0 = lin0 + (jnp.arange(M, dtype=jnp.int32) * (H * W))[:, None, None]
    rows_m = jnp.take(rgb_pack.reshape(M * H * W, 2), lin0.reshape(-1), axis=0).reshape(
        lin0.shape + (2,)
    )
    d0 = rows_m[..., 0]
    last_i = rows_m[..., 1]
    found = (
        rgb_ok_s & grad_ok & (d1 > 0) & inb & (d0 > 0)
        & (jnp.abs(td1 - d0) <= params.max_depth_delta_rgb)
        & (last_i > 0)
    )
    diff = cur_i - last_i
    sigma = jnp.sum(jnp.where(found, diff * diff, 0.0), axis=(1, 2))
    count = jnp.sum(found.astype(jnp.float32), axis=(1, 2))
    tmp_error = jnp.sqrt(sigma) / jnp.maximum(count, 1.0)
    sigma_val = jnp.where(tmp_error == 0, 1.0, count)[:, None, None]

    if rgb_only:
        w = jnp.ones_like(diff)
    else:
        wden = sigma_val + jnp.abs(diff)
        w = jnp.where(wden > 1.19209290e-07, 1.0 / wden, 1.0)

    cz = d0
    cx_ = (u0.astype(jnp.float32) - cam_l.cx) / cam_l.fx * d0
    cy_ = (v0.astype(jnp.float32) - cam_l.cy) / cam_l.fy * d0
    invz = 1.0 / jnp.where(cz == 0, 1.0, cz)
    dIdx_v = w * params.sobel_scale * didx
    dIdy_v = w * params.sobel_scale * didy
    r0 = dIdx_v * cam_l.fx * invz
    r1 = dIdy_v * cam_l.fy * invz
    r2 = -(r0 * cx_ + r1 * cy_) * invz
    r3 = -cz * r1 + cy_ * r2
    r4 = cz * r0 - cx_ * r2
    r5 = -cy_ * r0 + cx_ * r1
    r6 = -w * diff
    rows = jnp.stack([r0, r1, r2, r3, r4, r5, r6], axis=-1)
    A, b, err, _ = _reduce_system_b(rows, found)
    return A, b, sigma, count, tmp_error


def track_models(
    poses: jnp.ndarray,
    frame: FramePyramid,
    valid_b: tuple,
    rgb_ok_b: tuple,
    model_b: ModelPyramid,
    so3_ref_intensity: jnp.ndarray,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    params: TrackingParams,
    icp_weight=None,
) -> OdometryResult:
    """All M models' full GN solves as ONE batched program (see the section
    comment above for why this beats unrolling ~Mx).

    `icp_weight` optionally overrides `params.icp_weight` with a TRACED scalar
    (the reference re-reads its GUI icpWeight Var every frame,
    MainController.cpp:448-473 — hot-tunable without recompilation).  The
    icp-only cutoff (weight >= 100 disables the RGB term) stays a static
    decision from `params` — it selects compiled control flow.

    `poses` (M, 4, 4); `frame` is the SHARED unmasked FramePyramid;
    `valid_b` / `rgb_ok_b` are per-level (M, Hl, Wl) mask-gated validity (the
    only per-model frame state); `model_b` is a ModelPyramid whose leaves have
    a leading (M,) axis (vmapped build_model_pyramid).  The SO(3) pre-align
    runs ONCE — its inputs (coarse intensities) are unmasked and therefore
    identical across models (RGBDOdometry.cpp:239-310 runs per model on the
    same images).  Returns an OdometryResult with (M, ...) leaves."""
    M = poses.shape[0]
    use_icp = not params.rgb_only
    use_rgb = params.rgb_only or params.icp_weight < 100

    tprev = poses[:, :3, 3]
    Rprev_inv = jnp.swapaxes(poses[:, :3, :3], 1, 2)

    levels = cfg.pyramid_levels
    top = levels - 1
    if cfg.use_so3 and use_rgb:
        R_so3, so3_err = _so3_prealign(
            so3_ref_intensity, frame.intensity[top], cam.at_level(top), cfg.so3_iters
        )
    else:
        R_so3, so3_err = jnp.eye(3, dtype=jnp.float32), jnp.float32(0.0)

    resultRt0 = jnp.tile(
        lie.make_rt(R_so3, jnp.zeros(3, jnp.float32))[None], (M, 1, 1)
    )

    if cfg.fast_odom:
        iters = (3, 0, 0)
    else:
        iters = tuple(
            n if (lvl == 0 or cfg.use_pyramid) else 0 for lvl, n in enumerate(cfg.gn_iters)
        )

    zM = jnp.zeros((M,), jnp.float32)
    zero6 = jnp.zeros((M, 6), jnp.float32)
    zero66 = jnp.zeros((M, 6, 6), jnp.float32)
    stats0 = dict(
        A=zero66, b=zero6,
        icp_err=zM, icp_cnt=zM, rgb_err=zM, rgb_cnt=zM,
        last_rgb_err=jnp.full((M,), 3.4e38, jnp.float32),
        stopped=jnp.zeros((M,), bool),
    )
    carry = (resultRt0, stats0)
    eye6 = jnp.eye(6, dtype=jnp.float32)

    for lvl in range(levels - 1, -1, -1):
        cam_l = cam.at_level(lvl)
        n_it = iters[lvl]
        if n_it == 0:
            continue

        def body(carry, lvl=lvl, cam_l=cam_l):
            resultRt, st, done = carry
            currentT = lie.compose(poses, lie.invert_rt(resultRt))
            Rcurr = currentT[:, :3, :3]
            tcurr = currentT[:, :3, 3]
            stride = _gn_stride(cfg, lvl)

            if use_rgb:
                A_rgb, b_rgb, sigma, rgb_cnt, rgb_err = _rgb_terms_b(
                    resultRt, frame, rgb_ok_b[lvl], model_b.rgb_pack[lvl],
                    lvl, cam_l, params, params.rgb_only, stride=stride,
                )
            else:
                A_rgb, b_rgb = zero66, zero6
                rgb_cnt, rgb_err = zM, zM

            if use_icp:
                A_icp, b_icp, icp_err_sq, icp_cnt, _ = _icp_terms_b(
                    Rcurr, tcurr, Rprev_inv, tprev, frame.vmap[lvl],
                    frame.nmap[lvl], valid_b[lvl], model_b.icp_pack[lvl],
                    cam_l, params, stride=stride,
                )
                icp_err = jnp.sqrt(icp_err_sq) / jnp.maximum(icp_cnt, 1.0)
            else:
                A_icp, b_icp = zero66, zero6
                icp_err, icp_cnt = zM, zM

            if use_icp and use_rgb:
                w = params.icp_weight if icp_weight is None else icp_weight
                A = A_rgb + (w * w) * A_icp
                b = b_rgb + (w * w if params.consistent_icp_weighting else w) * b_icp
            elif use_icp:
                A, b = A_icp, b_icp
            else:
                A, b = A_rgb, b_rgb

            stop_now = st["stopped"] | (
                jnp.bool_(params.rgb_only) & (rgb_err > st["last_rgb_err"])
            )
            halt = stop_now | done

            xi = jnp.linalg.solve(A + 1e-12 * eye6[None], b[..., None])[..., 0]
            ok = (
                jnp.all(jnp.isfinite(xi), axis=-1)
                & ((icp_cnt + rgb_cnt) >= params.min_correspondences)
                & (jnp.linalg.norm(xi[:, :3], axis=-1) < params.max_translation_jump)
                & ~halt
            )
            xi = jnp.where(ok[:, None], xi, 0.0)
            resultRt_new = lie.compose(lie.se3_exp_rt(xi), resultRt)
            # per-LEVEL convergence freeze: a model whose update fell below
            # gn_converge_eps (or whose solve is a fixed point: ~ok implies the
            # next iteration recomputes the identical system) is done at this
            # level; the while_loop exits once every model is
            converged = jnp.linalg.norm(xi, axis=-1) < params.gn_converge_eps
            done_new = done | ~ok | converged

            okA = ok[:, None, None]
            st_new = dict(
                A=jnp.where(okA, A, st["A"]),
                b=jnp.where(ok[:, None], b, st["b"]),
                icp_err=jnp.where(halt, st["icp_err"], icp_err),
                icp_cnt=jnp.where(halt, st["icp_cnt"], icp_cnt),
                rgb_err=jnp.where(halt, st["rgb_err"], rgb_err),
                rgb_cnt=jnp.where(halt, st["rgb_cnt"], rgb_cnt),
                last_rgb_err=jnp.where(halt, st["last_rgb_err"], rgb_err),
                stopped=stop_now,
            )
            return (jnp.where(halt[:, None, None], resultRt, resultRt_new), st_new, done_new)

        def cond_fn(c, n_it=n_it):
            i, _, st, done = c
            return (i < n_it) & ~jnp.all(st["stopped"] | done)

        def body_fn(c):
            i, resultRt, st, done = c
            resultRt, st, done = body((resultRt, st, done))
            return (i + 1, resultRt, st, done)

        _, resultRt_c, st_c, _ = jax.lax.while_loop(
            cond_fn, body_fn,
            (jnp.int32(0), carry[0], carry[1], jnp.zeros((M,), bool)),
        )
        carry = (resultRt_c, st_c)

    resultRt, st = carry
    currentT = lie.compose(poses, lie.invert_rt(resultRt))

    if use_rgb:
        jumped = (
            jnp.linalg.norm(currentT[:, :3, 3] - tprev, axis=-1)
            > params.max_translation_jump
        )
        currentT = jnp.where(jumped[:, None, None], poses, currentT)

    return OdometryResult(
        pose=currentT,
        A=st["A"],
        b=st["b"],
        icp_error=st["icp_err"],
        icp_count=st["icp_cnt"],
        rgb_error=st["rgb_err"],
        rgb_count=st["rgb_cnt"],
        so3_error=jnp.broadcast_to(so3_err, (M,)),
    )


def icp_error_maps_b(
    poses_new: jnp.ndarray,
    poses_prev: jnp.ndarray,
    vmap_c: jnp.ndarray,
    nmap_c: jnp.ndarray,
    valid_c: jnp.ndarray,
    model_b: ModelPyramid,
    cam: CameraConfig,
    params: TrackingParams,
    stride: int = 1,
) -> jnp.ndarray:
    """Batched icp_error_map_ungated: (M, H, W) CRF error surfaces in one pass
    (shared ungated frame validity — see icp_error_map_ungated's docstring)."""
    M = poses_new.shape[0]
    f_ok_b = jnp.broadcast_to(valid_c[None], (M,) + valid_c.shape)
    _, _, _, _, dist_map = _icp_terms_b(
        poses_new[:, :3, :3], poses_new[:, :3, 3],
        jnp.swapaxes(poses_prev[:, :3, :3], 1, 2), poses_prev[:, :3, 3],
        vmap_c, nmap_c, f_ok_b, model_b.icp_pack[0],
        cam.at_level(0), params, stride=stride,
    )
    if stride > 1:
        H, W = vmap_c.shape[:2]
        dist_map = jnp.repeat(
            jnp.repeat(dist_map, stride, axis=1), stride, axis=2
        )[:, :H, :W]
    return dist_map


def icp_error_map_ungated(
    pose_new: jnp.ndarray,
    pose_prev: jnp.ndarray,
    vmap_c: jnp.ndarray,
    nmap_c: jnp.ndarray,
    valid_c: jnp.ndarray,
    model: ModelPyramid,
    cam: CameraConfig,
    params: TrackingParams,
    stride: int = 1,
) -> jnp.ndarray:
    """Full-frame per-pixel ICP error at the final pose, WITHOUT mask gating.

    Feeds segmentation unaries.  Masked tracking zeroes a model's error exactly
    where other models' pixels are (they're gated out of its pyramids), which
    makes the background look 'perfect' on top of moving objects and starves
    their labels; the reference avoids this because its vmap mask gate is
    disabled (cudafuncs.cu:119 FIXME) so the global error surface covers all
    pixels.  This pass reproduces that coverage deliberately.

    `stride`: compute the error on a strided pixel subset and nearest-fill
    back to full resolution (TPU-first divergence: the CRF consumes 16x16
    superpixel MEANS of this map, for which a 2x2-strided sample is
    statistically identical at a quarter the cost).
    """
    frame = FramePyramid(
        vmap=(vmap_c,), nmap=(nmap_c,), valid=(valid_c,),
        depth=(None,), intensity=(None,), didx=(None,), didy=(None,), rgb_ok=(None,),
    )
    Rprev_inv = pose_prev[:3, :3].T
    tprev = pose_prev[:3, 3]
    _, _, _, _, dist_map = _icp_terms(
        pose_new[:3, :3], pose_new[:3, 3], Rprev_inv, tprev, frame, model, 0,
        cam.at_level(0), params, stride=stride,
    )
    if stride > 1:
        H, W = vmap_c.shape[:2]
        dist_map = jnp.repeat(
            jnp.repeat(dist_map, stride, axis=0), stride, axis=1
        )[:H, :W]
    return dist_map


def _so3_prealign(ref_intensity, cur_intensity, cam_l, iters: int):
    """Rotation-only image pre-alignment at pyramid level 2
    (RGBDOdometry.cpp:239-310 + SO3Reduction, reduce.cu:973-1111).

    Returns (R (3,3), so3_error)."""
    H, W = ref_intensity.shape
    K = jnp.array(
        [[cam_l.fx, 0.0, cam_l.cx], [0.0, cam_l.fy, cam_l.cy], [0.0, 0.0, 1.0]], jnp.float32
    )
    Kinv = jnp.array(
        [
            [1.0 / cam_l.fx, 0.0, -cam_l.cx / cam_l.fx],
            [0.0, 1.0 / cam_l.fy, -cam_l.cy / cam_l.fy],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)

    def half_grad(img):
        # (back - fore)/2 — note the reference's sign (reduce.cu:990-1005)
        gx = (pp._shifted(img, 0, -1) - pp._shifted(img, 0, 1)) * 0.5
        gy = (pp._shifted(img, -1, 0) - pp._shifted(img, 1, 0)) * 0.5
        return gx, gy

    ref_gx, ref_gy = half_grad(ref_intensity)

    nxt_gx_img, nxt_gy_img = half_grad(cur_intensity)  # loop-invariant

    def body(_, carry):
        R, last_err, last_count, last_R, stopped = carry
        basis = jnp.matmul(jnp.matmul(K, R, precision=_HI), Kinv, precision=_HI)
        krlr = jnp.matmul(K, R, precision=_HI)

        wz = basis[2, 0] * x + basis[2, 1] * y + basis[2, 2]
        wz = jnp.where(wz == 0, 1.0, wz)
        wx = jnp.round((basis[0, 0] * x + basis[0, 1] * y + basis[0, 2]) / wz).astype(jnp.int32)
        wy = jnp.round((basis[1, 0] * x + basis[1, 1] * y + basis[1, 2]) / wz).astype(jnp.int32)
        found = (wx >= 1) & (wx < W - 1) & (wy >= 1) & (wy < H - 1) & (x >= 1) & (x < W - 1) & (y >= 1) & (y < H - 1)

        nxt_gx = _gather2d(nxt_gx_img, wy, wx)
        nxt_gy = _gather2d(nxt_gy_img, wy, wx)
        gx = (nxt_gx + ref_gx) * 0.5
        gy = (nxt_gy + ref_gy) * 0.5

        px = Kinv[0, 0] * x + Kinv[0, 2]
        py = Kinv[1, 1] * y + Kinv[1, 2]
        # point.z == 1 by construction
        a_, b_, c_ = krlr[0, 0], krlr[0, 1], krlr[0, 2]
        d_, e_, f_ = krlr[1, 0], krlr[1, 1], krlr[1, 2]
        g_, h_, i_ = krlr[2, 0], krlr[2, 1], krlr[2, 2]
        lp0 = (d_ * gy + a_ * gx) - (gy * g_ * y) - (gx * g_ * x)
        lp1 = (e_ * gy + b_ * gx) - (gy * h_ * y) - (gx * h_ * x)
        lp2 = (f_ * gy + c_ * gx) - (gy * i_ * y) - (gx * i_ * x)
        # jacRow = leftProduct x point
        j0 = lp1 * 1.0 - lp2 * py
        j1 = lp2 * px - lp0 * 1.0
        j2 = lp0 * py - lp1 * px
        nxt_i = _gather2d(cur_intensity, wy, wx)
        resid = -(nxt_i - ref_intensity)
        rows = jnp.stack([j0, j1, j2, resid], axis=-1)
        rows = jnp.where(found[..., None], rows, 0.0)
        flat = rows.reshape(-1, 4)
        M = jax.lax.dot_general(
            flat, flat, (((0,), (0,)), ((), ())), precision=_HI, preferred_element_type=jnp.float32
        )
        jtj = M[:3, :3]
        jtr = M[:3, 3]
        err_sq = M[3, 3]
        count = jnp.sum(found.astype(jnp.float32))

        so3_err = jnp.sqrt(err_sq) / jnp.maximum(count, 1.0)
        converged = (so3_err < last_err) & (jnp.abs(last_err - count) < 0.001)
        diverging = so3_err > last_err + 0.001

        delta = jnp.linalg.solve(jtj + 1e-12 * jnp.eye(3), jtr)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros(3))
        R_new = jnp.matmul(lie.so3_exp(delta), R, precision=_HI)

        stop_now = stopped | converged | diverging
        R_out = jnp.where(stopped, R, jnp.where(diverging, last_R, jnp.where(converged, R, R_new)))
        err_out = jnp.where(stopped | diverging, last_err, so3_err)
        count_out = jnp.where(stopped | diverging, last_count, count)
        last_R_out = jnp.where(stopped | converged | diverging, last_R, R)
        return (R_out, err_out, count_out, last_R_out, stop_now)

    eye = jnp.eye(3, dtype=jnp.float32)
    init = (eye, jnp.float32(3.4e38 / 2), jnp.float32(3.4e38 / 2), eye, jnp.bool_(False))
    R, err, _, _, _ = jax.lax.fori_loop(0, iters, body, init)
    return R, err


# ---------------------------------------------------------------------------
# the full tracker


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "params"))
def get_incremental_transformation(
    pose_prev: jnp.ndarray,
    frame: FramePyramid,
    model: ModelPyramid,
    so3_ref_intensity: jnp.ndarray,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    params: TrackingParams,
) -> OdometryResult:
    """One full tracking solve; everything device-side.  `pose_prev` is the model's
    pose before this frame (camera-to-world); returns the updated pose.

    `so3_ref_intensity`: the previous frame's intensity at the coarsest level
    (the reference's `lastNextImage`, swapped each frame — RGBDOdometry.cpp:470-474).
    """
    use_icp = not params.rgb_only
    use_rgb = params.rgb_only or params.icp_weight < 100

    Rprev = pose_prev[:3, :3]
    tprev = pose_prev[:3, 3]
    Rprev_inv = Rprev.T

    levels = cfg.pyramid_levels
    top = levels - 1
    if cfg.use_so3 and use_rgb:
        R_so3, so3_err = _so3_prealign(
            so3_ref_intensity, frame.intensity[top], cam.at_level(top), cfg.so3_iters
        )
    else:
        R_so3, so3_err = jnp.eye(3, dtype=jnp.float32), jnp.float32(0.0)

    resultRt0 = lie.make_rt(R_so3, jnp.zeros(3, jnp.float32))

    if cfg.fast_odom:
        iters = (3, 0, 0)
    else:
        iters = tuple(
            n if (lvl == 0 or cfg.use_pyramid) else 0 for lvl, n in enumerate(cfg.gn_iters)
        )

    zero6 = jnp.zeros((6,), jnp.float32)
    zero66 = jnp.zeros((6, 6), jnp.float32)
    stats0 = dict(
        A=zero66, b=zero6,
        icp_err=jnp.float32(0), icp_cnt=jnp.float32(0),
        rgb_err=jnp.float32(0), rgb_cnt=jnp.float32(0),
        last_rgb_err=jnp.float32(3.4e38), stopped=jnp.bool_(False),
    )
    carry = (resultRt0, stats0)

    for lvl in range(levels - 1, -1, -1):
        cam_l = cam.at_level(lvl)
        n_it = iters[lvl]
        if n_it == 0:
            continue

        def body(carry, lvl=lvl, cam_l=cam_l):
            resultRt, st, done = carry
            currentT = lie.compose(pose_prev, lie.invert_rt(resultRt))
            Rcurr = currentT[:3, :3]
            tcurr = currentT[:3, 3]

            if use_rgb:
                A_rgb, b_rgb, sigma, rgb_cnt, rgb_err = _rgb_terms(
                    resultRt, frame, model, lvl, cam_l, params, params.rgb_only,
                    stride=_gn_stride(cfg, lvl),
                )
            else:
                A_rgb, b_rgb = zero66, zero6
                rgb_cnt, rgb_err = jnp.float32(0), jnp.float32(0)

            if use_icp:
                A_icp, b_icp, icp_err_sq, icp_cnt, _ = _icp_terms(
                    Rcurr, tcurr, Rprev_inv, tprev, frame, model, lvl, cam_l, params,
                    stride=_gn_stride(cfg, lvl),
                )
                icp_err = jnp.sqrt(icp_err_sq) / jnp.maximum(icp_cnt, 1.0)
            else:
                A_icp, b_icp = zero66, zero6
                icp_err, icp_cnt = jnp.float32(0), jnp.float32(0)

            if use_icp and use_rgb:
                w = params.icp_weight
                A = A_rgb + (w * w) * A_icp
                b = b_rgb + (w * w if params.consistent_icp_weighting else w) * b_icp
            elif use_icp:
                A, b = A_icp, b_icp
            else:
                A, b = A_rgb, b_rgb

            # rgbOnly early-exit (RGBDOdometry.cpp:376-378)
            stop_now = st["stopped"] | (
                jnp.bool_(params.rgb_only) & (rgb_err > st["last_rgb_err"])
            )
            halt = stop_now | done

            xi = jnp.linalg.solve(A + 1e-12 * jnp.eye(6), b)
            ok = (
                jnp.all(jnp.isfinite(xi))
                & ((icp_cnt + rgb_cnt) >= params.min_correspondences)
                & (jnp.linalg.norm(xi[:3]) < params.max_translation_jump)
                & ~halt
            )
            xi = jnp.where(ok, xi, jnp.zeros(6))
            resultRt_new = lie.compose(lie.se3_exp_rt(xi), resultRt)
            # per-level convergence freeze (see track_models)
            converged = jnp.linalg.norm(xi) < params.gn_converge_eps
            done_new = done | ~ok | converged

            st_new = dict(
                A=jnp.where(ok, A, st["A"]),
                b=jnp.where(ok, b, st["b"]),
                icp_err=jnp.where(halt, st["icp_err"], icp_err),
                icp_cnt=jnp.where(halt, st["icp_cnt"], icp_cnt),
                rgb_err=jnp.where(halt, st["rgb_err"], rgb_err),
                rgb_cnt=jnp.where(halt, st["rgb_cnt"], rgb_cnt),
                last_rgb_err=jnp.where(halt, st["last_rgb_err"], rgb_err),
                stopped=stop_now,
            )
            return (jnp.where(halt, resultRt, resultRt_new), st_new, done_new)

        def cond_fn(c, n_it=n_it):
            i, _, st, done = c
            return (i < n_it) & ~(st["stopped"] | done)

        def body_fn(c):
            i, resultRt, st, done = c
            resultRt, st, done = body((resultRt, st, done))
            return (i + 1, resultRt, st, done)

        _, resultRt_c, st_c, _ = jax.lax.while_loop(
            cond_fn, body_fn,
            (jnp.int32(0), carry[0], carry[1], jnp.bool_(False)),
        )
        carry = (resultRt_c, st_c)

    resultRt, st = carry
    currentT = lie.compose(pose_prev, lie.invert_rt(resultRt))

    # translation-jump sanity reset (RGBDOdometry.cpp:464-467)
    if use_rgb:
        jumped = jnp.linalg.norm(currentT[:3, 3] - tprev) > params.max_translation_jump
        currentT = jnp.where(jumped, pose_prev, currentT)

    return OdometryResult(
        pose=currentT,
        A=st["A"],
        b=st["b"],
        icp_error=st["icp_err"],
        icp_count=st["icp_cnt"],
        rgb_error=st["rgb_err"],
        rgb_count=st["rgb_cnt"],
        so3_error=so3_err,
    )
