"""Surfel fusion and map maintenance — TPU rewrite of the reference's OpenGL
transform-feedback passes:

  * data-association pass (Core/Shaders/data.vert:78-211 + host Model.cpp:408-497),
  * update pass (Core/Shaders/update.vert:38-111 + Model.cpp:499-562),
  * clean/copy pass (Core/Shaders/copy_unstable.vert:53-336 + Model.cpp:565-697),
  * first-frame initialisation (vertex_feedback.vert:40-68, init_unstable.vert,
    Model::initialise Model.cpp:227-272).

Mapping to TPU primitives:
  * the data pass's per-pixel +/-2 px index-map search is a static window of
    SHIFTED map reads (25 fused elementwise passes over VMEM-resident images);
  * "render 1 point into the update FBO at the target surfel's texel" becomes a
    SCATTER-FREE reverse-window accumulation: contributions are summed per
    index-map PIXEL (25 masked HBM-speed shifts of one packed contribution
    image) and each surfel fetches its sums with one row-packed gather at its
    own projected pixel (the point render is injective, so pixel sums ARE
    surfel sums) — where the GL path drops colliding updates (last write
    wins), we accumulate ALL of them, a strictly better use of the data
    (documented divergence);
  * "transform feedback + geometry-shader discard + primitive query" becomes
    masked cumsum compaction (models/surfel_model.py:compact);
  * new unstable surfels are appended CONTIGUOUSLY: stable argsort compaction
    + one row gather + one dynamic_update_slice per attribute (no scatters).

Performance rules (measured, see models/surfel_model.py): every per-surfel
quantity is a scalar (N,) array — no (N, 3) slicing/stacking; every
scatter/gather is unbatched 1D (the engine unrolls the static model axis); the
per-surfel window gathers in `clean_eval` read PRE-FLATTENED scalar image
tables so each tap is a handful of bandwidth-speed scalar takes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cofusion_tpu.config import CameraConfig, CoFusionConfig
from cofusion_tpu.models import surfel_model as sm
from cofusion_tpu.models.surfel_model import SurfelStore
from cofusion_tpu.ops.lie import invert_rt
from cofusion_tpu.ops.preprocess import _shifted
from cofusion_tpu.ops.rasterize import IndexMap, _rotate, rotate_planar


class FrameSurfels(NamedTuple):
    """Per-pixel candidate surfels built from the current frame (camera frame)."""

    pos: jnp.ndarray      # (H, W, 3) from RAW depth (data.vert:85-87)
    normal: jnp.ndarray   # (H, W, 3) from FILTERED depth (data.vert:90,97-99)
    color: jnp.ndarray    # (H, W, 3)
    radius: jnp.ndarray   # (H, W)
    conf: jnp.ndarray     # (H, W) radial-Gaussian confidence x weighting
    valid: jnp.ndarray    # (H, W)


class FuseAux(NamedTuple):
    """Where `fuse` appended new surfels, in image space — enough to update an
    index render to the post-fuse map WITHOUT re-rendering (overlay_imap)."""

    new_s: jnp.ndarray   # stagger-subgrid flat bool: appended at this pixel
    dest: jnp.ndarray    # stagger-subgrid flat int32 append row (>=count = dropped)
    count: jnp.ndarray   # () int32 post-append count (rows >= it were dropped)
    phase: jnp.ndarray   # () int32 stagger phase (time % 2)


def _get_vertex(depth, cam: CameraConfig):
    H, W = depth.shape
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    vx = (x - cam.cx) * depth / cam.fx
    vy = (y - cam.cy) * depth / cam.fy
    return jnp.stack([vx, vy, depth], axis=-1)


def _central_normal(vmap):
    """Central-difference normal n = norm((v_xb - v_xf)/2 x (v_yb - v_yf)/2)
    (geometry.glsl getNormal, used by data.vert/vertex_feedback.vert)."""
    del_x = (_shifted(vmap, 0, -1) - _shifted(vmap, 0, 1)) * 0.5
    del_y = (_shifted(vmap, -1, 0) - _shifted(vmap, 1, 0)) * 0.5
    n = jnp.cross(del_x, del_y)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    ok = norm[..., 0] > 1e-12
    return jnp.where(ok[..., None], n / jnp.maximum(norm, 1e-12), 0.0), ok


def _radius(depth, norm_z, cam: CameraConfig):
    """Surfel radius (surfels.glsl getRadius): r = sqrt(2) z / meanFocal, scaled by
    1/|n_z| capped at 2x."""
    mean_focal = cam.mean_focal
    r = depth * jnp.sqrt(2.0) / mean_focal
    rn = r / jnp.maximum(jnp.abs(norm_z), 1e-6)
    return jnp.minimum(2.0 * r, rn)


def _confidence(cam: CameraConfig, weighting):
    """Radial-Gaussian confidence (surfels.glsl:36-46): exp(-d^2 / (2*0.6^2)) with
    d the principal-point distance normalized by maxRadDist=400 (the reference
    hard-codes 400 for 640x480; we scale it to the actual sensor diagonal)."""
    H, W = cam.height, cam.width
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    max_rad = jnp.sqrt((W * 0.5) ** 2 + (H * 0.5) ** 2) * (400.0 / 400.0)
    if W == 640 and H == 480:
        max_rad = 400.0
    d2 = ((x - cam.cx) ** 2 + (y - cam.cy) ** 2) / (max_rad**2)
    return jnp.exp(-d2 / 0.72) * weighting


def make_frame_surfels(
    raw_depth: jnp.ndarray,
    filtered_depth: jnp.ndarray,
    rgb: jnp.ndarray,
    cam: CameraConfig,
    weighting,
    max_depth,
) -> FrameSurfels:
    """Per-pixel surfel candidates (data.vert:84-106 / vertex_feedback.vert):
    position+color from raw depth, normal+radius from filtered depth."""
    vpos = _get_vertex(raw_depth, cam)
    vpos_f = _get_vertex(filtered_depth, cam)
    normal, n_ok = _central_normal(vpos_f)
    radius = _radius(filtered_depth, normal[..., 2], cam)
    conf = _confidence(cam, weighting)
    valid = (raw_depth > 0) & (raw_depth <= max_depth) & n_ok & (filtered_depth > 0)
    return FrameSurfels(
        pos=vpos,
        normal=normal,
        color=rgb.astype(jnp.float32),
        radius=radius,
        conf=conf,
        valid=valid,
    )


def _check_neighbours(raw_depth):
    """4-neighborhood depth-present gate (data.vert checkNeighbours)."""
    ok = raw_depth > 0
    return (
        _shifted(ok, 0, -1, False)
        & _shifted(ok, -1, 0, False)
        & _shifted(ok, 0, 1, False)
        & _shifted(ok, 1, 0, False)
    )


def fuse(
    store: SurfelStore,
    frame: FrameSurfels,
    raw_depth: jnp.ndarray,
    imap: IndexMap,
    mask_ok: jnp.ndarray,
    pose: jnp.ndarray,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    time,
    max_depth,
    return_aux: bool = False,
) -> SurfelStore:
    """One fuse step: associate each (decimated) input pixel with a map surfel via
    the index render, merge matched measurements (confidence-weighted running
    average), append unmatched ones as new unstable surfels.

    `mask_ok`: pixels belonging to this model (data.vert:117 mask == maskID).
    `pose`: model pose (camera-to-world) used to lift measurements to world frame.
    `return_aux`: additionally return FuseAux (image-space append locations) so
    the caller can build the post-fuse index render by overlay (overlay_imap)
    instead of a second z-buffer pass.

    CONTRACT: `imap` must be a genuine `predict_indices(store, pose, ...)`
    render of THIS store at THIS pose — the scatter-free merge lets each
    surfel claim a pixel's accumulated updates by re-projecting itself and
    checking `imap.index[its pixel] == itself` (every call site renders the
    imap from (store, pose) immediately before fusing).
    """
    H, W = raw_depth.shape
    x = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)

    t_i = jnp.asarray(time, jnp.int32)
    stagger = ((x % 2) == (t_i % 2)) & ((y % 2) == (t_i % 2))  # data.vert:116
    z = frame.pos[..., 2]
    cand = (
        stagger
        & mask_ok
        & _check_neighbours(raw_depth)
        & (z > 0)
        & (z <= max_depth)
        & frame.valid
    )

    # --- association: +/-2 px window over the index render (data.vert:124-162).
    # Two-phase tap window (same pattern as rasterize.splat_from_imap): phase 1
    # shifts ONE packed (H, W, 8) candidate image per tap and tracks only
    # (best ray distance, winning tap id); phase 2 fetches the winner's surfel
    # index with one flat gather.  The angle gate |acos(c)| < 0.5 is evaluated
    # as c > cos(0.5) — same predicate, no transcendental per tap per pixel.
    xl = (x.astype(jnp.float32) - cam.cx) / cam.fx
    yl = (y.astype(jnp.float32) - cam.cy) / cam.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    ray = jnp.stack([xl, yl, jnp.ones_like(xl)], axis=-1)
    cos_half = 0.8775825618903728  # cos(0.5 rad), data.vert:150

    cand_pack = jnp.concatenate(
        [
            imap.vert_conf[..., :3],
            imap.normal_rad[..., :3],
            imap.valid[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )  # (H, W, 7): candidate position, normal, validity

    best_dist = jnp.full((H, W), 1000.0)
    best_tap = jnp.full((H, W), -1, jnp.int32)
    r = cfg.assoc_radius
    k = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            g = _shifted(cand_pack, dy, dx, 0.0)
            c_pos = g[..., 0:3]
            c_nrm = g[..., 3:6]
            c_has = g[..., 6] > 0.5
            zdiff = c_pos[..., 2] - z
            depth_ok = jnp.abs(zdiff * lam) < 0.05
            dist = jnp.linalg.norm(jnp.cross(ray, c_pos), axis=-1)
            # normal conformance (data.vert:150): steep surfels must agree
            cosang = jnp.sum(c_nrm * frame.normal, axis=-1)
            norm_ok = (jnp.abs(c_nrm[..., 2]) < 0.75) | (cosang > cos_half)
            better = c_has & depth_ok & norm_ok & (dist < best_dist)
            best_dist = jnp.where(better, dist, best_dist)
            best_tap = jnp.where(better, k, best_tap)
            k += 1

    # --- lift measurements to world frame (data.vert:84-100 applies `pose`).
    # Image-scale stacked math (VMEM-resident) then flatten to scalar columns.
    R = pose[:3, :3]
    t = pose[:3, 3]
    wpos = _rotate(R, frame.pos) + t
    wnorm = _rotate(R, frame.normal)

    # --- stagger-phase subsample: `cand` is nonzero ONLY on the 2x2 subgrid
    # (x%2, y%2) == (t%2, t%2), so the append-path operands shrink 4x
    # STATICALLY by slicing that subgrid out first.  The phase is traced
    # (t%2) — a take along a size-2 axis, not a recompile.
    halved = (H % 2 == 0) and (W % 2 == 0)
    p = t_i % 2

    def sub(img):
        if not halved:
            return img.reshape(H * W)
        r = img.reshape(H // 2, 2, W // 2, 2)
        r = jnp.take(r, p, axis=1)
        return jnp.take(r, p, axis=2).reshape(-1)

    w_cols = {
        "px": sub(wpos[..., 0]), "py": sub(wpos[..., 1]), "pz": sub(wpos[..., 2]),
        "nx": sub(wnorm[..., 0]), "ny": sub(wnorm[..., 1]), "nz": sub(wnorm[..., 2]),
        "cr": sub(frame.color[..., 0]), "cg": sub(frame.color[..., 1]),
        "cb": sub(frame.color[..., 2]),
        "radius": sub(frame.radius),
    }
    cand_s = sub(cand)
    conf_s = sub(frame.conf)
    # a matched tap always points at a valid render pixel (c_has fed `better`),
    # so merge/new split on the tap alone — no winner-index gather needed
    merge_s = cand_s & (sub(best_tap) >= 0)
    new_s = cand_s & (sub(best_tap) < 0)

    # --- update pass, SCATTER-FREE (round 5).  The point render is injective:
    # each surfel occupies exactly one index-map pixel (it was scattered to a
    # single bucket and won it), so per-SURFEL accumulation is per-PIXEL
    # accumulation at the winner's pixel.  Reverse the association window —
    #   acc[p] = sum over taps k of contrib[q]  where q + off_k = p and
    #            best_tap[q] == k
    # — 25 masked HBM-speed shifts of ONE packed (H, W, 11) contribution image
    # — then every surfel FETCHES its sums with one row-packed gather at its
    # own projected pixel, claiming them iff it is that pixel's render winner.
    # Replaces 11 x 77k-row 1D scatter-adds (~5 ns/row, the round-4 fuse cost)
    # with bandwidth-speed image work + one N-row gather.
    n = store.capacity
    merge_full = cand & (best_tap >= 0)
    a_full = jnp.where(merge_full, frame.conf, 0.0)
    contrib = jnp.stack(
        [
            a_full,
            a_full * wpos[..., 0], a_full * wpos[..., 1], a_full * wpos[..., 2],
            a_full * frame.radius,
            a_full * frame.color[..., 0], a_full * frame.color[..., 1],
            a_full * frame.color[..., 2],
            a_full * wnorm[..., 0], a_full * wnorm[..., 1], a_full * wnorm[..., 2],
        ],
        axis=-1,
    )  # (H, W, 11): weight, then weighted px,py,pz,radius,cr,cg,cb,nx,ny,nz
    acc_img = jnp.zeros((H, W, 11), jnp.float32)
    k = 0
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            sel = (best_tap == k)[..., None]
            acc_img = acc_img + _shifted(
                jnp.where(sel, contrib, 0.0), -dy, -dx, 0.0
            )
            k += 1

    # per-surfel fetch: project the store with the SAME math as the index
    # render (rasterize._project_store) — surfel s won pixel lin_s iff
    # imap.index[lin_s] == s (out-of-bounds / gated-out surfels were never
    # scattered, so their clamped pixel's winner is a different index and the
    # claim fails naturally).  Winner index rides the same row gather as the
    # 11 sums (float32 is exact through 2^24 >> capacity).
    from cofusion_tpu.ops.rasterize import _project_store
    from cofusion_tpu.ops.rows import take_rows

    _, _, _, _, _, _, uis, vis, _ = _project_store(store, pose, cam)
    lin_s = jnp.clip(vis, 0, H - 1) * W + jnp.clip(uis, 0, W - 1)
    fetch = take_rows(
        [acc_img[..., c] for c in range(11)]
        + [imap.index.reshape(-1).astype(jnp.float32)],
        lin_s,
    )
    won = fetch[-1] == jnp.arange(n, dtype=jnp.float32)
    sum_a = jnp.where(won, fetch[0], 0.0)
    _keys = ("px", "py", "pz", "radius", "cr", "cg", "cb", "nx", "ny", "nz")
    sums = {key: jnp.where(won, fetch[1 + i], 0.0) for i, key in enumerate(_keys)}

    hit = sum_a > 0
    a_tot = jnp.maximum(sum_a, 1e-12)
    c_k = store.conf
    denom = jnp.maximum(c_k + sum_a, 1e-12)
    new_rad = sums["radius"] / a_tot
    # radius-growth gate (update.vert:70): only average geometry if the incoming
    # radius is not 1.5x larger than the stored one
    grow_ok = hit & (new_rad < 1.5 * store.radius)

    def merge_attr(old, key):
        avg = (c_k * old + sums[key]) / denom  # sums[key] = sum_a * weighted-mean
        return jnp.where(grow_ok, avg, old)

    px_u = merge_attr(store.px, "px")
    py_u = merge_attr(store.py, "py")
    pz_u = merge_attr(store.pz, "pz")
    cr_u = merge_attr(store.cr, "cr")
    cg_u = merge_attr(store.cg, "cg")
    cb_u = merge_attr(store.cb, "cb")
    nx_u = merge_attr(store.nx, "nx")
    ny_u = merge_attr(store.ny, "ny")
    nz_u = merge_attr(store.nz, "nz")
    nlen = jnp.sqrt(nx_u * nx_u + ny_u * ny_u + nz_u * nz_u)
    n_ok = nlen > 1e-12
    nls = jnp.maximum(nlen, 1e-12)
    nx_u = jnp.where(n_ok, nx_u / nls, store.nx)
    ny_u = jnp.where(n_ok, ny_u / nls, store.ny)
    nz_u = jnp.where(n_ok, nz_u / nls, store.nz)
    rad_u = jnp.where(grow_ok, (c_k * store.radius + sums["radius"]) / denom, store.radius)

    tf = jnp.asarray(time, jnp.float32)
    updated = store._replace(
        px=px_u, py=py_u, pz=pz_u,
        nx=nx_u, ny=ny_u, nz=nz_u,
        cr=cr_u, cg=cg_u, cb=cb_u,
        radius=rad_u,
        conf=jnp.where(hit, c_k + sum_a, c_k),
        last_time=jnp.where(hit, tf, store.last_time),
    )

    # --- new unstable surfels: appended rows are CONTIGUOUS
    # ([count, count+appended)), so the 13 x 77k-row 1D scatter-sets become:
    # ONE stable argsort (new pixels first, pixel order — so sorted row i IS
    # rank i; sorting is cheap, ~1.3 ms/512k keys), ONE row-packed gather of
    # the 11 attribute channels, and one contiguous dynamic_update_slice per
    # attribute into a P-padded copy (sorted rows beyond `appended` carry
    # non-new-pixel garbage, but they land at indices >= new_count — the
    # invalid region the valid-prefix invariant masks everywhere; padding by P
    # keeps the dynamic offset from ever clamping near capacity).
    rank = jnp.cumsum(new_s.astype(jnp.int32)) - 1
    dest = jnp.where(new_s, store.count + rank, n)
    appended = jnp.sum(new_s.astype(jnp.int32))
    new_count = jnp.minimum(store.count + appended, n)

    P = new_s.shape[0]
    order = jnp.argsort(jnp.where(new_s, 0, 1).astype(jnp.int32), stable=True)
    (apx, apy, apz, anx, any_, anz, acr, acg, acb, arad, aconf) = take_rows(
        (w_cols["px"], w_cols["py"], w_cols["pz"], w_cols["nx"], w_cols["ny"],
         w_cols["nz"], w_cols["cr"], w_cols["cg"], w_cols["cb"],
         w_cols["radius"], conf_s),
        order,
    )
    tf_rows = jnp.full((P,), tf)

    def put(base, rows):
        padded = jnp.concatenate([base, jnp.zeros((P,), jnp.float32)])
        return jax.lax.dynamic_update_slice(padded, rows, (store.count,))[:n]

    out = SurfelStore(
        px=put(updated.px, apx),
        py=put(updated.py, apy),
        pz=put(updated.pz, apz),
        nx=put(updated.nx, anx),
        ny=put(updated.ny, any_),
        nz=put(updated.nz, anz),
        cr=put(updated.cr, acr),
        cg=put(updated.cg, acg),
        cb=put(updated.cb, acb),
        radius=put(updated.radius, arad),
        conf=put(updated.conf, aconf),
        init_time=put(updated.init_time, tf_rows),
        last_time=put(updated.last_time, tf_rows),
        valid=jnp.arange(n) < new_count,
        count=new_count,
    )
    if return_aux:
        return out, FuseAux(new_s=new_s, dest=dest, count=new_count, phase=p)
    return out


def overlay_imap(
    fused: SurfelStore,
    imap: IndexMap,
    aux: FuseAux,
    frame: FrameSurfels,
    pose: jnp.ndarray,
    cam: CameraConfig,
    time,
) -> IndexMap:
    """Index render of the POST-fuse map from the PRE-fuse render + the fuse
    result — no second z-buffer pass.

    The reference re-renders predictIndices between fuse and clean
    (CoFusion.cpp:474); on this platform that second render is most of the
    fuse/clean cost (scatter-min + winner/attribute gathers over the whole
    active tier).  Fuse only changes the map two ways, both pixel-local:

      * MERGED surfels keep their pixel (position nudges are sub-pixel — the
        association window is +/-2 px at <=5 cm depth agreement, data.vert:
        124-162) but change attributes -> patch every winner's channels with
        one row gather from the post-fuse store;
      * APPENDED surfels live at known stagger-subgrid pixels with the frame's
        own camera-local attributes -> composite them with a per-pixel z-test
        against the patched winner (tie -> existing surfel, matching the
        z-buffer's low-index tie rule).

    Divergence from an exact re-render: a merged surfel whose position nudge
    crosses a pixel boundary stays at its old pixel for this frame's clean
    (bounded by the merge gates above; self-corrects at the next frame's
    render)."""
    from cofusion_tpu.ops.rows import take_rows

    H, W = cam.height, cam.width
    n = fused.capacity

    # --- patch winners with post-fuse attributes (ONE row gather) ----------
    i0 = jnp.where(imap.valid, imap.index, 0).reshape(-1)
    (px, py, pz, conf, nx, ny, nz, rad, cr, cg, cb, it, lt) = take_rows(
        (fused.px, fused.py, fused.pz, fused.conf, fused.nx, fused.ny,
         fused.nz, fused.radius, fused.cr, fused.cg, fused.cb,
         fused.init_time, fused.last_time),
        i0,
    )
    t_inv = invert_rt(pose)
    lx, ly, lz = rotate_planar(t_inv[:3, :3], px, py, pz, t_inv[:3, 3])
    lnx, lny, lnz = rotate_planar(t_inv[:3, :3], nx, ny, nz)

    def img(a):
        return a.reshape(H, W)

    has = imap.valid

    # --- composite appended surfels at their source pixels -----------------
    p = aux.phase
    if aux.new_s.shape[0] == H * W:  # odd dims: fuse used the full grid
        new_img = aux.new_s.reshape(H, W)
        dest_img = aux.dest.reshape(H, W)
    else:
        sel = jnp.arange(2) == p
        m2 = sel[:, None] & sel[None, :]  # one-hot (2, 2) at (phase, phase)

        def unsub(gv, fill):
            g = gv.reshape(H // 2, W // 2)
            out = jnp.where(m2[None, :, None, :], g[:, None, :, None], fill)
            return out.reshape(H, W)

        new_img = unsub(aux.new_s, False)
        dest_img = unsub(aux.dest, n)
    app = new_img & (dest_img < aux.count)
    app_z = frame.pos[..., 2]
    # z-test vs the patched winner; ties keep the existing (lower-index) surfel
    app_win = app & (~has | (app_z < img(lz)))

    tf = jnp.asarray(time, jnp.float32)

    def ch(winner, appended):
        return jnp.where(app_win, appended, jnp.where(has, winner, 0.0))

    vert_conf = jnp.stack(
        [ch(img(lx), frame.pos[..., 0]), ch(img(ly), frame.pos[..., 1]),
         ch(img(lz), app_z), ch(img(conf), frame.conf)],
        axis=-1,
    )
    normal_rad = jnp.stack(
        [ch(img(lnx), frame.normal[..., 0]), ch(img(lny), frame.normal[..., 1]),
         ch(img(lnz), frame.normal[..., 2]), ch(img(rad), frame.radius)],
        axis=-1,
    )
    color_time = jnp.stack(
        [ch(img(cr), frame.color[..., 0]), ch(img(cg), frame.color[..., 1]),
         ch(img(cb), frame.color[..., 2]), ch(img(it), tf)],
        axis=-1,
    )
    return IndexMap(
        index=jnp.where(app_win, dest_img, jnp.where(has, imap.index, -1)),
        vert_conf=vert_conf,
        normal_rad=normal_rad,
        color_time=color_time,
        last_time=ch(img(lt), tf),
        valid=has | app_win,
    )


def clean_eval(
    store: SurfelStore,
    imap: IndexMap,
    depth_input: jnp.ndarray,
    mask: jnp.ndarray | None,
    mask_id,
    pose: jnp.ndarray,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    time,
    time_delta,
    conf_threshold,
    outlier_coeff,
    is_lost=False,
) -> tuple[SurfelStore, jnp.ndarray]:
    """Clean/copy pass predicates (copy_unstable.vert:53-150): duplicate
    suppression, unstable-timeout removal, free-space-violation confidence decay,
    mask-mismatch penalty.  Returns (store with decayed confidences, keep mask);
    `clean` composes this with stream compaction, the engine's two-tier path
    composes it with `surfel_model.expel_split`.

    `imap` must be a FRESH index render at the post-tracking pose (the reference
    re-renders predictIndices between fuse and clean, CoFusion.cpp:474).
    `depth_input` is the current filtered depth; `mask` the frame's model-id mask.

    The per-surfel 5x5/3x3 window lookups gather from PRE-FLATTENED scalar
    image tables; the dup predicates' pixel channels are pre-combined so each
    tap costs 5 scalar takes (z-if-dup-eligible, z-if-zdup-eligible, init-time,
    x, y) instead of 7+ raw channels.
    """
    H, W = cam.height, cam.width
    n = store.capacity
    t_inv = invert_rt(pose)
    lx, ly, zl = rotate_planar(t_inv[:3, :3], store.px, store.py, store.pz, t_inv[:3, 3])
    _, _, lnz = rotate_planar(t_inv[:3, :3], store.nx, store.ny, store.nz)
    zs = jnp.where(zl == 0, 1.0, zl)
    xpix = lx * cam.fx / zs + cam.cx
    ypix = ly * cam.fy / zs + cam.cy
    xi = jnp.floor(xpix).astype(jnp.int32)
    yi = jnp.floor(ypix).astype(jnp.int32)
    inb = (xpix > 0) & (ypix > 0) & (xpix < W) & (ypix < H) & (zl > 0)
    in_window = (time - store.last_time) < time_delta
    search_ok = store.valid & in_window & inb

    lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)

    # --- window taps as ONE row-packed gather set (ops/rows.py).  Every tap
    # (dy, dx) needs table[lin + off]; with SHIFTED tables that is
    # shifted_table[lin] — the SAME index set for all 9 taps — so the whole
    # 3x3 dup window (5 channels/tap) + the 3x3 free-space depth window
    # (1 channel/tap) + the mask channel fold into 55 shifted channels
    # gathered by ceil(55/14) = 4 row gathers instead of ~55 scalar gathers
    # (measured: gather cost is per ROW, ~independent of width to ~16 ch).
    # The reference's dup window is +/-1 px at half-pixel steps
    # (copy_unstable.vert:76-78,87-88: windowMultiplier=2, indexStep=0.5 px) —
    # 9 distinct texels, matching this 3x3 tap set.
    imap_has = imap.valid
    q_conf_ok = imap_has & (imap.vert_conf[..., 3] > conf_threshold)
    zq = imap.vert_conf[..., 2]
    # dup candidates: rendered, confident -> z; else -inf (kills every compare)
    z_dup_img = jnp.where(q_conf_ok, zq, -jnp.inf)
    # z-dup additionally requires the rendered surfel updated THIS tick
    z_zdup_img = jnp.where(q_conf_ok & (imap.last_time == time), zq, -jnp.inf)
    it_img = jnp.where(imap_has, imap.color_time[..., 3], jnp.inf)
    qx_img = imap.vert_conf[..., 0]
    qy_img = imap.vert_conf[..., 1]

    taps = [(dy, dx) for dy in range(-1, 2) for dx in range(-1, 2)]
    chans = []
    for dy, dx in taps:
        chans.append(_shifted(z_dup_img, dy, dx, -jnp.inf))
        chans.append(_shifted(z_zdup_img, dy, dx, -jnp.inf))
        chans.append(_shifted(it_img, dy, dx, jnp.inf))
        chans.append(_shifted(qx_img, dy, dx, 0.0))
        chans.append(_shifted(qy_img, dy, dx, 0.0))
        chans.append(_shifted(depth_input, dy, dx, 0.0))
    if mask is not None:
        chans.append(mask.astype(jnp.float32))
    from cofusion_tpu.ops.rows import take_rows

    fetched = take_rows(chans, lin)

    count = jnp.zeros((n,), jnp.int32)
    z_count = jnp.zeros((n,), jnp.int32)
    violations = jnp.zeros((n,), jnp.int32)
    viol_sum = jnp.zeros((n,), jnp.float32)

    steep = jnp.abs(lnz) > 0.85
    rad_gate = store.radius * 1.4
    for k, (dy, dx) in enumerate(taps):
        zd, zz, it, qx, qy, d = fetched[6 * k : 6 * k + 6]
        oob = (
            (xi + dx < 0) | (xi + dx >= W) | (yi + dy < 0) | (yi + dy >= H)
        )
        ok_tap = ~oob & search_ok
        # duplicate: older, confident, behind, close, within radius
        dup = (
            ok_tap
            & (it < store.init_time)
            & (zd > zl)
            & (zd - zl < 0.01)
            & ((qx - lx) ** 2 + (qy - ly) ** 2 < rad_gate * rad_gate)
        )
        count = count + dup.astype(jnp.int32)
        zdup = (
            ok_tap
            & (zz > zl)
            & (zz - zl > 0.01)
            & steep
        )
        z_count = z_count + zdup.astype(jnp.int32)
        # free-space violation: observed depth beyond the surfel by >3cm
        viol = ok_tap & (d - zl > 0.03) & (d > 0)
        violations = violations + viol.astype(jnp.int32)
        viol_sum = viol_sum + jnp.where(viol, d - zl, 0.0)

    keep = jnp.ones((n,), bool)
    # Gate scaling: the reference samples 16 taps over ~9 distinct texels
    # (copy_unstable.vert:76-113, windowMultiplier=2 at 0.5-px steps) and drops
    # at count>8 (~half the window) / zCount>4 (~2 texels).  This loop visits
    # the same 9 texels ONCE each, so the equivalent gates are count>4 (half of
    # 9) and z_count>2 — with the reference's raw thresholds duplicate removal
    # would require all 9 taps to agree and effectively never fire.
    keep = keep & ~((count > 4) | (z_count > 2))
    age = time - store.last_time
    # degenerate / too unstable (copy_unstable.vert:134)
    drop_unstable = (age > 20) & (store.conf < conf_threshold)
    keep = keep & ~drop_unstable
    # inactive surfels are immune (copy_unstable.vert:136)
    keep = keep | ((store.last_time > 0) & (age > time_delta))
    keep = keep & store.valid

    # confidence decay (copy_unstable.vert:138-149)
    has_viol = violations > 0
    avg_viol = viol_sum / jnp.maximum(violations, 1).astype(jnp.float32)
    conf = jnp.where(
        has_viol, store.conf / (1.0 + outlier_coeff * avg_viol), store.conf
    )
    if mask is not None:
        # center depth is window tap (0,0) = tap index 4; the mask rode the
        # same packed gather as channel 54
        m_val = fetched[-1]
        w_depth = fetched[6 * 4 + 5]
        mism = (
            has_viol
            & (m_val != mask_id)
            & (w_depth > zl - 0.05)
            & (w_depth < zl + 0.05)
            & search_ok
        )
        conf = jnp.where(mism, conf * (0.5 + 0.5 * (1.0 - outlier_coeff / 10.0)), conf)

    cleaned = store._replace(conf=conf)
    return cleaned, keep


def clean(
    store: SurfelStore,
    imap: IndexMap,
    depth_input: jnp.ndarray,
    mask: jnp.ndarray | None,
    mask_id,
    pose: jnp.ndarray,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    time,
    time_delta,
    conf_threshold,
    outlier_coeff,
    is_lost=False,
) -> SurfelStore:
    """clean_eval + stream compaction (single-tier form, used by tests and the
    reference-parity unit checks)."""
    cleaned, keep = clean_eval(
        store, imap, depth_input, mask, mask_id, pose, cam, cfg, time,
        time_delta, conf_threshold, outlier_coeff, is_lost,
    )
    return sm.compact(cleaned, keep)


def initialise(
    frame: FrameSurfels, pose: jnp.ndarray, capacity: int, time
) -> SurfelStore:
    """First-frame map initialisation (Model::initialise, Model.cpp:227-272):
    every valid pixel becomes a surfel."""
    H, W = frame.valid.shape
    R, t = pose[:3, :3], pose[:3, 3]
    wpos = _rotate(R, frame.pos) + t
    wnorm = _rotate(R, frame.normal)
    tf = jnp.asarray(time, jnp.float32)
    flat = sm.pack_store(
        pos=wpos.reshape(-1, 3),
        normal=wnorm.reshape(-1, 3),
        color=frame.color.reshape(-1, 3),
        radius=frame.radius.reshape(-1),
        conf=frame.conf.reshape(-1),
        init_time=jnp.full((H * W,), tf),
        last_time=jnp.full((H * W,), tf),
        valid=frame.valid.reshape(-1),
        count=jnp.int32(0),
    )
    store = sm.empty_store(capacity)
    return sm.append(store, flat, frame.valid.reshape(-1))
