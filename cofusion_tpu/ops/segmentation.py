"""Motion/semantic segmentation — Co-Fusion's core addition
(Core/Segmentation/Segmentation.{h,cpp}, Slic.{h,cpp}, ConnectedLabels.hpp,
plus the external gSLICr + densecrf dependencies), rebuilt as XLA-compiled
batched ops.

Pipeline (performSegmentationCRF, Segmentation.cpp:124-706):
  SLIC superpixels -> superpixel-mean downsampling of rgb/depth/ICP-error/
  confidence -> unary energies from normalized ICP error -> dense CRF mean-field
  (Potts smoothness + appearance kernel) -> argmax -> connected components ->
  largest-component / size / border gates -> per-model depth stats -> upsample.

TPU-first mapping:
  * gSLICr's GPU SLIC becomes a JAX SLIC: each pixel considers the 3x3
    neighboring grid clusters (classic SLIC locality), assignment = argmin over 9
    candidates, centers update via scatter-mean — `slic_iterations` fused rounds;
  * the permutohedral-lattice CRF message passing becomes DENSE (K x K) kernel
    matmuls on the MXU: K = (W/16)*(H/16) = 1200 superpixels at 640x480, so a
    1200x1200 matmul per iteration is microseconds — simpler AND faster than a
    lattice (SURVEY.md §7);
  * CPU union-find connected components become iterative min-index label
    propagation on the superpixel grid (bounded by grid diameter);
  * every "list of models" loop is a batched (L,) axis with masking.

Deliberate divergences (documented): the reference's appearance features read
full-resolution pixels at superpixel indices (an indexing bug,
Segmentation.cpp:444-448); we use the superpixel-mean RGB.  Empty-superpixel
resampling (Slic.h:199-209) is replaced by zero-fill + count masking.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cofusion_tpu.config import CameraConfig, CoFusionConfig, SegmentationParams

_HI = jax.lax.Precision.HIGHEST


class SegmentationResult(NamedTuple):
    full_segmentation: jnp.ndarray   # (H, W) int32 model-slot labels; 255 suppressed
    has_new_label: jnp.ndarray       # () bool
    depth_mean: jnp.ndarray          # (L,)
    depth_std: jnp.ndarray           # (L,)
    superpixel_count: jnp.ndarray    # (L,) int32
    bbox: jnp.ndarray                # (L, 4) full-res (left, top, right, bottom)
    avg_conf: jnp.ndarray            # (L,) mean projected model confidence
    #   (ModelData::avgConfidence, Segmentation.cpp:193-202 — drives the rising
    #   object confidence thresholds, CoFusion.cpp:293-298)


# ---------------------------------------------------------------------------
# SLIC


def _sh_cells(g: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[cy, cx] = g[cy - dy, cx - dx], zero outside — tiny (GH, GW) grid."""
    GH, GW = g.shape
    gp = jnp.pad(g, ((1, 1), (1, 1)))
    return gp[1 - dy : 1 - dy + GH, 1 - dx : 1 - dx + GW]


def _sp_sums_local(chans, w, assign, GH: int, GW: int, S: int, stride: int = 2):
    """Per-superpixel weighted sums + count WITHOUT scatters, using the SLIC
    locality invariant: assign[p] is one of the 3x3 grid cells around p's base
    cell (true for `slic_assign` output by construction — candidates are the
    3x3 neighborhood of the base cell, clipped at borders, so border clips
    stay inside the window).

    The scatter form costs ~4-7 ns per index element (H*W/stride^2 indices per
    channel per call — the dominant CRF-stage cost); this form is 9 masked
    block reductions at HBM speed + static shifts of the tiny (GH, GW) grid.
    Pixels violating the invariant are dropped (they cannot exist for SLIC
    output; tests/test_segmentation.py pins parity with the scatter form).

    chans: list of (H, W) arrays; w: (H, W) float32 weights (0 excludes).
    Returns (sums: list of (K,) f32, cnt: (K,) f32), K = GH*GW.
    """
    assert S % stride == 0
    T = S // stride
    a_s = assign[::stride, ::stride]
    w_s = w[::stride, ::stride]
    ch_s = [c[::stride, ::stride] for c in chans]
    Hs, Ws = a_s.shape
    Hm, Wm = GH * T, GW * T

    def main(x):
        return x[:Hm, :Wm]

    a_m = main(a_s)
    ay, ax = a_m // GW, a_m % GW
    by = jax.lax.broadcasted_iota(jnp.int32, (Hm, Wm), 0) // T
    bx = jax.lax.broadcasted_iota(jnp.int32, (Hm, Wm), 1) // T
    ry = ay - by + 1
    rx = ax - bx + 1
    inwin = (ry >= 0) & (ry < 3) & (rx >= 0) & (rx < 3)
    tap = jnp.where(inwin, ry * 3 + rx, 9)
    w_m = main(w_s)

    def block(x):  # (Hm, Wm) -> (GH, GW) tile sums
        return x.reshape(GH, T, GW, T).sum(axis=(1, 3))

    cnt_g = jnp.zeros((GH, GW), jnp.float32)
    sums_g = [jnp.zeros((GH, GW), jnp.float32) for _ in chans]
    for k in range(9):
        dy, dx = k // 3 - 1, k % 3 - 1
        wk = jnp.where(tap == k, w_m, 0.0)
        cnt_g = cnt_g + _sh_cells(block(wk), dy, dx)
        for i, c in enumerate(ch_s):
            sums_g[i] = sums_g[i] + _sh_cells(block(main(c) * wk), dy, dx)

    K = GH * GW
    cnt = cnt_g.reshape(K)
    sums = [s.reshape(K) for s in sums_g]

    # remainder strips (H/W not multiples of S): tiny scatter-adds, exact
    if Hs > Hm or Ws > Wm:
        rem_a = [a_s[Hm:, :].reshape(-1), a_s[:Hm, Wm:].reshape(-1)]
        rem_w = [w_s[Hm:, :].reshape(-1), w_s[:Hm, Wm:].reshape(-1)]
        for part in range(2):
            ra, rw = rem_a[part], rem_w[part]
            if ra.shape[0] == 0:
                continue
            cnt = cnt.at[ra].add(rw, mode="drop")
            for i, c in enumerate(ch_s):
                rc = (c[Hm:, :] if part == 0 else c[:Hm, Wm:]).reshape(-1)
                sums[i] = sums[i].at[ra].add(rc * rw, mode="drop")
    return sums, cnt


def slic_assign(
    rgb: jnp.ndarray, cfg: CoFusionConfig, iterations: int | None = None
) -> jnp.ndarray:
    """SLIC superpixels: returns per-pixel cluster index (H, W) int32 in
    [0, (H/S)*(W/S)).  Settings mirror Slic.cpp:32-46: S=16, coh weight 0.6,
    5 iterations, no connectivity enforcement."""
    S = cfg.superpixel_size
    H, W = rgb.shape[:2]
    GH, GW = H // S, W // S
    K = GH * GW
    iters = iterations if iterations is not None else cfg.slic_iterations

    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    gx = jnp.clip((x / S).astype(jnp.int32), 0, GW - 1)
    gy = jnp.clip((y / S).astype(jnp.int32), 0, GH - 1)
    rgbf = rgb.astype(jnp.float32)

    # initial centers: grid-cell means of position+color
    feat = jnp.concatenate([x[..., None], y[..., None], rgbf], axis=-1)  # (H,W,5)
    base_assign = gy * GW + gx

    coh = 0.6
    # gSLICr normalizes color dist by max color distance and spatial by S;
    # equivalent up to a constant: D = d_rgb^2 / (255^2) + coh * d_xy^2 / S^2
    col_norm = 1.0 / (40.0**2)
    pos_norm = coh / (S * S)

    def centers_of(assign):
        # center accumulation from a 2x2-strided pixel subset (4x cheaper;
        # means statistically identical at S>=8) via the scatter-free local
        # block reduction (_sp_sums_local — valid because SLIC assignments
        # stay in the 3x3 cell window by construction)
        ones = jnp.ones((H, W), jnp.float32)
        sums, cnt = _sp_sums_local(
            [feat[..., c] for c in range(5)], ones, assign, GH, GW, S, stride=2
        )
        return jnp.stack(sums, axis=-1) / jnp.maximum(cnt[:, None], 1.0)

    assign = base_assign

    def up(grid):
        # (GH, GW, C) -> (H, W, C) nearest upsample by S: pure broadcast, no
        # gather (each pixel's candidate center is constant over its SxS cell);
        # when S doesn't divide H/W, edge cells extend over the remainder
        g = jnp.broadcast_to(
            grid[:, None, :, None], (GH, S, GW, S) + grid.shape[2:]
        )
        g = g.reshape((GH * S, GW * S) + grid.shape[2:])
        pad_h, pad_w = H - GH * S, W - GW * S
        if pad_h > 0 or pad_w > 0:
            pad = [(0, max(0, pad_h)), (0, max(0, pad_w))] + [(0, 0)] * (g.ndim - 2)
            g = jnp.pad(g, pad, mode="edge")
        return g[:H, :W]

    for _ in range(iters):
        centers = centers_of(assign)
        cgrid = centers.reshape(GH, GW, 5)
        best_d = jnp.full((H, W), jnp.inf)
        best_k = assign
        for dy in range(-1, 2):
            for dx in range(-1, 2):
                # shift the tiny (GH, GW) center grid instead of gathering a
                # per-pixel candidate row: block-constant by construction
                cgy = jnp.clip(
                    jax.lax.broadcasted_iota(jnp.int32, (GH, GW), 0) + dy, 0, GH - 1
                )
                cgx = jnp.clip(
                    jax.lax.broadcasted_iota(jnp.int32, (GH, GW), 1) + dx, 0, GW - 1
                )
                ksh = cgy * GW + cgx
                csh = cgrid[cgy, cgx]
                c = up(csh)
                k = up(ksh[..., None])[..., 0]
                d_pos = (c[..., 0] - x) ** 2 + (c[..., 1] - y) ** 2
                d_col = jnp.sum((c[..., 2:5] - rgbf) ** 2, axis=-1)
                d = d_col * col_norm + d_pos * pos_norm
                upd = d < best_d
                best_d = jnp.where(upd, d, best_d)
                best_k = jnp.where(upd, k, best_k)
        assign = best_k

    return assign


def downsample_mean(
    img: jnp.ndarray,
    assign: jnp.ndarray,
    K: int,
    min_threshold=None,
    grid: tuple[int, int, int] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Superpixel means (Slic::downsample / downsampleThresholded).  Returns
    (means (K,[C]), counts (K,)).

    `grid` = (GH, GW, S): when the assignment is SLIC output (locality
    invariant — see _sp_sums_local) pass the grid shape and the accumulation
    runs scatter-free at HBM speed.  Without `grid`, falls back to per-channel
    1D scatter-adds (any assignment)."""
    # 2x2-strided subset (4x fewer indices; superpixels are >= S px so the
    # means are statistically identical)
    if img.ndim == 2:
        chans_full = [img]
    else:
        chans_full = [img[..., c] for c in range(img.shape[-1])]
    if grid is not None:
        GH, GW, S = grid
        w = jnp.ones(assign.shape, jnp.float32)
        if min_threshold is not None:
            w = (chans_full[0] > min_threshold).astype(jnp.float32)
        sums, cnt = _sp_sums_local(chans_full, w, assign, GH, GW, S, stride=2)
    else:
        a_s = assign[::2, ::2]
        flat = a_s.reshape(-1)
        chans = [c[::2, ::2].reshape(-1) for c in chans_full]
        ok = jnp.ones((flat.shape[0],), bool)
        if min_threshold is not None:
            ok = chans[0] > min_threshold
        w = ok.astype(jnp.float32)
        cnt = jnp.zeros((K,), jnp.float32).at[flat].add(w)
        sums = [jnp.zeros((K,), jnp.float32).at[flat].add(c * w) for c in chans]
    denom = jnp.maximum(cnt, 1.0)
    if img.ndim == 2:
        return sums[0] / denom, cnt
    return jnp.stack(sums, axis=-1) / denom[:, None], cnt


def downsample_mean_b(
    imgs: jnp.ndarray,
    assign: jnp.ndarray,
    K: int,
    grid: tuple[int, int, int] | None = None,
) -> jnp.ndarray:
    """Batched superpixel means of (M, H, W) images -> (M, K).  With `grid`
    (SLIC assignments) the M images ride ONE scatter-free block reduction
    (_sp_sums_local channels); otherwise NOT a vmap of `downsample_mean` —
    a vmapped scatter lowers to XLA's batched-scatter form, ~2 orders of
    magnitude off the TPU fast path — the model index folds into the flat
    bucket index so the accumulation stays ONE plain 1D scatter-add."""
    M = imgs.shape[0]
    if grid is not None:
        GH, GW, S = grid
        w = jnp.ones(assign.shape, jnp.float32)
        sums, cnt = _sp_sums_local(
            [imgs[m] for m in range(M)], w, assign, GH, GW, S, stride=2
        )
        return jnp.stack(sums) / jnp.maximum(cnt, 1.0)[None]
    a_s = assign[::2, ::2]
    flat_assign = (a_s[None] + jnp.arange(M)[:, None, None] * K).reshape(-1)
    vals = imgs[:, ::2, ::2].reshape(-1)
    cnt = jnp.zeros((M * K,), jnp.float32).at[flat_assign].add(1.0)
    sums = jnp.zeros((M * K,), jnp.float32).at[flat_assign].add(vals)
    return (sums / jnp.maximum(cnt, 1.0)).reshape(M, K)


def downsample_median_b(imgs: jnp.ndarray, assign: jnp.ndarray, K: int) -> jnp.ndarray:
    """Batched per-superpixel MEDIAN of (M, H, W) images -> (M, K).

    Used for the ICP-error channels feeding the unaries.  The reference takes
    the superpixel MEAN of its raw per-pixel error texture
    (Slic::downsample<float>, Slic.h:49-84; the texture itself records the
    unGATED correspondence distance, reduce.cu:323-325) — at depth
    discontinuities that distance spikes to the full inter-surface gap, so a
    boundary superpixel's mean error exceeds the object floor
    (unaryKError) and flips to an object label even though most of its pixels
    track fine.  The median reports the majority (interior) error and kills
    those speckles; for genuinely-misfitting regions every pixel is high, so
    median == mean and the unary is unchanged.  Sort-based: one stable sort of
    (cell, value) pairs per model on the 2x2-strided subset."""
    M = imgs.shape[0]
    a_s = assign[::2, ::2].reshape(-1)
    P = a_s.shape[0]
    cnt = jnp.zeros((K,), jnp.float32).at[a_s].add(1.0)
    start = jnp.cumsum(cnt) - cnt  # exclusive prefix: first sorted slot per cell
    pos = jnp.clip(
        (start + jnp.floor((cnt - 1.0) / 2.0)).astype(jnp.int32), 0, P - 1
    )
    out = []
    for m in range(M):  # static M; per-model plain sorts + gathers (no vmap)
        vals = imgs[m, ::2, ::2].reshape(-1)
        order = jnp.lexsort((vals, a_s))
        vsorted = jnp.take(vals, order)
        out.append(jnp.where(cnt > 0, jnp.take(vsorted, pos), 0.0))
    return jnp.stack(out)


def upsample(values: jnp.ndarray, assign: jnp.ndarray) -> jnp.ndarray:
    """Per-superpixel values -> full-res (Slic::upsample, nearest)."""
    return jnp.take(values, assign.reshape(-1), axis=0).reshape(assign.shape + values.shape[1:])


# ---------------------------------------------------------------------------
# dense CRF


def _sym_normalize(Kmat: jnp.ndarray) -> jnp.ndarray:
    """NORMALIZE_SYMMETRIC (densecrf fork): K~ = D^-1/2 K D^-1/2."""
    d = jnp.sum(Kmat, axis=1)
    dinv = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-12))
    return Kmat * dinv[:, None] * dinv[None, :]


def crf_mean_field(
    unary: jnp.ndarray,  # (L, K) positive "costs" (Segmentation.cpp unary matrix)
    feats_smooth: jnp.ndarray,  # (K, 2)
    feats_app: jnp.ndarray,     # (K, 6)
    w_smooth: float,
    w_app: float,
    iterations: int,
) -> jnp.ndarray:
    """Mean-field with dense Gaussian kernels (Segmentation.cpp:436-471):
    Q0 = softmax(-U); Q_{t+1} = softmax(-U + w_s K~_s Q + w_a K~_a Q).
    Returns Q (L, K)."""

    def gauss_kernel(f):
        # exp(-1/2 |f_i - f_j|^2), features pre-scaled
        sq = jnp.sum(f * f, axis=-1)
        g = jnp.matmul(f, f.T, precision=_HI)
        d2 = sq[:, None] + sq[None, :] - 2.0 * g
        return jnp.exp(-0.5 * jnp.maximum(d2, 0.0))

    Ks = _sym_normalize(gauss_kernel(feats_smooth))
    Ka = _sym_normalize(gauss_kernel(feats_app))

    U = jnp.maximum(unary, 1e-5)  # clamp (Segmentation.cpp:458-460)
    Q = jax.nn.softmax(-U, axis=0)

    def body(_, Q):
        msg = w_smooth * jnp.matmul(Q, Ks.T, precision=_HI) + w_app * jnp.matmul(
            Q, Ka.T, precision=_HI
        )
        return jax.nn.softmax(-U + msg, axis=0)

    return jax.lax.fori_loop(0, iterations, body, Q)


# ---------------------------------------------------------------------------
# connected components on the superpixel grid


def connected_components(labels: jnp.ndarray, iters: int | None = None) -> jnp.ndarray:
    """Min-index label propagation on a (GH, GW) int grid: cells connected
    4-neighbor within equal `labels` share a component id (the minimum linear
    cell index of the component).  Replaces the CPU union-find
    (ConnectedLabels.hpp:50-172)."""
    GH, GW = labels.shape
    if iters is None:
        iters = GH + GW + 2
    idx0 = jax.lax.broadcasted_iota(jnp.int32, (GH, GW), 0) * GW + jax.lax.broadcasted_iota(
        jnp.int32, (GH, GW), 1
    )

    def shift(a, dy, dx, fill):
        pad = [(max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx))]
        ap = jnp.pad(a, pad, constant_values=fill)
        return jax.lax.slice(
            ap, (pad[0][0] + dy, pad[1][0] + dx), (pad[0][0] + dy + GH, pad[1][0] + dx + GW)
        )

    big = jnp.int32(GH * GW)

    def body(_, comp):
        out = comp
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            nbr_comp = shift(comp, dy, dx, big)
            nbr_lab = shift(labels, dy, dx, -1)
            same = nbr_lab == labels
            out = jnp.minimum(out, jnp.where(same, nbr_comp, big))
        return out

    return jax.lax.fori_loop(0, iters, body, idx0)


# ---------------------------------------------------------------------------
# full CRF segmentation


def perform_segmentation_crf(
    rgb: jnp.ndarray,            # (H, W, 3)
    depth: jnp.ndarray,          # (H, W)
    icp_errors: jnp.ndarray,     # (M, H, W) per-model per-pixel ICP error
    confidences: jnp.ndarray,    # (M, H, W) projected model confidence
    active: jnp.ndarray,         # (M,) bool — which model slots exist
    next_slot: jnp.ndarray,      # () int32 — slot a new label would occupy
    allow_new,                   # bool (traced ok)
    cam: CameraConfig,
    cfg: CoFusionConfig,
    params: SegmentationParams,
) -> SegmentationResult:
    """One CRF segmentation (Segmentation::performSegmentationCRF).  Model slots
    are the label set: label m <-> model slot m; L = M+ (slots; the new label
    lives in `next_slot`)."""
    S = cfg.superpixel_size
    H, W = cam.height, cam.width
    GH, GW = H // S, W // S
    K = GH * GW
    M = icp_errors.shape[0]
    MAX_DEPTH = 100.0

    assign = slic_assign(rgb, cfg)

    grid = (GH, GW, S)  # SLIC assignments -> scatter-free block accumulation
    low_rgb, _ = downsample_mean(rgb.astype(jnp.float32), assign, K, grid=grid)
    low_depth, _ = downsample_mean(depth, assign, K, min_threshold=0.02, grid=grid)
    low_err = downsample_median_b(icp_errors, assign, K)   # (M, K)
    low_conf = downsample_mean_b(confidences, assign, K, grid=grid)

    dok = (low_depth > 0) & (low_depth < MAX_DEPTH)
    dmin = jnp.min(jnp.where(dok, low_depth, jnp.inf))
    dmax = jnp.max(jnp.where(dok, low_depth, 0.0))
    depth_range = jnp.maximum(dmax - dmin, 1e-6)

    # --- unaries (Segmentation.cpp:237-298) -------------------------------
    # background: where its confidence is low, grant a small error floor
    err0 = jnp.where(low_conf[0] < 0.3, depth_range * 0.01, low_err[0])
    errs = low_err.at[0].set(err0)
    # objects: low confidence -> error floor depthRange * unaryKError
    floor = depth_range * params.unary_k_error
    obj_mask = (jnp.arange(M) > 0)[:, None]
    errs = jnp.where(obj_mask & (low_conf <= 0.4), floor, errs)
    errs = errs / depth_range

    # inactive slots never win: give them huge cost
    slot_active = active
    unary_models = jnp.where(
        slot_active[:, None], params.unary_weight_error * errs, 1e5
    )  # (M, K)

    lowest = jnp.min(jnp.where(slot_active[:, None], errs, jnp.inf), axis=0)
    new_unary = jnp.maximum(params.unary_threshold_new - params.unary_weight_error * lowest, 0.01)
    new_unary = jnp.where(jnp.asarray(allow_new), new_unary, 1e5)

    # place the new label's unary in `next_slot` (inactive slot)
    unary = unary_models
    onehot_next = jax.nn.one_hot(next_slot, M, dtype=unary.dtype)  # (M,)
    unary = unary * (1 - onehot_next[:, None]) + onehot_next[:, None] * new_unary[None, :]

    # --- CRF --------------------------------------------------------------
    gxk = (jnp.arange(K, dtype=jnp.float32) % GW)
    gyk = jnp.floor(jnp.arange(K, dtype=jnp.float32) / GW)
    feats_smooth = jnp.stack([gxk / 2.0, gyk / 2.0], axis=-1)
    feats_app = jnp.concatenate(
        [
            (gxk * params.scale_pos)[:, None],
            (gyk * params.scale_pos)[:, None],
            low_rgb * params.scale_rgb,
            jnp.minimum(low_depth * params.scale_depth, 100.0)[:, None],
        ],
        axis=-1,
    )
    Q = crf_mean_field(
        unary, feats_smooth, feats_app,
        params.weight_smoothness, params.weight_appearance, params.crf_iterations,
    )
    label = jnp.argmax(Q, axis=0).astype(jnp.int32)  # (K,) slot labels

    # --- connected components + gates ------------------------------------
    grid_label = label.reshape(GH, GW)
    comp = connected_components(grid_label).reshape(-1)  # (K,) root cell index

    ones = jnp.ones((K,), jnp.int32)
    comp_size = jnp.zeros((K,), jnp.int32).at[comp].add(ones)  # indexed by root
    root_label = label  # label at root cell == its component's label

    # largest component per label (skip background label 0)
    NBIG = K + 1
    packed = (K - comp_size) * NBIG + jnp.arange(K)  # small = bigger comp, tie->low root
    is_root = comp == jnp.arange(K)
    packed = jnp.where(is_root, packed, NBIG * NBIG)
    per_label_best = jnp.full((M,), NBIG * NBIG, jnp.int32).at[root_label].min(
        jnp.where(is_root, packed, NBIG * NBIG), mode="drop"
    )
    best_root = per_label_best % NBIG
    cell_label = label
    keep_cell = (cell_label == 0) | (comp == jnp.take(best_root, cell_label))

    # new-label size gates (minRelSizeNew/maxRelSizeNew . lowTotal)
    min_size = params.min_rel_size_new * K
    max_size = params.max_rel_size_new * K
    size_of_cell_comp = jnp.take(comp_size, comp)
    is_new = cell_label == next_slot
    size_ok = (size_of_cell_comp >= min_size) & (size_of_cell_comp <= max_size)
    keep_cell = keep_cell & (~is_new | size_ok)

    # label map with suppressed cells = 255
    lab255 = jnp.where(keep_cell, cell_label, 255)

    # bounding boxes per label (full-res coords)
    gx_cell = (jnp.arange(K) % GW).astype(jnp.int32)
    gy_cell = (jnp.arange(K) // GW).astype(jnp.int32)
    kept_idx = jnp.where(keep_cell, cell_label, M)  # suppressed -> dropped
    left = jnp.full((M,), GW, jnp.int32).at[kept_idx].min(gx_cell, mode="drop")
    right = jnp.full((M,), -1, jnp.int32).at[kept_idx].max(gx_cell, mode="drop")
    top = jnp.full((M,), GH, jnp.int32).at[kept_idx].min(gy_cell, mode="drop")
    bottom = jnp.full((M,), -1, jnp.int32).at[kept_idx].max(gy_cell, mode="drop")
    bbox = jnp.stack([left * S, top * S, right * S + S, bottom * S + S], axis=-1)

    # border suppression (Segmentation.cpp:549-563): object bbox fully inside a
    # 20 px border band on any side -> suppress the label
    B = 20
    l, t, r, b = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    at_border = (
        ((t < B) & (b < B))
        | ((l < B) & (r < B))
        | ((t > H - B) & (b > H - B))
        | ((l > W - B) & (r > W - B))
    )
    at_border = at_border & (jnp.arange(M) != 0)
    cell_border_suppressed = jnp.take(at_border, jnp.where(lab255 == 255, 0, lab255)) & (
        lab255 != 255
    )
    lab255 = jnp.where(cell_border_suppressed, 255, lab255)

    # --- robust per-label depth stats: histogram median + MAD ------------
    # The reference trims once at mean + 1.1*MAD (Segmentation.cpp:570-621,
    # its own comment admits "only approximating the std").  That estimator
    # fails BIMODAL labels: a fresh label containing the vacated "ghost"
    # region (~half background pixels at far depth) yields a clamp that
    # admits the background, so the spawned model permanently absorbs
    # background geometry and the label creeps (measured: spawn clamp 3.22 m
    # for a 1.4-2.1 m object against a 3.2 m wall; ~30% of the new model's
    # surfels were wall).  Median/MAD lands inside the majority (object)
    # cluster: same intent — a per-object depth range for the fusion clamp
    # (CoFusion.cpp:228 depthMean + 1.2*depthStd) — robust to the ghost.
    valid_cell = lab255 != 255
    lab_idx = jnp.where(valid_cell, lab255, M)
    cnt = jnp.zeros((M,), jnp.float32).at[lab_idx].add(
        jnp.where(valid_cell, 1.0, 0.0), mode="drop"
    )
    NB = 128
    dmax = jnp.maximum(jnp.max(low_depth), 1e-3)

    def _label_median(vals):
        b = jnp.clip((vals / dmax * NB).astype(jnp.int32), 0, NB - 1)
        flatb = lab_idx * NB + b  # suppressed rows index >= M*NB -> dropped
        hist = (
            jnp.zeros((M * NB,), jnp.float32)
            .at[flatb].add(jnp.where(valid_cell, 1.0, 0.0), mode="drop")
            .reshape(M, NB)
        )
        c = jnp.cumsum(hist, axis=1)
        medbin = jnp.argmax(c >= c[:, -1:] / 2.0, axis=1)
        return (medbin.astype(jnp.float32) + 0.5) * (dmax / NB)

    med = _label_median(low_depth)
    devm = jnp.abs(low_depth - jnp.take(med, jnp.where(valid_cell, lab255, 0)))
    mad = _label_median(devm)
    mean2 = jnp.where(cnt > 0, med, 0.0)
    # floor the spread so a fronto-parallel (near-constant-depth) object does
    # not produce a clamp at exactly its median (rejecting half its pixels)
    std2 = jnp.where(cnt > 0, jnp.maximum(mad, 0.04), 0.0)

    sp_count = jnp.zeros((M,), jnp.int32).at[lab_idx].add(
        jnp.where(valid_cell, 1, 0), mode="drop"
    )
    has_new = jnp.asarray(allow_new) & (jnp.take(sp_count, next_slot) > 0)

    full = upsample(lab255.astype(jnp.int32), assign)
    return SegmentationResult(
        full_segmentation=full,
        has_new_label=has_new,
        depth_mean=mean2,
        depth_std=std2,
        superpixel_count=sp_count,
        bbox=bbox,
        avg_conf=jnp.mean(low_conf, axis=1),
    )


# ---------------------------------------------------------------------------
# ground-truth mask path (host-side remapping + device stats)


def gt_mask_stats(mask: jnp.ndarray, depth: jnp.ndarray, num_slots: int):
    """Per-slot depth mean / mean-abs-deviation for a slot-id mask
    (Segmentation.cpp:100-117)."""
    flat = mask.reshape(-1).astype(jnp.int32)
    d = depth.reshape(-1)
    cnt = jnp.zeros((num_slots,), jnp.float32).at[flat].add(1.0, mode="drop")
    dsum = jnp.zeros((num_slots,), jnp.float32).at[flat].add(d, mode="drop")
    mean = dsum / jnp.maximum(cnt, 1.0)
    dev = jnp.abs(jnp.take(mean, jnp.clip(flat, 0, num_slots - 1)) - d)
    devsum = jnp.zeros((num_slots,), jnp.float32).at[flat].add(dev, mode="drop")
    std = devsum / jnp.maximum(cnt, 1.0)
    return mean, std, cnt


class GtMaskMapper:
    """Host-side persistent mapping from arbitrary mask ids to model slots
    (the reference's static `mapping` vector, Segmentation.cpp:64-96)."""

    def __init__(self):
        self.mapping: dict[int, int] = {0: 0}

    def purge_slot(self, slot: int) -> None:
        """Drop every dataset-id mapping targeting a freed slot so a recycled
        slot never inherits a dead object's ids (the reference instead hands
        out fresh sequential ids, CoFusion.cpp:628-644)."""
        self.mapping = {k: v for k, v in self.mapping.items() if v != slot}

    def remap(self, mask_np, free_slots: list[int], allow_new: bool):
        """Returns (slot mask uint8, newly_assigned slot | None)."""
        import numpy as np

        out = np.zeros_like(mask_np, dtype=np.uint8)
        new_slot = None
        ids = np.unique(mask_np)
        free = list(free_slots)
        for vid in ids:
            if vid == 0:
                continue
            if int(vid) in self.mapping:
                out[mask_np == vid] = self.mapping[int(vid)]
            elif allow_new and new_slot is None and free:
                new_slot = free.pop(0)
                self.mapping[int(vid)] = new_slot
                out[mask_np == vid] = new_slot
            # else: unseen id stays background (reference maps to 0)
        return out, new_slot
