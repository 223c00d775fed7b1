"""Randomized-fern keyframe database for relocalization — TPU rewrite of
Core/Ferns.{h,cpp}.

The reference keeps a CPU std::vector of keyframes and per-fern inverted lists
(Ferns.cpp:56-142); here the database is fixed-capacity device arrays and
co-occurrence counting is one batched comparison (an (F, N) == (N,) broadcast +
sum — XLA turns it into a single fused reduction), so addFrame/findFrame live
inside jit with zero host round-trips.

Layout: ferns are N random probes (x, y, r-thresh, g-thresh, b-thresh,
d-thresh-mm); a frame's code per fern packs 4 threshold bits (Ferns.cpp:89-109);
bad code = 255 where the probe pixel has no depth.  Keyframes are stored at
1/`factor` (8) resolution with pose + timestamp (addFrame keeps a frame if its
min dissimilarity to the database exceeds 0.3095).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cofusion_tpu.config import CameraConfig


class FernDB(NamedTuple):
    # static conservatory
    probe_xy: jnp.ndarray    # (N, 2) int32 (x, y) at fern resolution
    probe_rgbd: jnp.ndarray  # (N, 4) float32 thresholds (r, g, b, depth-mm)
    # keyframe storage
    codes: jnp.ndarray       # (F, N) uint8 (255 = bad)
    good_codes: jnp.ndarray  # (F,) int32
    poses: jnp.ndarray       # (F, 4, 4)
    src_time: jnp.ndarray    # (F,) int32
    rgb: jnp.ndarray         # (F, h, w, 3) float32
    verts: jnp.ndarray       # (F, h, w, 3) float32 camera-frame
    norms: jnp.ndarray       # (F, h, w, 3) float32
    count: jnp.ndarray       # () int32


def new_db(
    cam: CameraConfig,
    num_ferns: int = 500,
    capacity: int = 256,
    factor: int = 8,
    max_depth_mm: float = 5000.0,
    seed: int = 0,
) -> FernDB:
    """Generate the fern conservatory (Ferns::generateFerns) and empty storage."""
    w, h = cam.width // factor, cam.height // factor
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    xs = jax.random.randint(k1, (num_ferns, 1), 0, w)
    ys = jax.random.randint(k2, (num_ferns, 1), 0, h)
    rgb_t = jax.random.uniform(k3, (num_ferns, 3), minval=0.0, maxval=255.0)
    d_t = jax.random.uniform(jax.random.fold_in(k, 7), (num_ferns, 1), minval=400.0, maxval=max_depth_mm)
    return FernDB(
        probe_xy=jnp.concatenate([xs, ys], axis=1).astype(jnp.int32),
        probe_rgbd=jnp.concatenate([rgb_t, d_t], axis=1).astype(jnp.float32),
        codes=jnp.full((capacity, num_ferns), 255, jnp.uint8),
        good_codes=jnp.zeros((capacity,), jnp.int32),
        poses=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (capacity, 4, 4)),
        src_time=jnp.full((capacity,), -(10**6), jnp.int32),
        rgb=jnp.zeros((capacity, h, w, 3), jnp.float32),
        verts=jnp.zeros((capacity, h, w, 3), jnp.float32),
        norms=jnp.zeros((capacity, h, w, 3), jnp.float32),
        count=jnp.int32(0),
    )


def encode(db: FernDB, rgb_small: jnp.ndarray, verts_small: jnp.ndarray):
    """Per-fern 4-bit code of a downsampled frame (Ferns.cpp:89-109).
    Returns (codes (N,) uint8, good (N,) bool)."""
    x, y = db.probe_xy[:, 0], db.probe_xy[:, 1]
    h, w = rgb_small.shape[:2]
    lin = y * w + x
    pix = jnp.take(rgb_small.reshape(-1, 3), lin, axis=0)       # (N, 3)
    z = jnp.take(verts_small.reshape(-1, 3)[:, 2], lin)          # (N,)
    good = z > 0
    code = (
        ((pix[:, 0] > db.probe_rgbd[:, 0]).astype(jnp.uint8) << 3)
        | ((pix[:, 1] > db.probe_rgbd[:, 1]).astype(jnp.uint8) << 2)
        | ((pix[:, 2] > db.probe_rgbd[:, 2]).astype(jnp.uint8) << 1)
        | ((z * 1000.0).astype(jnp.int32) > db.probe_rgbd[:, 3].astype(jnp.int32)).astype(jnp.uint8)
    )
    return jnp.where(good, code, jnp.uint8(255)), good


def _dissimilarity(db: FernDB, codes: jnp.ndarray, good_count: jnp.ndarray):
    """(F,) dissimilarity of `codes` to every stored keyframe: co-occurrences are
    equal GOOD codes; dissim = (maxCo - co)/maxCo (Ferns.cpp:110-127)."""
    valid_probe = codes != 255
    co = jnp.sum(
        ((db.codes == codes[None, :]) & valid_probe[None, :] & (db.codes != 255)).astype(
            jnp.int32
        ),
        axis=1,
    )
    max_co = jnp.minimum(good_count, db.good_codes).astype(jnp.float32)
    max_co_safe = jnp.maximum(max_co, 1.0)
    dissim = (max_co - co.astype(jnp.float32)) / max_co_safe
    in_db = jnp.arange(db.codes.shape[0]) < db.count
    return jnp.where(in_db, dissim, jnp.inf)


def block_hd(db: FernDB, codes: jnp.ndarray, good: jnp.ndarray):
    """Block-Hamming-aware similarity vs each keyframe (Ferns::blockHDAware):
    fraction of mutually-good probes whose codes agree."""
    both_good = (db.codes != 255) & good[None, :]
    eq = (db.codes == codes[None, :]) & both_good
    n_both = jnp.maximum(jnp.sum(both_good.astype(jnp.int32), axis=1), 1)
    return jnp.sum(eq.astype(jnp.int32), axis=1) / n_both


@functools.partial(jax.jit, static_argnames=())
def add_frame(
    db: FernDB,
    rgb_small: jnp.ndarray,
    verts_small: jnp.ndarray,
    norms_small: jnp.ndarray,
    pose: jnp.ndarray,
    src_time,
    threshold=0.3095,
) -> tuple[FernDB, jnp.ndarray]:
    """Store the frame as a keyframe if sufficiently novel (Ferns::addFrame).
    Returns (db, added bool).

    Capacity policy (divergence: the reference grows its keyframe vector
    unboundedly, Ferns.cpp:72-142; we are fixed-capacity): when full, a novel
    frame EVICTS the least unique stored keyframe — the one whose closest
    neighbor in the database is most similar — so long sequences keep diverse
    relocalization coverage instead of silently losing new viewpoints."""
    F = db.codes.shape[0]
    codes, good = encode(db, rgb_small, verts_small)
    good_count = jnp.sum(good.astype(jnp.int32))
    dissim = _dissimilarity(db, codes, good_count)
    minimum = jnp.min(dissim)
    add = ((minimum > threshold) | (db.count == 0)) & (good_count > 0)
    full = db.count >= F

    def _eviction_slot():
        # pairwise keyframe dissimilarity: co-occurrence of equal good codes
        valid_ij = (db.codes[:, None, :] != 255) & (db.codes[None, :, :] != 255)
        co = jnp.sum(
            ((db.codes[:, None, :] == db.codes[None, :, :]) & valid_ij).astype(jnp.int32),
            axis=2,
        )
        max_co = jnp.minimum(db.good_codes[:, None], db.good_codes[None, :]).astype(
            jnp.float32
        )
        pair_dissim = (max_co - co.astype(jnp.float32)) / jnp.maximum(max_co, 1.0)
        in_db = jnp.arange(F) < db.count
        pair_ok = in_db[:, None] & in_db[None, :] & ~jnp.eye(F, dtype=bool)
        nearest = jnp.min(jnp.where(pair_ok, pair_dissim, jnp.inf), axis=1)
        # least unique = smallest nearest-neighbor dissimilarity
        return jnp.argmin(jnp.where(in_db, nearest, jnp.inf)).astype(jnp.int32)

    # the O(F^2 N) eviction scan only runs once the database is actually full
    evict = jax.lax.cond(full, _eviction_slot, lambda: jnp.int32(0))

    slot = jnp.where(add, jnp.where(full, evict, db.count), F)  # F = drop

    def put(arr, val):
        return arr.at[slot].set(val, mode="drop")

    return (
        db._replace(
            codes=put(db.codes, codes),
            good_codes=put(db.good_codes, good_count),
            poses=put(db.poses, pose),
            src_time=put(db.src_time, jnp.asarray(src_time, jnp.int32)),
            rgb=put(db.rgb, rgb_small),
            verts=put(db.verts, verts_small),
            norms=put(db.norms, norms_small),
            count=db.count + (add & ~full).astype(jnp.int32),
        ),
        add,
    )


class FernMatch(NamedTuple):
    found: jnp.ndarray       # () bool — passed co-occurrence + blockHD gates
    keyframe: jnp.ndarray    # () int32 best keyframe index (-1 if none)
    fern_pose: jnp.ndarray   # (4, 4) stored keyframe pose
    fern_rgb: jnp.ndarray    # (h, w, 3)
    fern_verts: jnp.ndarray  # (h, w, 3)
    fern_norms: jnp.ndarray  # (h, w, 3)


def find_frame(
    db: FernDB,
    rgb_small: jnp.ndarray,
    verts_small: jnp.ndarray,
    time,
    min_age: int = 300,
    block_hd_thresh: float = 0.3,
) -> FernMatch:
    """Retrieve the best-matching old keyframe (Ferns::findFrame:144-202).
    The caller then verifies with fern-resolution ICP + the photometric check
    (see `photometric_check`) before accepting the pose."""
    codes, good = encode(db, rgb_small, verts_small)
    good_count = jnp.sum(good.astype(jnp.int32))
    dissim = _dissimilarity(db, codes, good_count)
    old_enough = (time - db.src_time) > min_age
    dissim = jnp.where(old_enough, dissim, jnp.inf)
    best = jnp.argmin(dissim).astype(jnp.int32)
    any_candidate = jnp.isfinite(jnp.take(dissim, best))
    hd = jnp.take(block_hd(db, codes, good), best)
    found = any_candidate & (hd > block_hd_thresh)
    take = lambda arr: jnp.take(arr, best, axis=0)
    return FernMatch(
        found=found,
        keyframe=jnp.where(found, best, -1),
        fern_pose=take(db.poses),
        fern_rgb=take(db.rgb),
        fern_verts=take(db.verts),
        fern_norms=take(db.norms),
    )


def photometric_check(
    db: FernDB,
    verts_small: jnp.ndarray,
    rgb_small: jnp.ndarray,
    est_pose: jnp.ndarray,
    fern_pose: jnp.ndarray,
    fern_rgb: jnp.ndarray,
    cam_small: CameraConfig,
    max_depth: float,
) -> jnp.ndarray:
    """Mean abs rgb difference at fern probes reprojected into the keyframe
    (Ferns::photometricCheck, Ferns.cpp:264-307)."""
    from cofusion_tpu.ops.lie import invert_rt

    x, y = db.probe_xy[:, 0], db.probe_xy[:, 1]
    h, w = rgb_small.shape[:2]
    lin = y * w + x
    v = jnp.take(verts_small.reshape(-1, 3), lin, axis=0)  # (N, 3)
    ok = (v[:, 2] > 0) & (v[:, 2] < max_depth)

    diff_T = jnp.matmul(invert_rt(fern_pose), est_pose, precision=jax.lax.Precision.HIGHEST)
    vt = v @ diff_T[:3, :3].T + diff_T[:3, 3]
    zs = jnp.where(vt[:, 2] == 0, 1.0, vt[:, 2])
    u0 = jnp.round(vt[:, 0] * cam_small.fx / zs + cam_small.cx).astype(jnp.int32)
    v0 = jnp.round(vt[:, 1] * cam_small.fy / zs + cam_small.cy).astype(jnp.int32)
    inb = (u0 >= 0) & (v0 >= 0) & (u0 < w) & (v0 < h)
    lin2 = jnp.clip(v0, 0, h - 1) * w + jnp.clip(u0, 0, w - 1)
    fern_pix = jnp.take(fern_rgb.reshape(-1, 3), lin2, axis=0)
    cur_pix = jnp.take(rgb_small.reshape(-1, 3), lin, axis=0)
    nonzero = jnp.any(fern_pix > 0, axis=1)
    use = ok & inb & nonzero
    diff = jnp.sum(jnp.abs(fern_pix - cur_pix), axis=1)
    total = jnp.sum(jnp.where(use, diff, 0.0))
    cnt = jnp.maximum(jnp.sum(use.astype(jnp.int32)), 1)
    return total / cnt.astype(jnp.float32)


def sample_constraints(
    db: FernDB,
    verts_small: jnp.ndarray,
    curr_pose: jnp.ndarray,
    est_pose: jnp.ndarray,
    max_depth: float,
    stride: int = 10,
):
    """Surface constraints at every `stride`-th fern probe (Ferns.cpp:240-256):
    pairs (world point under the current pose, world point under the recovered
    pose).  Returns (src (K,3), tgt (K,3), valid (K,))."""
    x, y = db.probe_xy[::stride, 0], db.probe_xy[::stride, 1]
    h, w = verts_small.shape[:2]
    lin = y * w + x
    v = jnp.take(verts_small.reshape(-1, 3), lin, axis=0)
    ok = (v[:, 2] > 0) & (v[:, 2] < max_depth)
    src = v @ curr_pose[:3, :3].T + curr_pose[:3, 3]
    tgt = v @ est_pose[:3, :3].T + est_pose[:3, 3]
    return src, tgt, ok
