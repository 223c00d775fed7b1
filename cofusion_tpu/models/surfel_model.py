"""Fixed-capacity surfel map — the central data structure.

The reference packs each surfel as 3 x vec4 = 48 B in OpenGL VBOs
(Core/Shaders/Vertex.cpp:20-42): (x,y,z,conf), (encoded-rgb, <unused>, initTime,
lastUpdate/state), (nx,ny,nz,radius), with capacity 3072^2 per model
(Core/Model/Model.cpp:92-98) and ping-pong buffer swaps after fuse/clean.

TPU-native layout: a FULLY SCALAR struct-of-arrays NamedTuple — every
attribute component is its own (N,) float32 array.  This is load-bearing, not
cosmetic: slicing or stacking a small minor axis (an (N, 3) position array) on
TPU relayouts the whole array across lanes, and for arrays larger than VMEM
that relayout costs ~60x memory bandwidth.  Measured on a v5e at N = 4M: a
3x3-rotate over an (N, 3) array runs in 8.9 ms, the identical math over three
(N,) arrays in 0.05 ms.  Every hot op (render, fuse, clean, compact) therefore
works coordinate-wise; `pos`/`normal`/`color` stacked views exist for cold
paths (export, deformation at loop-closure cadence, tests).

There is no ping-pong: XLA's functional updates + donation give the same
effect.  Invalid slots are `valid == False` (not NaN); `count` tracks the
allocated prefix (the store is kept compacted: valid slots form a prefix after
`clean`; the stable tier's explicit mask is authoritative instead, see
`append_block`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_POS = ("px", "py", "pz")
_NRM = ("nx", "ny", "nz")
_COL = ("cr", "cg", "cb")
# every per-surfel (N,) leaf, in declaration order
DATA_FIELDS = _POS + _NRM + _COL + ("radius", "conf", "init_time", "last_time", "valid")


class SurfelStore(NamedTuple):
    """One model's surfel map (leading (M,) axis when batched over models)."""

    px: jnp.ndarray         # (N,) world-frame position components
    py: jnp.ndarray
    pz: jnp.ndarray
    nx: jnp.ndarray         # (N,) world-frame unit normal components
    ny: jnp.ndarray
    nz: jnp.ndarray
    cr: jnp.ndarray         # (N,) rgb in [0, 255]
    cg: jnp.ndarray
    cb: jnp.ndarray
    radius: jnp.ndarray     # (N,)
    conf: jnp.ndarray       # (N,) accumulated confidence
    init_time: jnp.ndarray  # (N,) tick when created        (vColor.z)
    last_time: jnp.ndarray  # (N,) tick of last update      (vColor.w)
    valid: jnp.ndarray      # (N,) bool
    count: jnp.ndarray      # () int32 — number of valid surfels (prefix)

    @property
    def capacity(self) -> int:
        return self.px.shape[-1]

    # ---- stacked views (cold paths only: export, deformation, tests) ----
    @property
    def pos(self) -> jnp.ndarray:
        return jnp.stack([self.px, self.py, self.pz], axis=-1)

    @property
    def normal(self) -> jnp.ndarray:
        return jnp.stack([self.nx, self.ny, self.nz], axis=-1)

    @property
    def color(self) -> jnp.ndarray:
        return jnp.stack([self.cr, self.cg, self.cb], axis=-1)


def pack_store(pos, normal, color, radius, conf, init_time, last_time, valid, count) -> SurfelStore:
    """Build a store from stacked (N, 3) attribute arrays (cold-path helper)."""
    return SurfelStore(
        px=pos[..., 0], py=pos[..., 1], pz=pos[..., 2],
        nx=normal[..., 0], ny=normal[..., 1], nz=normal[..., 2],
        cr=color[..., 0], cg=color[..., 1], cb=color[..., 2],
        radius=radius, conf=conf, init_time=init_time, last_time=last_time,
        valid=valid, count=count,
    )


def with_pos(store: SurfelStore, pos) -> SurfelStore:
    return store._replace(px=pos[..., 0], py=pos[..., 1], pz=pos[..., 2])


def with_normal(store: SurfelStore, normal) -> SurfelStore:
    return store._replace(nx=normal[..., 0], ny=normal[..., 1], nz=normal[..., 2])


def empty_store(capacity: int) -> SurfelStore:
    z = jnp.zeros((capacity,), jnp.float32)
    return SurfelStore(
        px=z, py=z, pz=z, nx=z, ny=z, nz=z, cr=z, cg=z, cb=z,
        radius=z, conf=z, init_time=z, last_time=z,
        valid=jnp.zeros((capacity,), bool),
        count=jnp.int32(0),
    )


_FLOAT_FIELDS = _POS + _NRM + _COL + ("radius", "conf", "init_time", "last_time")


def compact(store: SurfelStore, keep: jnp.ndarray) -> SurfelStore:
    """Stream compaction: keep the surfels where `keep & valid`, packed to the
    front, order-preserving.  The TPU equivalent of the reference's transform-
    feedback geometry-shader discard + GL_PRIMITIVES_GENERATED query
    (Core/Model/Model.cpp:626-676).

    Cumsum -> inverse permutation (one scalar scatter) -> one bandwidth-speed
    scalar GATHER per attribute.  Planar on purpose: packing the attributes
    into (N, C) row tables first is a minor-axis relayout of beyond-VMEM
    arrays (~60x bandwidth — it made fuse+clean cost 162 ms/frame on a v5e);
    13 scalar gathers run at memory bandwidth."""
    keep = keep & store.valid
    n = store.capacity
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    new_count = jnp.sum(keep.astype(jnp.int32))
    dest = jnp.where(keep, dest, n)  # dropped -> scatter-dropped

    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    src = jnp.full((n,), jnp.int32(0)).at[dest].set(iota, mode="drop")
    has = iota < new_count
    from cofusion_tpu.ops.rows import take_rows

    fetched = take_rows([getattr(store, f) for f in _FLOAT_FIELDS], src)
    out = {
        f: jnp.where(has, v, 0.0) for f, v in zip(_FLOAT_FIELDS, fetched)
    }
    return SurfelStore(count=new_count, valid=has, **out)


def append(store: SurfelStore, new: SurfelStore, new_mask: jnp.ndarray) -> SurfelStore:
    """Append the surfels of `new` where `new_mask`, after the current prefix.
    Overflow beyond capacity is dropped (the reference simply overruns its
    preallocated VBO; we bound it)."""
    n = store.capacity
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    dest = jnp.where(new_mask, store.count + rank, n)
    appended = jnp.sum(new_mask.astype(jnp.int32))
    new_count = jnp.minimum(store.count + appended, n)

    out = {
        f: getattr(store, f).at[dest].set(getattr(new, f), mode="drop")
        for f in DATA_FIELDS
    }
    out["valid"] = jnp.arange(n) < new_count
    return SurfelStore(count=new_count, **out)


def concat_stores(a: SurfelStore, b: SurfelStore) -> SurfelStore:
    """Concatenate two stores (capacity a+b) and re-pack the valid prefix —
    used by loop-closure deformation to sample graph nodes over the whole
    two-tier map in (approximate) time order: pass the stable tier as `a`."""
    out = {
        f: jnp.concatenate([getattr(a, f), getattr(b, f)], axis=0)
        for f in DATA_FIELDS
    }
    cat = SurfelStore(count=jnp.int32(0), **out)
    return compact(cat, cat.valid)


def expel_split(
    store: SurfelStore, keep: jnp.ndarray, expel: jnp.ndarray, block: int
) -> tuple[SurfelStore, SurfelStore]:
    """Two-tier maintenance step: partition the kept surfels into the ones that
    STAY in the active tier and an expel block bound for the stable tier.

    `keep`: survivors of the clean pass; `expel`: surfels that aged out of the
    active time window (the reference's timeDelta gate, copy_unstable.vert:136 —
    inactive surfels are immune to cleaning and only ever touched again by loop
    closures, so they can live in an append-only tier that per-frame passes
    never scan).  At most `block` surfels are expelled per frame; the overflow
    stays active one extra frame and re-queues.

    Returns (new_active_store, expel_block_store) where the block store has
    capacity `block` and its valid prefix holds the expelled surfels.
    """
    keep = keep & store.valid
    expel = expel & keep
    n = store.capacity
    rank = jnp.cumsum(expel.astype(jnp.int32)) - 1
    taken = expel & (rank < block)
    stay = keep & ~taken

    dest = jnp.where(taken, rank, block)
    n_ex = jnp.minimum(jnp.sum(expel.astype(jnp.int32)), block)

    # inverse permutation into the block + ONE row-packed gather (see compact)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    src_b = jnp.full((block,), jnp.int32(0)).at[dest].set(iota, mode="drop")
    has_b = jnp.arange(block) < n_ex
    from cofusion_tpu.ops.rows import take_rows

    fetched = take_rows([getattr(store, f) for f in _FLOAT_FIELDS], src_b)
    out = {
        f: jnp.where(has_b, v, 0.0) for f, v in zip(_FLOAT_FIELDS, fetched)
    }
    blk = SurfelStore(count=n_ex, valid=has_b, **out)
    return compact(store, stay), blk


def append_block(stable: SurfelStore, blk: SurfelStore) -> SurfelStore:
    """Append an expel block to the stable tier with ONE contiguous
    dynamic-slice write per attribute (no scatter; a contiguous DMA).  The
    tier is a ring: `count` is the monotone total-appended cursor, writes land
    at count mod S, and on overflow the OLDEST rows are overwritten
    round-robin (bounded loss, like the reference overrunning its preallocated
    VBO, Model.cpp:92-98).  The per-row `valid` mask is authoritative for
    reads; clip `count` to S for display."""
    S = stable.capacity
    B = blk.capacity
    off_raw = jnp.mod(stable.count, S)
    wrap = off_raw + B > S
    base = jnp.where(wrap, stable.count - off_raw + S, stable.count)
    off = jnp.mod(base, S)
    new_count = base + blk.count

    out = {
        f: jax.lax.dynamic_update_slice_in_dim(
            getattr(stable, f), getattr(blk, f), off, axis=0
        )
        for f in DATA_FIELDS
    }
    return SurfelStore(count=new_count, **out)


def download(store: SurfelStore) -> dict:
    """Host-side export (Model::downloadMap, Core/Model/Model.cpp:868-899):
    returns numpy arrays of the valid prefix."""
    import numpy as np

    n = int(store.count)

    def take(f):
        return np.asarray(getattr(store, f)[:n])

    return {
        "pos": np.stack([take("px"), take("py"), take("pz")], axis=-1),
        "normal": np.stack([take("nx"), take("ny"), take("nz")], axis=-1),
        "color": np.stack([take("cr"), take("cg"), take("cb")], axis=-1),
        "radius": take("radius"),
        "conf": take("conf"),
        "init_time": take("init_time"),
        "last_time": take("last_time"),
    }


def download_masked(store: SurfelStore) -> dict:
    """Host-side export filtered by the explicit valid mask — for the stable
    tier, whose valid mask (not the prefix) is authoritative (rows beyond the
    append cursor can stay valid across an overflow clamp)."""
    import numpy as np

    m = np.asarray(store.valid)

    def take(f):
        return np.asarray(getattr(store, f))[m]

    return {
        "pos": np.stack([take("px"), take("py"), take("pz")], axis=-1),
        "normal": np.stack([take("nx"), take("ny"), take("nz")], axis=-1),
        "color": np.stack([take("cr"), take("cg"), take("cb")], axis=-1),
        "radius": take("radius"),
        "conf": take("conf"),
        "init_time": take("init_time"),
        "last_time": take("last_time"),
    }
