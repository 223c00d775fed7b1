"""Fixed-capacity surfel map — the central data structure.

The reference packs each surfel as 3 x vec4 = 48 B in OpenGL VBOs
(Core/Shaders/Vertex.cpp:20-42): (x,y,z,conf), (encoded-rgb, <unused>, initTime,
lastUpdate/state), (nx,ny,nz,radius), with capacity 3072^2 per model
(Core/Model/Model.cpp:92-98) and ping-pong buffer swaps after fuse/clean.

TPU-native layout: a struct-of-arrays NamedTuple pytree.  Planar (N,) / (N, 3)
float32 arrays keep the lane dimension dense for the VPU, make the update pass a
batched scatter, and make the whole store shardable along N with jax.sharding.
There is no ping-pong: XLA's functional updates + donation give the same effect.

Invalid slots are `valid == False` (not NaN); `count` tracks the allocated prefix
(the store is always kept compacted: valid slots form a prefix after `clean`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SurfelStore(NamedTuple):
    """One model's surfel map (vmap over a leading axis for the model batch)."""

    pos: jnp.ndarray        # (N, 3) world-frame position
    normal: jnp.ndarray     # (N, 3) world-frame unit normal
    color: jnp.ndarray      # (N, 3) rgb in [0, 255] (reference encodes into one float)
    radius: jnp.ndarray     # (N,)
    conf: jnp.ndarray       # (N,) accumulated confidence
    init_time: jnp.ndarray  # (N,) tick when created        (vColor.z)
    last_time: jnp.ndarray  # (N,) tick of last update      (vColor.w)
    valid: jnp.ndarray      # (N,) bool
    count: jnp.ndarray      # () int32 — number of valid surfels (prefix)

    @property
    def capacity(self) -> int:
        return self.pos.shape[-2]


def empty_store(capacity: int) -> SurfelStore:
    return SurfelStore(
        pos=jnp.zeros((capacity, 3), jnp.float32),
        normal=jnp.zeros((capacity, 3), jnp.float32),
        color=jnp.zeros((capacity, 3), jnp.float32),
        radius=jnp.zeros((capacity,), jnp.float32),
        conf=jnp.zeros((capacity,), jnp.float32),
        init_time=jnp.zeros((capacity,), jnp.float32),
        last_time=jnp.zeros((capacity,), jnp.float32),
        valid=jnp.zeros((capacity,), bool),
        count=jnp.int32(0),
    )


def compact(store: SurfelStore, keep: jnp.ndarray) -> SurfelStore:
    """Stream compaction: keep the surfels where `keep & valid`, packed to the
    front, order-preserving.  The TPU equivalent of the reference's transform-
    feedback geometry-shader discard + GL_PRIMITIVES_GENERATED query
    (Core/Model/Model.cpp:626-676).
    """
    keep = keep & store.valid
    n = store.capacity
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1  # target slot per kept surfel
    new_count = jnp.sum(keep.astype(jnp.int32))
    dest = jnp.where(keep, dest, n)  # dropped -> scatter-dropped

    def scatter(arr):
        out = jnp.zeros_like(arr)
        return out.at[dest].set(arr, mode="drop")

    return SurfelStore(
        pos=scatter(store.pos),
        normal=scatter(store.normal),
        color=scatter(store.color),
        radius=scatter(store.radius),
        conf=scatter(store.conf),
        init_time=scatter(store.init_time),
        last_time=scatter(store.last_time),
        valid=jnp.arange(n) < new_count,
        count=new_count,
    )


def append(store: SurfelStore, new: SurfelStore, new_mask: jnp.ndarray) -> SurfelStore:
    """Append the surfels of `new` where `new_mask`, after the current prefix.
    Overflow beyond capacity is dropped (the reference simply overruns its
    preallocated VBO; we bound it)."""
    n = store.capacity
    rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    dest = jnp.where(new_mask, store.count + rank, n)
    appended = jnp.sum(new_mask.astype(jnp.int32))
    new_count = jnp.minimum(store.count + appended, n)

    def scatter(dst, src):
        return dst.at[dest].set(src, mode="drop")

    return SurfelStore(
        pos=scatter(store.pos, new.pos),
        normal=scatter(store.normal, new.normal),
        color=scatter(store.color, new.color),
        radius=scatter(store.radius, new.radius),
        conf=scatter(store.conf, new.conf),
        init_time=scatter(store.init_time, new.init_time),
        last_time=scatter(store.last_time, new.last_time),
        valid=jnp.arange(n) < new_count,
        count=new_count,
    )


def download(store: SurfelStore) -> dict:
    """Host-side export (Model::downloadMap, Core/Model/Model.cpp:868-899):
    returns numpy arrays of the valid prefix."""
    import numpy as np

    n = int(store.count)
    return {
        "pos": np.asarray(store.pos[:n]),
        "normal": np.asarray(store.normal[:n]),
        "color": np.asarray(store.color[:n]),
        "radius": np.asarray(store.radius[:n]),
        "conf": np.asarray(store.conf[:n]),
        "init_time": np.asarray(store.init_time[:n]),
        "last_time": np.asarray(store.last_time[:n]),
    }
