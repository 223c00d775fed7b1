"""Sharding layouts for multi-chip operation.

Layout rationale (single-host SLAM analogue of dp/sp from the scaling playbook):
  * the surfel axis N is the big data axis (up to 9.4M per model x 48B+) —
    sharding it is "data parallelism" over the map: fuse scatters, clean passes,
    and point renders partition cleanly, with one scatter-min z-buffer combine
    (an ICI all-reduce XLA inserts on the (H*W,) buffers);
  * image rows shard as "sequence/pixel parallelism" for the preprocessing and
    per-pixel association stages (window stencils become halo exchanges);
  * poses, per-model scalars and the 6x6 GN systems are replicated — they are
    bytes, and every device needs them every iteration.

Tested by __graft_entry__.dryrun_multichip on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int, axis: str = "d") -> Mesh:
    devices = np.array(jax.devices()[:n_devices])
    return Mesh(devices, (axis,))


def shard_frame(mesh: Mesh, *arrays):
    """Shard (H, W[, C]) frame arrays along rows."""
    sh = NamedSharding(mesh, P("d"))
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def shard_engine_state(state, mesh: Mesh):
    """Sharding tree for an EngineState: surfel axis + image rows sharded,
    everything else replicated."""
    rep = NamedSharding(mesh, P())
    img = NamedSharding(mesh, P("d"))

    def store_leaf(a):
        # store leaves are (M, N, ...) — shard N
        if hasattr(a, "ndim") and a.ndim >= 2:
            return NamedSharding(mesh, P(None, "d"))
        return rep

    models = state.models
    models_sh = models._replace(
        store=jax.tree.map(store_leaf, models.store),
        stable=jax.tree.map(store_leaf, models.stable),
        pose=rep, prev_pose=rep, conf_threshold=rep, max_depth=rep,
        active=rep, age=rep, model_id=rep, unseen=rep, spawn_cooldown=rep,
    )
    fern_sh = jax.tree.map(lambda a: rep, state.fern_db)
    # carried prediction: (M, H, W[, C]) leaves — shard image rows like the
    # other per-model image stacks
    pred_sh = jax.tree.map(lambda a: NamedSharding(mesh, P(None, "d")), state.pred)
    sh = state._replace(
        models=models_sh,
        tick=rep,
        so3_ref=img,
        icp_error_maps=NamedSharding(mesh, P(None, "d")),
        prev_rgb=img,
        prev_filtered=img,
        prev_mask=img,
        pose_history=rep,
        fern_db=fern_sh,
        lost=rep,
        unstable_count=rep,
        mask_history=NamedSharding(mesh, P(None, "d")),
        pred=pred_sh,
    )
    return jax.device_put(state, sh)
