"""Embedded deformation graph (Sumner-style) for loop closure — TPU rewrite of
Core/Utils/DeformationGraph.{h,cpp} + Core/Model/Deformation.{h,cpp} +
CholeskyDecomp.{h,cpp}.

Reference structure: nodes sampled time-sequentially from the surfel map
(Deformation.cpp:207-276), k=4 sequential-neighbor connectivity
(DeformationGraph::connectGraphSeq :218-245), energy = wRot*E_rot (6 rows/node)
+ wReg*E_reg (3 rows/edge) + wCon*E_con (3 rows/constraint) with weights
1/10/100 (DeformationGraph.cpp:25-27), <=3 Gauss-Newton iterations with a
CHOLMOD sparse solve (optimiseGraphSparse :384-457); surfels and poses warped by
k=4 nearest-in-time nodes with weights (1 - d/dmax)^2
(weightVerticesSeq :247-343, applyGraphToPoses :89-116).

TPU design: node count is small (<=1024) so the normal equations are assembled
DENSELY and solved with one on-device Cholesky — a (12G)^2 matrix at G=256 is a
9.4 MB MXU-friendly solve, replacing CHOLMOD.  The Jacobian comes from
`jax.jacrev` of the residual stack (exactness over hand-coded sparsity; the
system is tiny compared to the per-frame pipeline).  Warping is a batched
gather over each surfel's 4 nearest nodes in init-time order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cofusion_tpu.models.surfel_model import SurfelStore

_HI = jax.lax.Precision.HIGHEST


class DeformationGraph(NamedTuple):
    positions: jnp.ndarray   # (G, 3) node positions (sampled surfels)
    times: jnp.ndarray       # (G,) node init times (nondecreasing)
    R: jnp.ndarray           # (G, 3, 3) node rotations
    t: jnp.ndarray           # (G, 3) node translations
    valid: jnp.ndarray       # (G,) bool
    count: jnp.ndarray       # () int32


def sample_graph(store: SurfelStore, num_nodes: int) -> DeformationGraph:
    """Time-sequential node sampling (Deformation::sampleGraphModel): every
    count/G-th surfel of the valid prefix.  The store is append-ordered, so
    init times are (approximately) nondecreasing; a running max enforces the
    monotonicity the reference asserts (Deformation.cpp:193-195)."""
    n = store.capacity
    cnt = jnp.maximum(store.count, 1)
    g = jnp.arange(num_nodes)
    idx = jnp.clip((g * cnt) // num_nodes, 0, n - 1)
    pos = jnp.take(store.pos, idx, axis=0)
    times = jnp.take(store.init_time, idx)
    times = jax.lax.associative_scan(jnp.maximum, times)
    valid = g < jnp.minimum(store.count, num_nodes)
    G = num_nodes
    return DeformationGraph(
        positions=pos,
        times=times,
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (G, 3, 3)),
        t=jnp.zeros((G, 3), jnp.float32),
        valid=valid,
        count=jnp.minimum(store.count, num_nodes),
    )


def _neighbors(G: int, k: int = 4):
    """Sequential connectivity (connectGraphSeq): node i's neighbors are the k
    temporally adjacent nodes, clipped into range."""
    i = jnp.arange(G)[:, None]
    offs = jnp.asarray([o for o in range(-(k // 2), k // 2 + 2) if o != 0][:k])[None, :]
    return jnp.clip(i + offs, 0, G - 1)  # (G, k)


def _knn_time_weights(graph: DeformationGraph, points: jnp.ndarray, ptimes: jnp.ndarray, k: int = 4):
    """k nearest nodes by init-time locality then distance (weightVerticesSeq):
    binary-search the node times for each point time, take a 2k window, keep the
    k nearest in space with weights (1 - d/dmax)^2 normalized."""
    G = graph.times.shape[0]
    base = jnp.searchsorted(graph.times, ptimes, side="left")  # (P,)
    window = jnp.arange(-k, k)  # 2k candidates
    cand = jnp.clip(base[:, None] + window[None, :], 0, G - 1)  # (P, 2k)
    cpos = jnp.take(graph.positions, cand, axis=0)  # (P, 2k, 3)
    d2 = jnp.sum((cpos - points[:, None, :]) ** 2, axis=-1)
    cvalid = jnp.take(graph.valid, cand)
    d2 = jnp.where(cvalid, d2, jnp.inf)
    # k+1 smallest: dmax is the (k+1)-th distance so the k-th weight stays > 0
    # (with dmax = k-th distance every boundary-clipped window degenerates to
    # all-zero weights)
    neg_top, top_idx = jax.lax.top_k(-d2, k + 1)
    dists = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
    nidx = jnp.take_along_axis(cand, top_idx[:, :k], axis=1)  # (P, k)
    dmax = jnp.maximum(dists[:, k], 1e-6)
    w = (1.0 - dists[:, :k] / dmax[:, None]) ** 2
    w = jnp.where(jnp.isfinite(w), w, 0.0)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    # degenerate window (all candidates identical): fall back to uniform
    w = jnp.where(wsum > 1e-9, w / jnp.maximum(wsum, 1e-9), 1.0 / k)
    return nidx, w


def warp_points(graph: DeformationGraph, points: jnp.ndarray, ptimes: jnp.ndarray, k: int = 4):
    """phi(p) = sum_j w_j [R_j (p - g_j) + g_j + t_j] (Sumner eq., copy_unstable
    .vert:155-335 / weightVerticesSeq)."""
    nidx, w = _knn_time_weights(graph, points, ptimes, k)
    Rj = jnp.take(graph.R, nidx, axis=0)        # (P, k, 3, 3)
    gj = jnp.take(graph.positions, nidx, axis=0)
    tj = jnp.take(graph.t, nidx, axis=0)
    rel = points[:, None, :] - gj
    moved = jnp.einsum("pkij,pkj->pki", Rj, rel, precision=_HI) + gj + tj
    return jnp.sum(w[:, :, None] * moved, axis=1)


def warp_normals(graph: DeformationGraph, normals: jnp.ndarray, ptimes: jnp.ndarray, points: jnp.ndarray, k: int = 4):
    nidx, w = _knn_time_weights(graph, points, ptimes, k)
    Rj = jnp.take(graph.R, nidx, axis=0)
    rotated = jnp.einsum("pkij,pkj->pki", Rj, normals[:, None, :].repeat(k, 1), precision=_HI)
    out = jnp.sum(w[:, :, None] * rotated, axis=1)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return jnp.where(norm > 1e-9, out / jnp.maximum(norm, 1e-9), normals)


def _residuals(params, graph: DeformationGraph, src, src_t, tgt, cons_valid,
               w_rot=1.0, w_reg=10.0, w_con=100.0, k=4):
    """Energy rows (DeformationGraph.h:105-108): returns the stacked residual
    vector."""
    R = params["R"]
    t = params["t"]
    G = R.shape[0]
    nv = graph.valid.astype(jnp.float32)

    # E_rot: orthonormality of each R (6 rows per node)
    c0, c1, c2 = R[:, :, 0], R[:, :, 1], R[:, :, 2]
    rot = jnp.stack(
        [
            jnp.sum(c0 * c1, -1), jnp.sum(c0 * c2, -1), jnp.sum(c1 * c2, -1),
            jnp.sum(c0 * c0, -1) - 1.0, jnp.sum(c1 * c1, -1) - 1.0, jnp.sum(c2 * c2, -1) - 1.0,
        ],
        axis=1,
    ) * nv[:, None]

    # E_reg: R_j (g_k - g_j) + g_j + t_j - (g_k + t_k) over sequential edges
    nbr = _neighbors(G, k)
    gj = graph.positions[:, None, :]
    gk = jnp.take(graph.positions, nbr, axis=0)
    tk = jnp.take(params["t"], nbr, axis=0)
    rel = gk - gj
    reg = (
        jnp.einsum("gij,gkj->gki", R, rel, precision=_HI)
        + gj + t[:, None, :]
        - (gk + tk)
    ) * nv[:, None, None]

    # E_con: phi(src) - tgt for surface constraints
    g2 = graph._replace(R=R, t=t)
    warped = warp_points(g2, src, src_t, k)
    con = (warped - tgt) * cons_valid[:, None].astype(jnp.float32)

    return jnp.concatenate(
        [
            jnp.sqrt(w_rot) * rot.reshape(-1),
            jnp.sqrt(w_reg) * reg.reshape(-1),
            jnp.sqrt(w_con) * con.reshape(-1),
        ]
    )


@functools.partial(jax.jit, static_argnames=("iters", "k"))
def optimize(
    graph: DeformationGraph,
    src: jnp.ndarray,        # (C, 3) constraint source points (world, current)
    src_times: jnp.ndarray,  # (C,)
    tgt: jnp.ndarray,        # (C, 3) constraint targets
    cons_valid: jnp.ndarray,  # (C,)
    iters: int = 3,
    k: int = 4,
) -> tuple[DeformationGraph, jnp.ndarray]:
    """Gauss-Newton on the stacked energy; dense normal equations + Cholesky
    (replacing CHOLMOD, optimiseGraphSparse).  Returns (graph, final_error)."""
    G = graph.positions.shape[0]

    def error_of(params):
        r = _residuals(params, graph, src, src_times, tgt, cons_valid, k=k)
        return jnp.sum(r * r)

    def gn_step(carry, _):
        params = carry
        r = _residuals(params, graph, src, src_times, tgt, cons_valid, k=k)
        J_tree = jax.jacrev(
            lambda p: _residuals(p, graph, src, src_times, tgt, cons_valid, k=k)
        )(params)
        J = jnp.concatenate(
            [J_tree["R"].reshape(r.shape[0], -1), J_tree["t"].reshape(r.shape[0], -1)],
            axis=1,
        )
        A = jnp.matmul(J.T, J, precision=_HI) + 1e-6 * jnp.eye(J.shape[1])
        b = jnp.matmul(J.T, r, precision=_HI)
        delta = jnp.linalg.solve(A, b)
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0)
        nR = 9 * G
        new_params = {
            "R": params["R"] - delta[:nR].reshape(G, 3, 3),
            "t": params["t"] - delta[nR:].reshape(G, 3),
        }
        # error-increase rollback (DeformationGraph.cpp:438-441)
        better = error_of(new_params) < error_of(params)
        params = jax.tree.map(
            lambda new, old: jnp.where(better, new, old), new_params, params
        )
        return params, None

    params0 = {"R": graph.R, "t": graph.t}
    params, _ = jax.lax.scan(gn_step, params0, None, length=iters)
    final_err = error_of(params)
    return graph._replace(R=params["R"], t=params["t"]), final_err


def mean_constraint_error(
    graph: DeformationGraph, src, src_times, tgt, cons_valid, k: int = 4
):
    """Mean distance of warped constraint sources to their targets — the
    reference's `meanConsError` gate for fern-match deformations
    (Deformation.cpp:134: accept if meanConsError < 0.0003 && error < 0.12)."""
    warped = warp_points(graph, src, src_times, k)
    d = jnp.linalg.norm(warped - tgt, axis=-1)
    w = cons_valid.astype(jnp.float32)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)


def apply_to_surfels(graph: DeformationGraph, store: SurfelStore) -> SurfelStore:
    """Warp all surfels through the graph (copy_unstable.vert:155-335).
    Loop-closure cadence only — the stacked (N, 3) views are acceptable here."""
    from cofusion_tpu.models import surfel_model as sm

    pos = store.pos
    new_pos = warp_points(graph, pos, store.init_time)
    new_norm = warp_normals(graph, store.normal, store.init_time, pos)
    keep = store.valid[:, None]
    out = sm.with_pos(store, jnp.where(keep, new_pos, pos))
    return sm.with_normal(out, jnp.where(keep, new_norm, store.normal))


def refresh_timestamps(
    store: SurfelStore,
    pose: jnp.ndarray,
    cam,
    time,
    depth_cutoff,
    conf_threshold,
) -> SurfelStore:
    """Post-deformation timestamp bookkeeping — the reference's
    `synthesizeDepth` + copy_unstable.vert:316-333: after a deformation (a
    second pose update in the same frame), confident surfels whose projection
    agrees with the synthesized depth of the deformed model get
    last_time = time so they stay in the active window at the corrected pose."""
    from cofusion_tpu.ops import rasterize as rz
    from cofusion_tpu.ops.lie import invert_rt
    from cofusion_tpu.ops.rasterize import _rotate

    H, W = cam.height, cam.width
    # synthesized depth: nearest confident surfel per pixel, no time window
    # (ModelProjection::synthesizeDepth passes timeDelta = USHRT_MAX)
    imap = rz.predict_indices(
        store, pose, cam, time, jnp.int32(1 << 30), depth_cutoff,
        conf_threshold=conf_threshold,
    )
    synth = jnp.where(imap.valid, imap.vert_conf[..., 2], 0.0).reshape(-1)

    t_inv = invert_rt(pose)
    local = _rotate(t_inv[:3, :3], store.pos) + t_inv[:3, 3]
    z = local[..., 2]
    zs = jnp.where(z == 0, 1.0, z)
    x = local[..., 0] * cam.fx / zs + cam.cx
    y = local[..., 1] * cam.fy / zs + cam.cy
    xi = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    inb = (x > 0) & (y > 0) & (x < W) & (y < H) & (z > 0) & (z < depth_cutoff)
    d = jnp.take(synth, yi * W + xi)
    bump = store.valid & (store.conf > conf_threshold) & inb & (d > 0) & (z < d + 0.1)
    tf = jnp.asarray(time, jnp.float32)
    return store._replace(last_time=jnp.where(bump, tf, store.last_time))


def apply_to_poses(
    graph: DeformationGraph, poses: jnp.ndarray, times: jnp.ndarray
) -> jnp.ndarray:
    """Warp a whole pose log through the graph (applyGraphToPoses,
    DeformationGraph.cpp:89-116): each pose's translation is warped like a
    point at its own timestamp, its rotation blended from the k
    nearest-in-time nodes and re-orthonormalized by SVD.  `poses` (P, 4, 4),
    `times` (P,) — one batched pass over the on-device pose-history ring at
    loop-closure cadence."""
    p = poses[:, :3, 3]
    new_p = warp_points(graph, p, times)
    nidx, w = _knn_time_weights(graph, p, times)
    Rj = jnp.take(graph.R, nidx, axis=0)                      # (P, k, 3, 3)
    Rmix = jnp.sum(w[:, :, None, None] * Rj, axis=1)
    R = jnp.einsum("pij,pjk->pik", Rmix, poses[:, :3, :3], precision=_HI)
    u, _, vt = jnp.linalg.svd(R)
    Ro = jnp.einsum("pij,pjk->pik", u, vt, precision=_HI)
    out = jnp.broadcast_to(jnp.eye(4, dtype=poses.dtype), poses.shape)
    return out.at[:, :3, :3].set(Ro).at[:, :3, 3].set(new_p)


def apply_to_pose(graph: DeformationGraph, pose: jnp.ndarray, pose_time) -> jnp.ndarray:
    """Warp a camera pose by its nearest-in-time node (applyGraphToPoses,
    DeformationGraph.cpp:89-116) with SVD re-orthonormalization."""
    p = pose[:3, 3][None]
    t = jnp.asarray(pose_time, jnp.float32)[None]
    new_p = warp_points(graph, p, t)[0]
    nidx, w = _knn_time_weights(graph, p, t)
    Rmix = jnp.sum(w[0][:, None, None] * jnp.take(graph.R, nidx[0], axis=0), axis=0)
    R = jnp.matmul(Rmix, pose[:3, :3], precision=_HI)
    # re-orthonormalize
    u, _, vt = jnp.linalg.svd(R)
    Ro = jnp.matmul(u, vt, precision=_HI)
    out = jnp.eye(4, dtype=pose.dtype)
    out = out.at[:3, :3].set(Ro).at[:3, 3].set(new_p)
    return out
