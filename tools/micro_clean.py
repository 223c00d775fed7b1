"""Micro-profile of the clean/predict sub-ops at bench shapes on real TPU.

The round-3 stage profile (tools/profile_step.py) showed pidx+clean+expel at
542 ms for ONE model (N=524k active tier) — ~100x off the measured
scatter/gather speed-of-light.  This tool times each primitive inside that
path separately to locate the pathology.  Run: python tools/micro_clean.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig
from cofusion_tpu.models import surfel_model as sm
from cofusion_tpu.ops import fusion as fu
from cofusion_tpu.ops import rasterize as rz
from cofusion_tpu.ops.lie import invert_rt


def drain(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
            return
    np.asarray(jax.tree.leaves(x)[0])


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{name:48s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    cam = CameraConfig()
    H, W = cam.height, cam.width
    HW = H * W
    cfg = CoFusionConfig(camera=cam)
    N = cfg.active_capacity
    print(f"[micro] N={N} HW={HW}", flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    # a plausible store: points in front of the camera
    px = jax.random.uniform(ks[0], (N,), minval=-1.5, maxval=1.5)
    py = jax.random.uniform(ks[1], (N,), minval=-1.5, maxval=1.5)
    pz = jax.random.uniform(ks[2], (N,), minval=0.5, maxval=4.0)
    nz_ = jnp.ones((N,))
    z0 = jnp.zeros((N,))
    store = sm.SurfelStore(
        px=px, py=py, pz=pz, nx=z0, ny=z0, nz=nz_,
        cr=z0 + 128, cg=z0 + 128, cb=z0 + 128,
        radius=z0 + 0.01, conf=z0 + 5.0, init_time=z0, last_time=z0 + 9.0,
        valid=jnp.ones((N,), bool), count=jnp.int32(N),
    )
    pose = jnp.eye(4, dtype=jnp.float32)
    depth = jax.random.uniform(ks[3], (H, W), minval=0.5, maxval=4.0)
    mask = jnp.zeros((H, W), jnp.int32)
    tick = jnp.int32(10)
    td = jnp.int32(cfg.time_delta)

    # ---- primitives ----
    table = jax.random.uniform(ks[4], (HW,))
    idx = jax.random.randint(ks[5], (N,), 0, HW)
    timeit("gather  take(table[307k], idx[524k])", jax.jit(lambda t, i: jnp.take(t, i)), table, idx)
    timeit("gatherx5 (5 channels, same idx)",
           jax.jit(lambda t, i: sum(jnp.take(t * (k + 1.0), i) for k in range(5))), table, idx)
    dest = jax.random.randint(ks[6], (N,), 0, HW)
    timeit("scatter set[524k -> 307k]",
           jax.jit(lambda d, v: jnp.zeros((HW,)).at[d].set(v, mode="drop")), dest, px)
    timeit("scatter-min int32 [524k -> 307k]",
           jax.jit(lambda d, v: jnp.full((HW,), 2**31 - 1, jnp.int32).at[d].min(v, mode="drop")),
           dest, idx)
    timeit("cumsum int32 [524k]", jax.jit(lambda v: jnp.cumsum(v)), idx)
    big_dest = jax.random.randint(ks[7], (N,), 0, N)
    timeit("gather take(tableN[524k], idx[524k])", jax.jit(lambda i: jnp.take(px, i)), big_dest)

    # ---- predict_indices decomposition ----
    def proj(store, pose):
        return rz._project_store(store, pose, cam)
    timeit("pidx: project_store", jax.jit(proj), store, pose)

    def zbuf(store, pose):
        lx, ly, lz, lnx, lny, lnz, ui, vi, inb = rz._project_store(store, pose, cam)
        ok = store.valid & (lz > 0) & (lz <= 4.5) & inb
        lin = jnp.where(ok, vi * W + ui, HW)
        return rz._zbuffer(lin, ok, lz, 0, HW, N, 4.5)
    timeit("pidx: project+zbuffer", jax.jit(zbuf), store, pose)

    def full_pidx(store, pose):
        return rz.predict_indices(store, pose, cam, tick, td, 4.5)
    timeit("pidx: full", jax.jit(full_pidx), store, pose)

    imap = jax.jit(full_pidx)(store, pose)
    imap = jax.tree.map(jnp.asarray, imap)

    # ---- clean_eval decomposition ----
    def clean_proj(store, pose):
        t_inv = invert_rt(pose)
        lx, ly, zl = rz.rotate_planar(t_inv[:3, :3], store.px, store.py, store.pz, t_inv[:3, 3])
        _, _, lnz = rz.rotate_planar(t_inv[:3, :3], store.nx, store.ny, store.nz)
        return lx, ly, zl, lnz
    timeit("clean: project only", jax.jit(clean_proj), store, pose)

    def dup_loop(store, pose, imap):
        t_inv = invert_rt(pose)
        lx, ly, zl = rz.rotate_planar(t_inv[:3, :3], store.px, store.py, store.pz, t_inv[:3, 3])
        _, _, lnz = rz.rotate_planar(t_inv[:3, :3], store.nx, store.ny, store.nz)
        zs = jnp.where(zl == 0, 1.0, zl)
        xpix = lx * cam.fx / zs + cam.cx
        ypix = ly * cam.fy / zs + cam.cy
        xi = jnp.floor(xpix).astype(jnp.int32)
        yi = jnp.floor(ypix).astype(jnp.int32)
        inb = (xpix > 0) & (ypix > 0) & (xpix < W) & (ypix < H) & (zl > 0)
        search_ok = store.valid & inb
        lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        q_conf_ok = imap.valid & (imap.vert_conf[..., 3] > 0.5)
        zq = imap.vert_conf[..., 2]
        z_dup = jnp.where(q_conf_ok, zq, -jnp.inf).reshape(-1)
        z_zdup = jnp.where(q_conf_ok & (imap.last_time == tick), zq, -jnp.inf).reshape(-1)
        it_q = jnp.where(imap.valid, imap.color_time[..., 3], jnp.inf).reshape(-1)
        qx_t = imap.vert_conf[..., 0].reshape(-1)
        qy_t = imap.vert_conf[..., 1].reshape(-1)
        count = jnp.zeros((N,), jnp.int32)
        z_count = jnp.zeros((N,), jnp.int32)
        steep = jnp.abs(lnz) > 0.85
        rad_gate = store.radius * 1.4
        for dy in range(-1, 2):
            for dx in range(-1, 2):
                off = dy * W + dx
                oob = (xi + dx < 0) | (xi + dx >= W) | (yi + dy < 0) | (yi + dy >= H)
                ok_tap = ~oob & search_ok
                li = jnp.clip(lin + off, 0, HW - 1)
                zd = jnp.take(z_dup, li)
                zz = jnp.take(z_zdup, li)
                it = jnp.take(it_q, li)
                qx = jnp.take(qx_t, li)
                qy = jnp.take(qy_t, li)
                dup = (ok_tap & (it < store.init_time) & (zd > zl)
                       & (zd - zl < 0.01)
                       & ((qx - lx) ** 2 + (qy - ly) ** 2 < rad_gate * rad_gate))
                count = count + dup.astype(jnp.int32)
                zdup = ok_tap & (zz > zl) & (zz - zl > 0.01) & steep
                z_count = z_count + zdup.astype(jnp.int32)
        return count, z_count
    timeit("clean: dup-tap loop (9x5 takes)", jax.jit(dup_loop), store, pose, imap)

    def full_clean(store, pose, imap, depth, mask):
        return fu.clean_eval(store, imap, depth, mask, 0, pose, cam, cfg,
                             tick, td, jnp.float32(0.5), jnp.float32(3.0))
    timeit("clean: full clean_eval", jax.jit(full_clean), store, pose, imap, depth, mask)

    cleaned, keep = jax.jit(full_clean)(store, pose, imap, depth, mask)
    keep = jnp.asarray(keep)
    aged = (store.last_time > 0) & ((tick.astype(jnp.float32) - store.last_time) > td.astype(jnp.float32))

    timeit("compact [524k]", jax.jit(sm.compact), store, keep)

    def expel(store, keep, aged):
        return sm.expel_split(store, keep, aged, cfg.expel_block)
    timeit("expel_split [524k]", jax.jit(expel), store, keep, aged)

    def clean_expel(store, pose, imap, depth, mask, aged):
        cleaned, keep = fu.clean_eval(store, imap, depth, mask, 0, pose, cam, cfg,
                                      tick, td, jnp.float32(0.5), jnp.float32(3.0))
        st, blk = sm.expel_split(cleaned, keep, aged, cfg.expel_block)
        return st.count
    timeit("clean_eval+expel fused", jax.jit(clean_expel), store, pose, imap, depth, mask, aged)


if __name__ == "__main__":
    main()
