"""Bisect the real clean_eval dup-loop pathology: which operand being fused
(indices from the projection chain, or tables from imap) triggers the slow
gather path.  Run: python tools/micro_clean2.py"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig
from cofusion_tpu.models import surfel_model as sm
from cofusion_tpu.ops import rasterize as rz
from cofusion_tpu.ops.lie import invert_rt


def drain(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[:1] if hasattr(leaf, 'ravel') else leaf)


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    drain(out)
    dt = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{name:58s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    cam = CameraConfig()
    H, W = cam.height, cam.width
    HW = H * W
    N = 524288

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    px = jax.random.uniform(ks[0], (N,), minval=-1.5, maxval=1.5)
    py = jax.random.uniform(ks[1], (N,), minval=-1.5, maxval=1.5)
    pz = jax.random.uniform(ks[2], (N,), minval=0.5, maxval=4.0)
    radius = jnp.full((N,), 0.01)
    init_time = jnp.zeros((N,))
    valid = jnp.ones((N,), bool)
    pose = jnp.eye(4, dtype=jnp.float32)

    z_dup = jax.random.uniform(ks[3], (HW,))
    z_zdup = jax.random.uniform(ks[4], (HW,))
    it_q = jax.random.uniform(ks[5], (HW,))
    qx_t = jax.random.uniform(ks[6], (HW,))
    qy_t = jax.random.uniform(ks[7], (HW,))

    def project(px, py, pz, pose):
        t_inv = invert_rt(pose)
        lx, ly, zl = rz.rotate_planar(t_inv[:3, :3], px, py, pz, t_inv[:3, 3])
        zs = jnp.where(zl == 0, 1.0, zl)
        xpix = lx * cam.fx / zs + cam.cx
        ypix = ly * cam.fy / zs + cam.cy
        xi = jnp.floor(xpix).astype(jnp.int32)
        yi = jnp.floor(ypix).astype(jnp.int32)
        inb = (xpix > 0) & (ypix > 0) & (xpix < W) & (ypix < H) & (zl > 0)
        lin = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        return lx, ly, zl, xi, yi, inb, lin

    def dup(px, py, pz, pose, z_dup, z_zdup, it_q, qx_t, qy_t,
            bar_idx=False, bar_tap=False, taps=9, preds=True):
        lx, ly, zl, xi, yi, inb, lin = project(px, py, pz, pose)
        search_ok = valid & inb
        if bar_idx:
            lin, xi, yi, lx, ly, zl, search_ok = jax.lax.optimization_barrier(
                (lin, xi, yi, lx, ly, zl, search_ok))
        count = jnp.zeros((N,), jnp.int32)
        z_count = jnp.zeros((N,), jnp.int32)
        rad_gate = radius * 1.4
        offs = [(dy, dx) for dy in range(-1, 2) for dx in range(-1, 2)][:taps]
        for dy, dx in offs:
            off = dy * W + dx
            oob = (xi + dx < 0) | (xi + dx >= W) | (yi + dy < 0) | (yi + dy >= H)
            ok_tap = ~oob & search_ok
            li = jnp.clip(lin + off, 0, HW - 1)
            if bar_tap:
                li = jax.lax.optimization_barrier(li)
            zd = jnp.take(z_dup, li)
            zz = jnp.take(z_zdup, li)
            it = jnp.take(it_q, li)
            qx = jnp.take(qx_t, li)
            qy = jnp.take(qy_t, li)
            if preds:
                d = (ok_tap & (it < init_time) & (zd > zl) & (zd - zl < 0.01)
                     & ((qx - lx) ** 2 + (qy - ly) ** 2 < rad_gate * rad_gate))
                count = count + d.astype(jnp.int32)
                zdup = ok_tap & (zz > zl) & (zz - zl > 0.01)
                z_count = z_count + zdup.astype(jnp.int32)
            else:
                count = count + (zd + zz + it + qx + qy).astype(jnp.int32)
        return count, z_count

    a = (px, py, pz, pose, z_dup, z_zdup, it_q, qx_t, qy_t)
    timeit("dup real (9 taps, preds)", jax.jit(lambda *a: dup(*a)), *a)
    timeit("dup 1 tap", jax.jit(lambda *a: dup(*a, taps=1)), *a)
    timeit("dup 3 taps", jax.jit(lambda *a: dup(*a, taps=3)), *a)
    timeit("dup 9 taps no preds", jax.jit(lambda *a: dup(*a, preds=False)), *a)
    timeit("dup 9 taps barrier-idx", jax.jit(lambda *a: dup(*a, bar_idx=True)), *a)
    timeit("dup 9 taps barrier-tap-li", jax.jit(lambda *a: dup(*a, bar_tap=True)), *a)
    timeit("dup 9 taps barrier both", jax.jit(lambda *a: dup(*a, bar_idx=True, bar_tap=True)), *a)

    # compact bisect
    store = sm.SurfelStore(
        px=px, py=py, pz=pz, nx=px, ny=py, nz=pz, cr=px, cg=py, cb=pz,
        radius=radius, conf=px, init_time=init_time, last_time=init_time,
        valid=valid, count=jnp.int32(N),
    )
    keep = jax.random.uniform(jax.random.PRNGKey(9), (N,)) > 0.1

    timeit("compact real", jax.jit(sm.compact), store, keep)

    def compact_bar(store, keep):
        keep = keep & store.valid
        n = store.capacity
        dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
        new_count = jnp.sum(keep.astype(jnp.int32))
        dest = jnp.where(keep, dest, n)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        src = jnp.full((n,), jnp.int32(0)).at[dest].set(iota, mode="drop")
        src = jax.lax.optimization_barrier(src)
        has = iota < new_count
        out = {
            f: jnp.where(has, jnp.take(getattr(store, f), src), 0.0)
            for f in sm._FLOAT_FIELDS
        }
        return sm.SurfelStore(count=new_count, valid=has, **out)
    timeit("compact barrier-src", jax.jit(compact_bar), store, keep)

    def compact_parts(store, keep):
        keep = keep & store.valid
        n = store.capacity
        dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dest = jnp.where(keep, dest, n)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
        src = jnp.full((n,), jnp.int32(0)).at[dest].set(iota, mode="drop")
        return src
    timeit("compact: cumsum+scatter only", jax.jit(compact_parts), store, keep)

    src = jax.jit(compact_parts)(store, keep)
    src.block_until_ready()
    timeit("compact: 13 gathers only (src arg)", jax.jit(
        lambda store, src: sm.SurfelStore(
            count=jnp.int32(0), valid=valid,
            **{f: jnp.take(getattr(store, f), src) for f in sm._FLOAT_FIELDS})),
        store, src)

    # pidx gather-channels bisect
    td = jnp.int32(200)
    tick = jnp.int32(10)
    imap_fn = jax.jit(lambda s, p: rz.predict_indices(s, p, cam, tick, td, 4.5))
    store2 = store._replace(nz=jnp.ones((N,)), conf=jnp.full((N,), 5.0),
                            last_time=jnp.full((N,), 9.0))
    timeit("pidx full real", imap_fn, store2, pose)

    def pidx_bar(store, pose):
        n = store.capacity
        lx, ly, lz, lnx, lny, lnz, ui, vi, inb = rz._project_store(store, pose, cam)
        ok = store.valid & (lz > 0) & (lz <= 4.5) & inb
        lin = jnp.where(ok, vi * W + ui, HW)
        ibuf = rz._zbuffer(lin, ok, lz, 0, HW, n, 4.5)
        has = ibuf < n
        i0 = jnp.where(has, ibuf, 0)
        i0 = jax.lax.optimization_barrier(i0)
        return rz._gather_channels(store, lx, ly, lz, lnx, lny, lnz, i0, has, (H, W))
    timeit("pidx full barrier-i0", jax.jit(pidx_bar), store2, pose)


if __name__ == "__main__":
    main()
