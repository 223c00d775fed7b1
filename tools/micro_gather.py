"""Probe the TPU gather/scatter table-size cliff and candidate workarounds.

micro_clean.py found: take(table[307k], idx[524k]) = 0.04 ms but
take(table[524k], idx[524k]) = 5.36 ms — a ~130x cliff on the TABLE size.
This probes where the cliff is and which forms dodge it.
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def drain(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[:1] if hasattr(leaf, 'ravel') else leaf)


def timeit(name, fn, *args, reps=30):
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
    key = jax.random.PRNGKey(0)
    NI = 524288
    idx_f = jax.random.randint(key, (NI,), 0, 10**9)

    # ---- table size sweep, random indices ----
    for T in [262144, 307200, 327680, 360448, 393216, 458752, 524288, 1048576, 4194304]:
        table = jax.random.uniform(jax.random.PRNGKey(1), (T,))
        idx = idx_f % T
        idx.block_until_ready()
        timeit(f"take(table[{T//1024}k], idx[512k]) default", jax.jit(jnp.take), table, idx)

    T = 524288
    table = jax.random.uniform(jax.random.PRNGKey(1), (T,))
    idx = idx_f % T
    srt = jnp.sort(idx)
    srt.block_until_ready()

    timeit("at[].get mode=promise_in_bounds", jax.jit(
        lambda t, i: t.at[i].get(mode="promise_in_bounds")), table, idx)
    timeit("at[].get mode=clip", jax.jit(
        lambda t, i: t.at[i].get(mode="clip")), table, idx)
    timeit("at[].get sorted+promise", jax.jit(
        lambda t, i: t.at[i].get(mode="promise_in_bounds", indices_are_sorted=True)), table, srt)
    timeit("at[].get unique+sorted+promise", jax.jit(
        lambda t, i: t.at[i].get(mode="promise_in_bounds", indices_are_sorted=True,
                                 unique_indices=True)), table, srt)

    # chunked gather: 2 half-tables + select
    def chunked2(t, i):
        h = t.shape[0] // 2
        lo = jnp.take(t[:h], jnp.minimum(i, h - 1))
        hi = jnp.take(t[h:], jnp.maximum(i - h, 0))
        return jnp.where(i < h, lo, hi)
    timeit("chunked2 take (2x256k tables)", jax.jit(chunked2), table, idx)

    def chunkedK(t, i, K):
        c = t.shape[0] // K
        out = jnp.zeros(i.shape, t.dtype)
        for k in range(K):
            part = jnp.take(t[k * c:(k + 1) * c], jnp.clip(i - k * c, 0, c - 1))
            out = jnp.where((i >= k * c) & (i < (k + 1) * c), part, out)
        return out
    timeit("chunked4 take (4x128k tables)", jax.jit(lambda t, i: chunkedK(t, i, 4)), table, idx)

    T16 = 4194304
    table16 = jax.random.uniform(jax.random.PRNGKey(2), (T16,))
    idx16 = idx_f % T16
    idx16.block_until_ready()
    timeit("chunked16 take from 4M table", jax.jit(lambda t, i: chunkedK(t, i, 16)), table16, idx16)

    # 13 channels from one 524k table, same indices (the compact/pidx shape)
    tables = [jax.random.uniform(jax.random.PRNGKey(10 + c), (T,)) for c in range(13)]
    timeit("13ch take from 524k tables", jax.jit(
        lambda i, *ts: sum(jnp.take(t, i) for t in ts)), idx, *tables)
    timeit("13ch chunked2 from 524k tables", jax.jit(
        lambda i, *ts: sum(chunked2(t, i) for t in ts)), idx, *tables)

    # ---- scatter bucket-size sweep ----
    val = jax.random.uniform(jax.random.PRNGKey(3), (NI,))
    for B in [307200, 524288, 1048576]:
        d = idx_f % B
        d.block_until_ready()
        timeit(f"scatter set[512k -> {B//1024}k]", jax.jit(
            lambda dd, vv, B=B: jnp.zeros((B,)).at[dd].set(vv, mode="drop")), d, val)

    def chunked_scatter(d, v, B, K):
        c = B // K
        outs = []
        for k in range(K):
            m = (d >= k * c) & (d < (k + 1) * c)
            dd = jnp.where(m, d - k * c, c)
            outs.append(jnp.zeros((c,)).at[dd].set(v, mode="drop"))
        return jnp.concatenate(outs)
    timeit("chunked2 scatter set[512k -> 2x256k]", jax.jit(
        lambda d, v: chunked_scatter(d, v, 524288, 2)), idx_f % 524288, val)

    # ---- fusion pathology: computed (unmaterialized) table operand ----
    imgA = jax.random.uniform(jax.random.PRNGKey(4), (480, 640))
    imgB = jax.random.uniform(jax.random.PRNGKey(5), (480, 640))
    li = idx_f % (480 * 640)

    def fused_table(a, b, i):
        t = jnp.where(a > 0.5, b, -jnp.inf).reshape(-1)  # computed table
        return jnp.take(t, i)
    timeit("take from COMPUTED 307k table (fused)", jax.jit(fused_table), imgA, imgB, li)

    def barrier_table(a, b, i):
        t = jnp.where(a > 0.5, b, -jnp.inf).reshape(-1)
        t = jax.lax.optimization_barrier(t)
        return jnp.take(t, i)
    timeit("take from COMPUTED 307k table (barrier)", jax.jit(barrier_table), imgA, imgB, li)

    # 5 computed channels x 9 taps (the dup-loop shape)
    def dup_like(a, b, i, barrier):
        chans = [jnp.where(a > 0.3 + 0.1 * c, b + c, -jnp.inf).reshape(-1) for c in range(5)]
        if barrier:
            chans = list(jax.lax.optimization_barrier(tuple(chans)))
        acc = jnp.zeros(i.shape)
        for off in (-641, -640, -639, -1, 0, 1, 639, 640, 641):
            ii = jnp.clip(i + off, 0, 480 * 640 - 1)
            for t in chans:
                acc = acc + jnp.take(t, ii)
        return acc
    timeit("dup-like 9x5 takes (fused tables)", jax.jit(
        lambda a, b, i: dup_like(a, b, i, False)), imgA, imgB, li)
    timeit("dup-like 9x5 takes (barrier tables)", jax.jit(
        lambda a, b, i: dup_like(a, b, i, True)), imgA, imgB, li)


if __name__ == "__main__":
    main()
