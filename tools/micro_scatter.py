"""Round-5 scatter-strategy shootout (REAL readbacks — block_until_ready lies
on this platform, CLAUDE.md "Measurement honesty").

Question: fuse's update pass issues 11 scatter-adds + 13 scatter-sets of K=77k
indices per model per frame (ops/fusion.py).  Which rewrite wins?

  A  baseline: C separate 1D scatter-add / scatter-set, K indices each
  B  2-wide / 4-wide row scatters (is the (K,8)=45ms cliff already at C=2?)
  C  sorted segment-sum: 1 argsort(K) + 1 row gather(K,C) + cumsum + 1
     boundary scatter(K) + 1 row gather at ends -> per-segment sums at K rows,
     then ONE boundary scatter of end positions + 1 row gather O(A)
  D  scatter-set pixel-id (reference last-write-wins) + O(A) row gather
  E  append rewrite: inverse-perm scatter(K) + row gather(K,C) + C contiguous
     dynamic_update_slice writes, vs C scatter-sets
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

K = 320 * 240          # fuse subgrid at 640x480
C = 11
A_BIG = 1 << 19
A_SMALL = 1 << 17


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{name:58s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    for A in (A_BIG, A_SMALL):
        print(f"--- A = {A>>10}k ---", flush=True)
        tgt_np = rng.integers(0, A, size=K).astype(np.int32)
        tgt_np[rng.random(K) < 0.5] = A  # half dropped, like real merge masks
        tgt = jnp.asarray(tgt_np)
        cols = jnp.asarray(rng.random((C, K)), jnp.float32)
        base = jnp.zeros((A,), jnp.float32)

        # A: C separate 1D scatter-adds
        @jax.jit
        def scat_add_c(tgt, cols):
            return [base.at[tgt].add(cols[i], mode="drop") for i in range(C)]
        bench(f"A: {C} x 1D scatter-add (K={K>>10}k)", scat_add_c, tgt, cols)

        # B: row scatters, width 2 and 4 (scatter into (A, w))
        for w in (2, 4):
            basew = jnp.zeros((A, w), jnp.float32)

            @jax.jit
            def scat_add_w(tgt, cols, basew=basew, w=w):
                outs = []
                for s in range(0, C - w + 1, w):
                    rows = cols[s : s + w].T  # (K, w)
                    outs.append(basew.at[tgt].add(rows, mode="drop"))
                return outs
            n_calls = len(range(0, C - w + 1, w))
            bench(f"B: {n_calls} x {w}-wide row scatter-add", scat_add_w, tgt, cols)

        # C: sorted segment-sum form (accumulate-all preserved)
        @jax.jit
        def seg_sum(tgt, cols):
            order = jnp.argsort(tgt)
            st = jnp.take(tgt, order)
            rows = jnp.take(cols.T, order, axis=0)          # (K, C) one row gather
            cum = jnp.cumsum(rows, axis=0)
            is_end = jnp.concatenate([st[1:] != st[:-1], jnp.ones((1,), bool)])
            is_start = jnp.concatenate([jnp.ones((1,), bool), st[1:] != st[:-1]])
            iota = jnp.arange(K, dtype=jnp.int32)
            start_of = jax.lax.cummax(jnp.where(is_start, iota, -1))
            cum_before = jnp.take(cum, jnp.maximum(start_of - 1, 0), axis=0)
            cum_before = jnp.where((start_of > 0)[:, None], cum_before, 0.0)
            seg = cum - cum_before                          # (K, C) valid at ends
            endpos = jnp.full((A,), K, jnp.int32).at[
                jnp.where(is_end & (st < A), st, A)
            ].set(iota, mode="drop")
            pad = jnp.concatenate([seg, jnp.zeros((1, C), jnp.float32)])
            return jnp.take(pad, jnp.minimum(endpos, K), axis=0)  # (A, C) row gather
        bench("C: sort + segsum + 1 scatter + O(A) row gather", seg_sum, tgt, cols)

        # D: last-write-wins pixel id + O(A) row gather
        @jax.jit
        def lww(tgt, cols):
            src = jnp.full((A,), K, jnp.int32).at[tgt].set(
                jnp.arange(K, dtype=jnp.int32), mode="drop"
            )
            pad = jnp.concatenate([cols.T, jnp.zeros((1, C), jnp.float32)])
            return jnp.take(pad, jnp.minimum(src, K), axis=0)
        bench("D: 1 scatter-set + O(A) row gather (lww)", lww, tgt, cols)

        # E: append path — C scatter-sets vs inverse-perm + gather + DUS
        new_np = rng.random(K) < 0.3
        new = jnp.asarray(new_np)
        count = jnp.int32(A // 3)

        @jax.jit
        def app_scatter(new, cols, count):
            rank = jnp.cumsum(new.astype(jnp.int32)) - 1
            dest = jnp.where(new, count + rank, A)
            return [base.at[dest].set(cols[i], mode="drop") for i in range(C)]
        bench(f"E1: {C} x 1D scatter-set append", app_scatter, new, cols, count)

        @jax.jit
        def app_dus(new, cols, count):
            rank = jnp.cumsum(new.astype(jnp.int32)) - 1
            off = jnp.clip(count, 0, A - K)
            shift = count - off
            blkdest = jnp.where(new, rank + shift, K)
            src = jnp.full((K,), K, jnp.int32).at[blkdest].set(
                jnp.arange(K, dtype=jnp.int32), mode="drop"
            )
            pad = jnp.concatenate([cols.T, jnp.zeros((1, C), jnp.float32)])
            rows = jnp.take(pad, jnp.minimum(src, K), axis=0)  # (K, C)
            appended = jnp.sum(new.astype(jnp.int32))
            jj = jnp.arange(K)
            live = (jj >= shift) & (jj < shift + appended)
            outs = []
            for i in range(C):
                cur = jax.lax.dynamic_slice(base, (off,), (K,))
                merged = jnp.where(live, rows[:, i], cur)
                outs.append(jax.lax.dynamic_update_slice(base, merged, (off,)))
            return outs
        bench("E2: inv-perm + row gather + 11 x DUS append", app_dus, new, cols, count)


if __name__ == "__main__":
    main()
