"""Verify the 'constant poisoning' hypothesis: executing ONE jit that embeds a
large closed-over device array makes every subsequent program in the process
~100x slower (axon platform).  Run: python tools/micro_poison.py [--poison-first]
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

from cofusion_tpu.models import surfel_model as sm

N = 524288


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{name:52s} {(time.perf_counter()-t0)/reps*1000:9.3f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--poison-first", action="store_true")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    px = jax.random.uniform(key, (N,))
    fields = {f: px + i for i, f in enumerate(sm._FLOAT_FIELDS)}
    store = sm.SurfelStore(valid=jnp.ones((N,), bool), count=jnp.int32(N), **fields)
    keep = jax.random.uniform(jax.random.PRNGKey(9), (N,)) > 0.1
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N)

    big_const = jnp.ones((N,), jnp.float32)
    jax.block_until_ready((store, keep, idx, big_const))

    def suite(tag):
        timeit(f"[{tag}] 1 gather", jax.jit(lambda t, i: jnp.take(t, i)), px, idx)
        timeit(f"[{tag}] compact", jax.jit(sm.compact), store, keep)

    if args.poison_first:
        poison = jax.jit(lambda i: jnp.take(big_const, i))
        timeit("[poison] closure-const gather", poison, idx)

    suite("pre")

    poison = jax.jit(lambda i: jnp.take(big_const, i) + 1.0)
    timeit("[poison] closure-const gather", poison, idx)

    suite("post")

    jax.clear_caches()
    suite("post-clear")


if __name__ == "__main__":
    main()
