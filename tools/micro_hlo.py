"""Dump optimized HLO for the fast standalone gather vs the slow 13-gather
composite to find what the TPU compiler does differently."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np
import time

from cofusion_tpu.models import surfel_model as sm

N = 524288
key = jax.random.PRNGKey(0)
px = jax.random.uniform(key, (N,))
fields = {f: px + i for i, f in enumerate(sm._FLOAT_FIELDS)}
store = sm.SurfelStore(valid=jnp.ones((N,), bool), count=jnp.int32(N), **fields)
idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N)

fast = jax.jit(lambda t, i: jnp.take(t, i))
slow = jax.jit(lambda store, i: tuple(
    jnp.take(getattr(store, f), i) for f in sm._FLOAT_FIELDS))
slow2 = jax.jit(lambda store, i: sum(
    jnp.take(getattr(store, f), i) for f in sm._FLOAT_FIELDS))
slow3 = jax.jit(lambda a, b, i: (jnp.take(a, i), jnp.take(b, i)))

def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{name:40s} {(time.perf_counter()-t0)/reps*1000:9.3f} ms", flush=True)

timeit("1 gather (arg table)", fast, px, idx)
timeit("13 gathers tuple-out (store arg)", slow, store, idx)
timeit("13 gathers summed (store arg)", slow2, store, idx)
timeit("2 gathers tuple-out", slow3, px, px + 1, idx)

with open("/tmp/hlo_fast.txt", "w") as f:
    f.write(fast.lower(px, idx).compile().as_text())
with open("/tmp/hlo_slow.txt", "w") as f:
    f.write(slow.lower(store, idx).compile().as_text())
with open("/tmp/hlo_slow3.txt", "w") as f:
    f.write(slow3.lower(px, px + 1, idx).compile().as_text())
print("wrote /tmp/hlo_fast.txt /tmp/hlo_slow.txt /tmp/hlo_slow3.txt")
