"""Bisect which property of compact's 13-gather composite triggers the slow
gather: aliased inputs, closure arrays, or index content (sorted inverse
permutation from a scatter)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

from cofusion_tpu.models import surfel_model as sm

N = 524288
key = jax.random.PRNGKey(0)
px = jax.random.uniform(key, (N,))
distinct = {f: px + i for i, f in enumerate(sm._FLOAT_FIELDS)}
store_distinct = sm.SurfelStore(valid=jnp.ones((N,), bool), count=jnp.int32(N), **distinct)
py = px + 1
pz = px + 2
radius = jnp.full((N,), 0.01)
init_time = jnp.zeros((N,))
store_aliased = sm.SurfelStore(
    px=px, py=py, pz=pz, nx=px, ny=py, nz=pz, cr=px, cg=py, cb=pz,
    radius=radius, conf=px, init_time=init_time, last_time=init_time,
    valid=jnp.ones((N,), bool), count=jnp.int32(N))

idx_rand = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N)
keep = jax.random.uniform(jax.random.PRNGKey(9), (N,)) > 0.1

def make_src(keep):
    dest = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, dest, N)
    iota = jnp.arange(N, dtype=jnp.int32)
    return jnp.full((N,), jnp.int32(0)).at[dest].set(iota, mode="drop")
src_sorted = jax.jit(make_src)(keep)
src_sorted.block_until_ready()

valid = jnp.ones((N,), bool)

def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    print(f"{name:52s} {(time.perf_counter()-t0)/reps*1000:9.3f} ms", flush=True)

g13 = lambda store, i: tuple(jnp.take(getattr(store, f), i) for f in sm._FLOAT_FIELDS)
j13 = jax.jit(g13)

timeit("13g distinct + rand idx", j13, store_distinct, idx_rand)
timeit("13g distinct + SORTED-src idx", j13, store_distinct, src_sorted)
timeit("13g aliased + rand idx", j13, store_aliased, idx_rand)
timeit("13g aliased + sorted-src idx", j13, store_aliased, src_sorted)

g13v = jax.jit(lambda store, i: sm.SurfelStore(
    count=jnp.int32(0), valid=valid,
    **{f: jnp.take(getattr(store, f), i) for f in sm._FLOAT_FIELDS}))
timeit("13g + closure-valid + rand", g13v, store_distinct, idx_rand)
timeit("13g + closure-valid + sorted-src", g13v, store_distinct, src_sorted)

# single gather content test
g1 = jax.jit(lambda t, i: jnp.take(t, i))
timeit("1g rand idx", g1, px, idx_rand)
timeit("1g sorted-src idx", g1, px, src_sorted)
timeit("1g iota idx", g1, px, jnp.arange(N, dtype=jnp.int32))
rev = jnp.arange(N - 1, -1, -1, dtype=jnp.int32)
timeit("1g reversed-iota idx", g1, px, rev)
z32 = jnp.zeros((N,), jnp.int32)
timeit("1g all-zero idx", g1, px, z32)
