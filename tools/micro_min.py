"""Minimal fresh-process canary with honest np.asarray drains: establishes
whether the slow mode persists across processes (axon server state) or is
created inside a process.  Takes ~5 s."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

N = 524288
t = jax.random.uniform(jax.random.PRNGKey(0), (N,))
i = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N)
fn = jax.jit(lambda t, i: jnp.take(t, i))
np.asarray(t[:1])

for k in range(3):
    out = fn(t, i)
    np.asarray(out[:1])
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(t, i)
    np.asarray(out[:1])
    print(f"canary round {k}: {(time.perf_counter()-t0)/10*1000:9.3f} ms", flush=True)

# also time a pure readback RTT
x = jnp.zeros((8,))
np.asarray(x)
t0 = time.perf_counter()
for _ in range(20):
    np.asarray(x)
print(f"readback RTT (8 floats): {(time.perf_counter()-t0)/20*1000:9.3f} ms", flush=True)
