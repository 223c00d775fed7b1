"""Find the axon-server allocation watermark beyond which NEW buffers land in
the slow (relay-bandwidth) region — i.e., whether the 'degraded mode' is
really allocation-pool pressure.

Run on a server that has been idle >= 12 min (healthy baseline), e.g.:
    python tools/alloc_watermark.py --chunk-gb 0.25 --max-gb 4

Prints a big-table canary after each additional held chunk, then after freeing
everything.  Healthy canary ~0.02-0.06 ms; slow-region ~3-8 ms.
"""

import argparse
import gc
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/cofusion_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cofusion_tpu.utils import tpu_health


def canary(tag):
    c = tpu_health.canary_ms()
    print(f"[canary] {tag:36s} {c:8.3f} ms  ({'HEALTHY' if tpu_health.is_healthy(c) else 'SLOW'})",
          flush=True)
    return c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-gb", type=float, default=0.25)
    ap.add_argument("--max-gb", type=float, default=4.0)
    args = ap.parse_args()

    canary("baseline")
    held = []
    total = 0.0
    n = int(args.chunk_gb * 1e9 / 4)
    while total + args.chunk_gb <= args.max_gb + 1e-9:
        buf = jnp.arange(n, dtype=jnp.float32)  # computed, not uploaded
        buf.block_until_ready()
        held.append(buf)
        total += args.chunk_gb
        canary(f"holding {total:.2f} GB")
    held.clear()
    gc.collect()
    time.sleep(2)
    canary("after freeing all")
    time.sleep(30)
    canary("30 s after freeing")


if __name__ == "__main__":
    main()
