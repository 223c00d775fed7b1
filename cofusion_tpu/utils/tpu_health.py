"""Axon-TPU dispatch-health canary (round-3 discovery, recalibrated round 5).

The axon TPU server has a degraded ("poisoned") mode in which gathers/scatters
whose TABLE operand exceeds ~VMEM run at ~0.6 GB/s (~100-1000x off the healthy
memory-bandwidth path) while TINY gathers stay fast — so a small-probe canary
reads "healthy" on a server where every surfel-scale op crawls (that blindness
is exactly how BENCH_r03 recorded 0.294 FPS with a passing canary).  The state
persists across client processes and heals after ~10-15 min without big
buffers/dispatches (consistent with lazy server-side reclamation).

The canary measures the MARGINAL per-dispatch latency of a gather whose table
is deliberately beyond VMEM (512k floats = 2 MB): two batch sizes, slope
taken, which cancels the ~25 ms fixed device->host sync of the tunnel.

Calibration (round-5 reconciliation of the r4 contradiction): the observed
regimes are ~0.02-0.06 ms (idle-warm best case), ~3-8 ms (this server's COMMON
steady state — BENCH_r04 logged a rock-steady 3.7-3.8 ms through 24 min of
idle, i.e. it does NOT heal toward the best case), and >>10 ms (the r3
poisoning mode, which DOES heal with idle).  Round 4 gated on < 1.0 ms and
starved to death waiting for a floor this server never reaches.  The gate now
only guards against true poisoning: POISONED = slope >= 10 ms.  The raw slope
is always recorded next to any benchmark number so the artifact remains
self-certifying about which regime it ran in.
"""

from __future__ import annotations

import time

import numpy as np

_POISONED_MS = 10.0  # r3 poisoning: every big-table dispatch ~7-12+ ms AND heals with idle
_N = 512 * 1024      # table size: 2 MB, beyond VMEM -> exercises the failing path


def canary_ms(reps: int = 40) -> float:
    """Marginal per-dispatch latency (ms) of a beyond-VMEM-table gather."""
    import jax
    import jax.numpy as jnp

    src = jnp.ones((_N,), jnp.float32)
    idx = (jnp.arange(_N, dtype=jnp.int32) * 7) % _N

    @jax.jit
    def f(s, i):
        return jnp.take(s, i) + 1.0

    out = f(src, idx)
    np.asarray(out[:1])  # compile + drain

    def run(n: int) -> float:
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            o = f(src, idx)
        np.asarray(o[:1])  # real readback: block_until_ready can return early
        return time.perf_counter() - t0

    run(5)  # settle
    t_small = run(reps)
    t_big = run(reps * 3)
    return max((t_big - t_small) / (reps * 2) * 1000.0, 0.0)


def is_poisoned(ms: float, threshold_ms: float = _POISONED_MS) -> bool:
    return ms >= threshold_ms


def is_healthy(ms: float, threshold_ms: float = _POISONED_MS) -> bool:
    """Not in the poisoning regime.  (The 3-8 ms steady state counts as
    healthy: it is this server's normal operating point, see module doc.)"""
    return ms < threshold_ms


def wait_healthy(
    budget_s: float = 240.0,
    poll_s: float = 60.0,
    threshold_ms: float = _POISONED_MS,
    log=None,
) -> tuple[float, float, bool]:
    """If the server is POISONED, idle (poisoning reclaims only while the TPU
    is left alone) and re-probe, within a HARD bounded budget.  Never waits at
    all when the first probe is below the poison threshold.  Returns
    (last_canary_ms, seconds_waited, healthy)."""
    t0 = time.perf_counter()
    while True:
        c = canary_ms()
        waited = time.perf_counter() - t0
        if not is_poisoned(c, threshold_ms):
            return c, waited, True
        if waited + poll_s > budget_s:
            return c, waited, False
        if log:
            log(f"[tpu_health] canary {c:.2f} ms >= {threshold_ms} ms "
                f"(poisoned); idling {poll_s:.0f}s ({waited:.0f}s/{budget_s:.0f}s)")
        time.sleep(poll_s)
