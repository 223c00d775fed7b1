"""Axon-TPU dispatch-health canary (round-3 discovery, refined in round 4).

The axon TPU server has a degraded mode in which gathers/scatters whose TABLE
operand exceeds ~VMEM run at ~0.6 GB/s (~100-1000x off the healthy memory-
bandwidth path) while TINY gathers stay fast — so a small-probe canary reads
"healthy" on a server where every surfel-scale op crawls (that blindness is
exactly how BENCH_r03 recorded 0.294 FPS with a passing canary).  The state
persists across client processes and heals after ~10-15 min without big
buffers/dispatches (consistent with lazy server-side reclamation).

The canary therefore measures the MARGINAL per-dispatch latency of a gather
whose table is deliberately beyond VMEM (512k floats = 2 MB): two batch sizes,
slope taken, which cancels the ~25 ms fixed device->host sync of the tunnel.
Healthy: ~0.02-0.06 ms.  Degraded: ~3-8 ms.  Threshold: 1.0 ms.

Every benchmark must (a) verify health BEFORE its timed window, (b) re-verify
AFTER it (the workload itself may degrade the server), and (c) record both
readings next to the result so the artifact is self-certifying.
"""

from __future__ import annotations

import time

import numpy as np

_HEALTHY_MS = 1.0  # healthy marginal big-gather ~0.02-0.06 ms; degraded ~3-8 ms
_N = 512 * 1024    # table size: 2 MB, beyond VMEM -> exercises the failing path


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


def is_healthy(ms: float, threshold_ms: float = _HEALTHY_MS) -> bool:
    return ms < threshold_ms


def wait_healthy(
    budget_s: float = 1500.0,
    poll_s: float = 90.0,
    threshold_ms: float = _HEALTHY_MS,
    log=None,
) -> tuple[float, float, bool]:
    """Poll the canary until the server reads healthy or the budget runs out.

    Degradation reclaims only while the TPU is left alone, so between polls the
    process sleeps without dispatching anything.  Returns (last_canary_ms,
    seconds_waited, healthy)."""
    t0 = time.perf_counter()
    while True:
        c = canary_ms()
        waited = time.perf_counter() - t0
        if is_healthy(c, threshold_ms):
            return c, waited, True
        if log:
            log(f"[tpu_health] canary {c:.2f} ms >= {threshold_ms} ms "
                f"(degraded); idling {poll_s:.0f}s ({waited:.0f}s/{budget_s:.0f}s)")
        if waited + poll_s > budget_s:
            return c, waited, False
        time.sleep(poll_s)
