"""Axon-TPU dispatch-health canary (round-3 discovery, CLAUDE.md).

The axon TPU server has a degraded mode: once triggered (e.g. by executing a
jitted program with a large embedded array constant), EVERY XLA op in EVERY
client process dispatches at ~7-12 ms instead of ~0.04-0.3 ms — a server-side
state that persists across processes and heals only after ~15+ min of TPU
idle time.  Any timing measured on a poisoned server is meaningless, so every
benchmark must (a) verify health BEFORE its timed window, (b) re-verify AFTER
it (the measured workload itself may have degraded the server), and (c) record
both readings next to the result so the artifact is self-certifying.

The canary measures the MARGINAL per-dispatch latency of a tiny jitted gather
by timing two different batch sizes and taking the slope — this cancels the
~25 ms fixed device->host sync round-trip of the tunnel, which is a transport
cost, not a dispatch-health signal.
"""

from __future__ import annotations

import time

import numpy as np

_HEALTHY_MS = 1.5  # healthy marginal dispatch ~0.04-0.35 ms; poisoned ~7-12 ms


def canary_ms(reps: int = 120) -> float:
    """Marginal per-dispatch latency (ms) of a tiny jitted gather."""
    import jax
    import jax.numpy as jnp

    src = jnp.ones((4096,), jnp.float32)
    idx = jnp.arange(1024, dtype=jnp.int32) % 4096

    @jax.jit
    def f(s, i):
        return jnp.take(s, i)

    out = f(src, idx)
    np.asarray(out[:1])  # compile + drain

    def run(n: int) -> float:
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            o = f(src, idx)
        np.asarray(o[:1])  # real readback: block_until_ready can return early
        return time.perf_counter() - t0

    run(10)  # settle
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

    Poisoning heals only with TPU *idle* time, so between polls the process
    sleeps without dispatching anything.  Returns (last_canary_ms,
    seconds_waited, healthy)."""
    t0 = time.perf_counter()
    while True:
        c = canary_ms()
        waited = time.perf_counter() - t0
        if is_healthy(c, threshold_ms):
            return c, waited, True
        if log:
            log(f"[tpu_health] canary {c:.2f} ms >= {threshold_ms} ms "
                f"(poisoned); idling {poll_s:.0f}s ({waited:.0f}s/{budget_s:.0f}s)")
        if waited + poll_s > budget_s:
            return c, waited, False
        time.sleep(poll_s)
