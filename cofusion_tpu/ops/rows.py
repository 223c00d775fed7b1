"""Row-packed gather helpers — the round-4 performance model.

Measured on the axon TPU v5e (tools/trigger_hunt.py lineage, REAL readbacks —
`block_until_ready` returns early on this platform and silently lied to every
earlier micro-benchmark):

  * gather/scatter cost is PER ROW (~4-7 ns/index), nearly independent of row
    width up to ~16 float32 channels: take((512k,13), idx[512k]) = 2.4 ms while
    13 separate 1D takes = 89 ms (38x);
  * elementwise/relayout traffic runs at full HBM bandwidth (~1 TB/s) and
    matmuls at full MXU speed — so PACKING channels into (N, C) row tables
    before a gather is ~free, and the old "planar scalar gathers only" rule
    (based on the lying measurements) is exactly backwards;
  * wide scatter rows are NOT cheap (scatter-set (K,8): 45 ms vs 1D 2.4 ms):
    scatters stay 1D — shrink them by compacting their operands first, or
    convert to contiguous dynamic_update_slice writes.

Every hot pass should therefore do: pack channels (elementwise, cheap) ->
ONE row gather per distinct index set -> unpack (elementwise slices, cheap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# beyond ~16 f32 channels the per-row cost starts climbing (C=32 measured 2x
# the C<=16 cost per row) — split wider packs into <=14-channel gathers
_MAX_C = 14


def pack_rows(cols) -> jnp.ndarray:
    """Stack same-shape channel arrays into one (..., C) row table (HBM-speed
    relayout)."""
    return jnp.stack([c.astype(jnp.float32) for c in cols], axis=-1)


def take_rows(cols, idx: jnp.ndarray, *, table_size: int | None = None):
    """Gather many channels at the same indices with ceil(C/14) row gathers.

    `cols`: sequence of flat (N,) channel arrays (or arrays reshapeable to
    (N,)); `idx`: (K,) int32 row indices (caller clips).  Returns a list of
    (K,) float32 arrays in input order.
    """
    cols = list(cols)
    flat = [c.reshape(-1) for c in cols]
    out: list[jnp.ndarray] = []
    for s in range(0, len(flat), _MAX_C):
        chunk = flat[s : s + _MAX_C]
        if len(chunk) == 1:
            out.append(jnp.take(chunk[0], idx))
            continue
        table = pack_rows(chunk)  # (N, c)
        rows = jnp.take(table, idx, axis=0)  # ONE row gather
        out.extend(rows[..., j] for j in range(len(chunk)))
    return out
