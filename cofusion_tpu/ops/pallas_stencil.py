"""Pallas TPU stencil kernel for the 13x13 metric bilateral depth filter.

The kernel tiles the image over row blocks, DMAs each halo'd block into VMEM
once, and evaluates every tap as a static VMEM slice, so HBM traffic is
exactly read-once/write-once.  Measured (v5e, 640x480, 20-call jit chain with
a real readback): pallas 2.73 ms/call vs the XLA shift-and-accumulate form's
2.56 ms/call — XLA already keeps the 169-tap chain fused and HBM-resident at
this size, and both forms are bound by the per-tap exp + realignment work,
not HBM.  Kept as the integration point for stencil kernels (and it wins on
row-blocked shapes too tall for XLA to fuse), but ops/preprocess.py's
bilateral_filter only dispatches here on the TPU backend where the two are at
parity; numerics match the XLA form bit-exactly.

Only used on the TPU backend; other backends (CPU tests) use the XLA form in
ops/preprocess.py (tests/test_pallas_stencil.py covers this kernel in pallas
interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 6  # bilateral radius (13x13 window, depth_bilateral_metric.frag:30-76)
_PADR = 8  # row halo; >= _R and a multiple of Mosaic's 8-row sublane tiling,
#           so every DMA slice height (bh + 2*_PADR) stays 8-aligned
_SIGMA_SPACE2_INV_HALF = 0.024691358
_SIGMA_COLOR2_INV_HALF = 555.556


def _bilateral_kernel(d_hbm, out_ref, scratch, sem, *, bh, w):
    """One row-block: DMA rows [i*bh, i*bh + bh + 2*PADR) of the padded input
    into VMEM, evaluate all 169 taps as static VMEM slices."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        d_hbm.at[pl.ds(i * bh, bh + 2 * _PADR), :], scratch, sem
    )
    dma.start()
    dma.wait()

    center = scratch[_PADR:_PADR + bh, _R:_R + w]
    num = jnp.zeros((bh, w), jnp.float32)
    den = jnp.zeros((bh, w), jnp.float32)
    for dy in range(2 * _R + 1):
        for dx in range(2 * _R + 1):
            nbr = scratch[_PADR - _R + dy:_PADR - _R + dy + bh, dx:dx + w]
            inb = nbr < jnp.inf
            nbrv = jnp.where(inb, nbr, 0.0)
            space2 = float((dy - _R) ** 2 + (dx - _R) ** 2)
            color2 = (center - nbrv) ** 2
            wgt = jnp.exp(
                -(space2 * _SIGMA_SPACE2_INV_HALF + color2 * _SIGMA_COLOR2_INV_HALF)
            )
            wgt = jnp.where(inb, wgt, 0.0)
            num = num + nbrv * wgt
            den = den + wgt
    out_ref[:] = num / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=("bh",))
def _bilateral_pallas(depth: jnp.ndarray, max_depth, bh: int) -> jnp.ndarray:
    H, W = depth.shape
    grid_h = -(-H // bh)
    Hp = grid_h * bh
    # width padded to a multiple of the 128-lane tiling (Mosaic requires DMA
    # slice shapes aligned to (8, 128)); extra lanes hold inf = invalid
    Wp = -(-(W + 2 * _R) // 128) * 128
    padded = jnp.full((Hp + 2 * _PADR, Wp), jnp.inf, jnp.float32)
    padded = jax.lax.dynamic_update_slice(padded, depth.astype(jnp.float32), (_PADR, _R))

    out = pl.pallas_call(
        functools.partial(_bilateral_kernel, bh=bh, w=W),
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        grid=(grid_h,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((bh, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bh + 2 * _PADR, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        # each unaligned tap slice materializes a (bh, W) stack temp; 169 taps
        # need headroom beyond the 16M default scoped-vmem budget
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(padded)
    out = out[:H]
    center_ok = (depth >= 0.3) & (depth <= max_depth)
    return jnp.where(center_ok, out, 0.0)


def bilateral_pallas_available(H: int) -> bool:
    """Row blocks must be 8-aligned for the halo DMA; odd heights fall back to
    the XLA shift-and-accumulate form."""
    return H % 8 == 0


def bilateral_filter_pallas(depth: jnp.ndarray, max_depth) -> jnp.ndarray:
    """13x13 metric bilateral depth filter, VMEM-tiled (see module docstring).
    Numerics match ops/preprocess.bilateral_filter to float32 rounding."""
    H = depth.shape[0]
    bh = 16 if H % 16 == 0 else 8
    return _bilateral_pallas(depth, max_depth, bh)
