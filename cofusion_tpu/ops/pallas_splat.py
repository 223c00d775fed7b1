"""Pallas TPU kernel for the window phase of the splat prediction
(rasterize.splat_from_imap phase 1: the (2r+1)^2 ray-disk intersection sweep
over the point render — combo_splat.frag:37-65 rebuilt as a VMEM-tiled
stencil).

Why a kernel: the XLA form materializes one shifted copy of the packed
(B, H, W, 8) geometry image per tap — 49 pad+slice relayouts of ~39 MB at the
measured ~75 GB/s effective shift bandwidth is most of the measured 26 ms
window cost (r5 profile, 4 models).  This kernel DMAs each halo'd row block
into VMEM ONCE and evaluates every tap as a static VMEM slice, so HBM traffic
is read-once/write-once and the tap loop runs at VPU speed.

Numerics match the XLA loop in rasterize.splat_from_imap to float32 rounding:
same candidate mask, same guard, same quantized-z winner compare, same
first-tap-wins tie rule (tests/test_pallas_splat.py runs this kernel in
interpret mode against the XLA form).

Only used on the TPU backend; other backends (CPU tests) use the XLA form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PADR = 8  # row halo; >= splat radius and 8-sublane aligned for the DMA slice


def _window_kernel(geo_hbm, z_ref, tap_ref, scratch, sem, *, bh, W, r,
                   fx, fy, cx, cy):
    """One (batch, row-block) step: DMA rows [i*bh, i*bh + bh + 2*PADR) of the
    padded 8-channel geometry image into VMEM, sweep all (2r+1)^2 taps.

    Channels: 0-2 camera-frame candidate position, 3-5 normal,
    6 pos.normal (precomputed), 7 radius^2 (-/0 for invalid; the |ln| guard
    rejects the zero-padded halo)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        geo_hbm.at[b, :, pl.ds(i * bh, bh + 2 * _PADR), :], scratch, sem
    )
    dma.start()
    dma.wait()

    # Mosaic only supports integer iota — build float pixel coords by cast
    u = jax.lax.broadcasted_iota(jnp.int32, (bh, W), 1).astype(jnp.float32)
    v = (
        jax.lax.broadcasted_iota(jnp.int32, (bh, W), 0) + i * bh
    ).astype(jnp.float32)
    lxr = (u - cx) / fx
    lyr = (v - cy) / fy
    # same op sequence as the XLA path (sqrt + divide) for bit parity
    lnorm = jnp.sqrt(lxr * lxr + lyr * lyr + 1.0)
    l0 = lxr / lnorm
    l1 = lyr / lnorm
    l2 = 1.0 / lnorm

    best_zq = jnp.full((bh, W), jnp.inf, jnp.float32)
    best_z = jnp.full((bh, W), jnp.inf, jnp.float32)
    best_tap = jnp.full((bh, W), -1, jnp.int32)
    k = 0
    for dy in range(-r, r + 1):
        ro = _PADR + dy
        for dx in range(-r, r + 1):
            co = r + dx
            px = scratch[0, ro:ro + bh, co:co + W]
            py = scratch[1, ro:ro + bh, co:co + W]
            pz = scratch[2, ro:ro + bh, co:co + W]
            nx = scratch[3, ro:ro + bh, co:co + W]
            ny = scratch[4, ro:ro + bh, co:co + W]
            nz = scratch[5, ro:ro + bh, co:co + W]
            pdn = scratch[6, ro:ro + bh, co:co + W]
            rad2 = scratch[7, ro:ro + bh, co:co + W]

            ln = l0 * nx + l1 * ny + l2 * nz
            t = pdn / jnp.where(jnp.abs(ln) < 1e-12, 1.0, ln)
            hx = t * l0 - px
            hy = t * l1 - py
            hz = t * l2 - pz
            d2 = hx * hx + hy * hy + hz * hz
            zhit = t * l2
            zq = jnp.floor(zhit * 4096.0)
            good = (
                (jnp.abs(ln) >= 1e-12)
                & (d2 <= rad2)
                & (zhit > 0)
                & (zq < best_zq)
            )
            best_zq = jnp.where(good, zq, best_zq)
            best_z = jnp.where(good, zhit, best_z)
            best_tap = jnp.where(good, k, best_tap)
            k += 1

    z_ref[:] = best_z[None]
    tap_ref[:] = best_tap[None]


@functools.partial(jax.jit, static_argnames=("r", "bh", "cam_tup"))
def _window_pallas(geo: jnp.ndarray, r: int, bh: int, cam_tup) -> tuple:
    """geo: (B, 8, H, W) packed candidate channels (see kernel docstring).
    Returns (best_z (B, H, W), best_tap (B, H, W) int32)."""
    B, C, H, W = geo.shape
    fx, fy, cx, cy = cam_tup
    grid_h = -(-H // bh)
    Hp = grid_h * bh + 2 * _PADR
    Wp = -(-(W + 2 * r) // 128) * 128
    padded = jnp.zeros((B, C, Hp, Wp), jnp.float32)
    padded = jax.lax.dynamic_update_slice(
        padded, geo.astype(jnp.float32), (0, 0, _PADR, r)
    )

    z, tap = pl.pallas_call(
        functools.partial(
            _window_kernel, bh=bh, W=W, r=r, fx=fx, fy=fy, cx=cx, cy=cy
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, grid_h * bh, W), jnp.float32),
            jax.ShapeDtypeStruct((B, grid_h * bh, W), jnp.int32),
        ),
        grid=(B, grid_h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((1, bh, W), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, W), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((C, bh + 2 * _PADR, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        # 49 unaligned tap slices over 8 channels materialize (bh, W) temps;
        # give Mosaic headroom beyond the 16M default scoped-vmem budget
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(padded)
    return z[:, :H], tap[:, :H]


def splat_window_pallas_available(H: int, r: int) -> bool:
    """Row blocks must be 8-aligned for the halo DMA and the halo must cover
    the splat radius."""
    return H % 8 == 0 and r <= _PADR


def splat_window_pallas(
    cand_pos: jnp.ndarray,    # (B, H, W, 3) camera-frame candidate positions
    cand_norm: jnp.ndarray,   # (B, H, W, 3)
    cand_rad: jnp.ndarray,    # (B, H, W)
    cand_valid: jnp.ndarray,  # (B, H, W) bool
    r: int,
    cam_tup: tuple,
) -> tuple:
    """Window sweep (phase 1 of splat_from_imap) as a Pallas kernel.
    Returns (best_z, best_tap) with best_tap == -1 where no disk was hit."""
    pdn = (
        cand_pos[..., 0] * cand_norm[..., 0]
        + cand_pos[..., 1] * cand_norm[..., 1]
        + cand_pos[..., 2] * cand_norm[..., 2]
    )
    rad2 = jnp.where(cand_valid, cand_rad * cand_rad, -1.0)
    geo = jnp.stack(
        [
            cand_pos[..., 0], cand_pos[..., 1], cand_pos[..., 2],
            cand_norm[..., 0], cand_norm[..., 1], cand_norm[..., 2],
            pdn, rad2,
        ],
        axis=1,
    )  # (B, 8, H, W)
    H = geo.shape[2]
    bh = 32 if H % 32 == 0 else (16 if H % 16 == 0 else 8)
    return _window_pallas(geo, r, bh, cam_tup)
