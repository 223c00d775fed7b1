"""FillIn: composite predicted maps with raw-frame data where the prediction has
holes — the reference's FillIn pass (Core/Shaders/FillIn.{h,cpp} + fill_rgb.frag,
fill_vertex.frag, fill_normal.frag; used by CoFusion::predict, CoFusion.cpp:541).

Only the global model fills in (object models track against their raw splat
prediction; Model ctor args CoFusion.cpp:70 vs :108).  `passthrough` reproduces
the lost / frame-to-frame-RGB mode where raw data always wins.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cofusion_tpu.config import CameraConfig
from cofusion_tpu.ops import preprocess as pp
from cofusion_tpu.ops.rasterize import SplatMap


class FilledPrediction(NamedTuple):
    image: jnp.ndarray      # (H, W, 3)
    vert: jnp.ndarray       # (H, W, 3) camera-frame vertices
    normal: jnp.ndarray     # (H, W, 3)
    valid: jnp.ndarray      # (H, W)


def fill_in(
    splat: SplatMap,
    raw_rgb: jnp.ndarray,
    filtered_depth: jnp.ndarray,
    cam: CameraConfig,
    depth_cutoff,
    passthrough_geom=False,
    passthrough_rgb=False,
) -> FilledPrediction:
    """Predicted-over-raw compositing (bools may be traced).

    The reference splits the passthrough switch per channel
    (Model::performFillIn, Model.cpp:901-910): vertex/normal pass through raw
    when `lost`; the image ALSO passes through in frame-to-frame-RGB mode
    (lost || frameToFrameRGB), which is what makes '-ftf' tracking
    frame-to-frame photometrically while staying frame-to-model geometrically."""
    vmap_raw, raw_ok = pp.compute_vmap(filtered_depth, cam, depth_cutoff)
    nmap_raw, n_ok = pp.compute_nmap(vmap_raw, raw_ok)
    raw_ok = raw_ok & n_ok

    use_pred_g = splat.valid & jnp.logical_not(passthrough_geom)
    use_pred_i = splat.valid & jnp.logical_not(passthrough_rgb)
    image = jnp.where(use_pred_i[..., None], splat.image, raw_rgb)
    vert = jnp.where(use_pred_g[..., None], splat.vert_conf[..., :3], vmap_raw)
    normal = jnp.where(use_pred_g[..., None], splat.normal_rad[..., :3], nmap_raw)
    valid = use_pred_g | raw_ok
    return FilledPrediction(image=image, vert=vert, normal=normal, valid=valid)
