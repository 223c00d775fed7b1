"""Static configuration for the cofusion_tpu engine.

Frozen dataclasses: hashable, so they can be closed over / passed as static args to
``jax.jit``.  Every field that changes array shapes or compiled control flow lives here;
runtime-tunable scalars (thresholds, weights) live in :class:`RuntimeParams`, a pytree
that can change per frame without recompilation.

Reference parity (flag defaults from /root/reference):
  * camera defaults 640x480 @ (fx,fy,cx,cy)=(528,528,320,240) — GUI/MainController.cpp:108-110
  * tracking schedule {10,5,4} iters fine->coarse, SO3 pre-align <=10 @ level 2 —
    Core/Utils/RGBDOdometry.cpp:257,312-314
  * ICP gates dist<=0.10 m / sin(20 deg), icp:rgb weight 10 — Core/Utils/RGBDOdometry.h:35-36,
    Core/CoFusion.h:48
  * surfel capacity (reference: 3072^2 per model) — Core/Model/Model.cpp:92-98
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass


@dataclass(frozen=True)
class CameraConfig:
    """Image resolution + pinhole intrinsics (the reference's Resolution/Intrinsics
    singletons, Core/Utils/Resolution.h:24-71 / Intrinsics.h)."""

    width: int = 640
    height: int = 480
    fx: float = 528.0
    fy: float = 528.0
    cx: float = 320.0
    cy: float = 240.0

    def at_level(self, level: int) -> "CameraConfig":
        """Intrinsics of pyramid level ``level`` (level 0 = full resolution).

        Matches the CUDA CameraModel `operator()(level)` scaling: each level halves
        the resolution and scales (fx, fy, cx, cy) by 2^-level.
        """
        s = 1.0 / (1 << level)
        return CameraConfig(
            width=self.width >> level,
            height=self.height >> level,
            fx=self.fx * s,
            fy=self.fy * s,
            cx=self.cx * s,
            cy=self.cy * s,
        )

    @property
    def shape(self) -> tuple[int, int]:
        return (self.height, self.width)

    @property
    def mean_focal(self) -> float:
        return 0.5 * (self.fx + self.fy)


@dataclass(frozen=True)
class CoFusionConfig:
    """Static engine configuration (shape- and control-flow-determining)."""

    camera: CameraConfig = CameraConfig()

    # --- capacity (shapes) -------------------------------------------------
    # Max simultaneously-allocated models (reference: up to 256 sequential ids,
    # Core/CoFusion.cpp:628-644, but only a handful alive at once).
    max_models: int = 4
    # Surfel capacity per model. The reference allocates 3072^2 ≈ 9.4M surfels per
    # model (Core/Model/Model.cpp:92-98); scenes in the published datasets use far
    # fewer.  2^20 (~1M) is the default here; raise for large scenes.
    max_surfels: int = 1 << 20
    # ACTIVE-tier capacity (two-tier store): every per-frame pass (render, fuse,
    # clean, compact) touches only surfels inside the reference's own
    # time-window concept (time - lastUpdate <= timeDelta — the gate every
    # reference shader applies, index_map.vert:48 / copy_unstable.vert:136).
    # Surfels aging out of the window migrate to an append-only STABLE tier of
    # `max_surfels` capacity that per-frame passes never touch.  Keeping the
    # active tier <= ~1M keeps every randomly-gathered/scattered operand inside
    # VMEM (~16 MB/core), where XLA's TPU gather/scatter fast path lives —
    # measured: the same ops fall off a >50x cliff once operands spill to HBM.
    # Per-surfel pass costs scale linearly with this capacity (not with the
    # live count), so keep it as tight as the time-window population allows.
    # None -> min(2^19, max_surfels).
    active_surfels: int | None = None
    # OBJECT-slot active-tier capacity (slots m > 0).  Per-frame per-surfel
    # pass cost is per-ROW over the STATIC capacity (live or dead rows alike),
    # and an object's surface is a small fraction of the background's, so
    # object slots run their fuse/clean pipeline on a
    # [:object_active_capacity] slice of the stacked store
    # (engine._fuse_clean_all).  None -> min(2^17, active_capacity).
    object_active_surfels: int | None = None
    # Surfels migrated active->stable per frame (static expel-block size); the
    # overflow stays active one more frame and re-queues.
    expel_block_log2: int = 16
    # Max surfels appended per frame (bounded by decimated pixel count).
    max_new_surfels_log2: int = 15  # 32768 >= 640*480/16

    # --- tracking schedule (compiled control flow) -------------------------
    pyramid_levels: int = 3
    so3_iters: int = 10
    gn_iters: tuple[int, int, int] = (10, 5, 4)  # level 0, 1, 2
    fast_odom: bool = False
    use_so3: bool = True
    use_pyramid: bool = True
    # Correspondence decimation at pyramid level 0 (TPU-first divergence
    # from the reference, which reduces every pixel): a 2x2-strided subset
    # still gives ~77k correspondences for a 6-DoF solve at 640x480, and
    # per-GN-iter cost scales with the subset size (gather rows at ~4-7
    # ns/row dominate, CLAUDE.md perf model).  Level 1 defaults to UNSTRIDED:
    # it already has 4x fewer pixels, and striding it to HW/16 starves SMALL
    # OBJECT models of correspondences (measured: the 8-frame moving-box
    # multimodel test's object-translation error doubles, 0.07 -> 0.15 m,
    # with gn_stride_l1=2).  Level 2 and the coarse fern/reloc tracker are
    # never strided (their counts feed absolute inlier gates).
    gn_stride_l0: int = 2
    gn_stride_l1: int = 1

    # --- rasterizer --------------------------------------------------------
    # Gather window half-size for splat prediction (pixels); bounds the splat
    # radius that can be rendered (reference splats arbitrary point sizes).
    splat_radius: int = 3
    # Data-association search window half-size (reference: +/-2 px, data.vert:138).
    assoc_radius: int = 2

    # --- segmentation ------------------------------------------------------
    superpixel_size: int = 16          # Core/Segmentation/Segmentation.cpp:55
    crf_iterations: int = 10
    slic_iterations: int = 5           # Core/Segmentation/Slic.cpp:38

    # --- loop closure --------------------------------------------------------
    # deformation-graph node capacity (reference samples <=1024 nodes,
    # DeformationGraph.cpp:425; dense normal equations are (12G)^2)
    deform_nodes: int = 256
    # local-loop constraint sampling stride in pixels (consSample=20,
    # Core/CoFusion.cpp:39-44)
    cons_sample: int = 20

    # --- misc --------------------------------------------------------------
    time_delta: int = 200              # active/inactive surfel window, ModelProjection.h:41
    dtype: str = "float32"
    # on-device pose-history capacity (frames); wraps around beyond this
    max_log_frames: int = 8192
    # on-device segmentation-mask ring (frames): '-es'/'-el' exports drain it
    # in BULK every ~ring capacity instead of one blocking device->host mask
    # read per frame (a 34 ms tunnel round-trip on this platform that alone
    # caps exports at ~30 FPS)
    mask_ring_frames: int = 64

    @property
    def max_new_surfels(self) -> int:
        return 1 << self.max_new_surfels_log2

    @property
    def active_capacity(self) -> int:
        """Active-tier surfel capacity (see `active_surfels`)."""
        if self.active_surfels is not None:
            return min(self.active_surfels, self.max_surfels)
        return min(1 << 19, self.max_surfels)

    @property
    def object_active_capacity(self) -> int:
        """Active-tier capacity for OBJECT slots (m > 0); never below
        `expel_block` so expel_split stays well-formed on the slice."""
        cap = (
            self.object_active_surfels
            if self.object_active_surfels is not None
            else 1 << 17
        )
        return max(min(cap, self.active_capacity), self.expel_block)

    @property
    def expel_block(self) -> int:
        return min(1 << self.expel_block_log2, self.max_surfels, self.active_capacity)

    def replace(self, **kw) -> "CoFusionConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrackingParams:
    """Runtime-tunable tracking scalars (no recompilation on change — they are traced).

    Defaults follow the reference (RGBDOdometry.h:35-36, RGBDOdometry.cpp:31-34,
    102-105, CoFusion.h:48)."""

    icp_weight: float = 10.0
    dist_thresh: float = 0.10
    angle_thresh_sin: float = math.sin(20.0 * math.pi / 180.0)
    max_depth_delta_rgb: float = 0.07
    max_depth_rgb: float = 6.0
    sobel_scale: float = 1.0 / 8.0
    # per-level minimum gradient magnitudes (level 0, 1, 2)
    min_grad_mags: tuple[float, float, float] = (5.0, 3.0, 1.0)
    rgb_only: bool = False
    # reset translation if the update jumps more than this (RGBDOdometry.cpp:464-467)
    max_translation_jump: float = 0.3
    # Stability gates absent from the reference (which explodes on tiny masked
    # objects — e.g. a sphere seen by ~12 pixels at pyramid level 2 makes the
    # 6x6 system singular, the pose jumps past the 0.3 m guard, and tracking
    # resets every frame): skip a GN update when fewer than this many
    # correspondences exist, or when the per-iteration translation step exceeds
    # the jump threshold.
    min_correspondences: float = 20.0
    # Gauss-Newton convergence epsilon: a GN iteration whose update norm
    # |xi| (meters + radians, combined) falls below this freezes the model's
    # solve, and the level loop exits early once EVERY model is frozen
    # (lax.while_loop).  1e-5 (10 um / ~2 arcsec) is far below sensor noise;
    # the reference runs its fixed {10,5,4} schedule to completion
    # (RGBDOdometry.cpp:312-346) — on converged frames most of those
    # iterations recompute an unchanged pose, and each costs ~0.6M gather
    # rows on this platform.  Set to 0.0 to reproduce the fixed schedule.
    gn_converge_eps: float = 1e-5
    # The reference combines A = A_rgbd + w^2 A_icp but b = b_rgbd + w b_icp
    # (RGBDOdometry.cpp:431-446).  When the photometric term is small this scales
    # every Gauss-Newton step by 1/w — geometric under-relaxation that leaves
    # ~(1-1/w)^iters of the motion unrecovered (measured: 4.5 mm residual on a
    # 36 mm motion vs 0.07 mm for pure ICP).  True (default) uses w^2 in both,
    # i.e. a genuinely weighted least-squares stack; False reproduces the
    # reference arithmetic exactly.
    consistent_icp_weighting: bool = True


@dataclass(frozen=True)
class SegmentationParams:
    """CRF motion-segmentation parameters.

    Defaults are the reference's LIVE values — the Pangolin GUI overwrites the
    C++ code defaults every frame (GUI/Tools/GUI.h:210-227 pushed via
    MainController.cpp:448-473), so the GUI numbers are what the published
    system actually runs with.  Notably unary_k_error=0.0375 > the background's
    hardcoded 0.01 floor (Segmentation.cpp:241): low-confidence ties must break
    toward background or unobserved object models flood the image."""

    crf_iterations: int = 10
    scale_rgb: float = 1.0 / 10.0     # GUI pairwiseRGBSTD
    scale_depth: float = 1.0 / 0.9    # GUI pairwiseDepthSTD
    scale_pos: float = 1.0 / 1.8      # GUI pairwisePosSTD (superpixel units)
    weight_appearance: float = 7.0    # GUI (code default 40 is never used live)
    weight_smoothness: float = 2.0    # GUI (code default 40 is never used live)
    unary_threshold_new: float = 5.5
    unary_k_error: float = 0.0375
    unary_weight_error: float = 75.0
    min_rel_size_new: float = 0.015
    max_rel_size_new: float = 0.4


@dataclass(frozen=True)
class FusionParams:
    """Runtime-tunable fusion scalars. Defaults from the reference GUI/engine
    (GUI/Tools/GUI.h:184-244, Core/CoFusion.h, Core/Shaders/*.vert)."""

    depth_cutoff: float = 3.0           # '-d' flag default, MainController
    confidence_global: float = 10.0     # '-cg' global model confidence threshold
    confidence_object: float = 9.0      # '-co' object model confidence threshold
    # free-space violation decay 1/(1+coeff*avgViolation[m]) + mask-mismatch
    # penalty 0.5+0.5*(1-coeff/10) — the '-or' flag value used UNSCALED, exactly
    # like copy_unstable.vert:138-149 (reference default 3)
    outlier_coefficient: float = 3.0
    unstable_time: int = 20             # unstable surfel timeout ticks, copy_unstable.vert:134
    velocity_weight_min: float = 0.5    # computeFusionWeight clamp, Model.cpp:391-406
    # frames between model spawns ('-offset' flag; GUI modelSpawnOffset=22,
    # CoFusion.cpp:112,230,256) — also delays the FIRST spawn past map warmup
    model_spawn_offset: int = 22
    # fern relocalization (Core/Ferns.cpp): minimum keyframe age for retrieval
    fern_min_age: int = 300
    # recovery ICP error gate (Ferns.cpp:237; tuned for 80x60 fern maps — relax
    # at lower resolutions)
    fern_icp_error_thresh: float = 3e-4
    # photometric verification gate ('-pt', Ferns.cpp:237 photoThresh=115)
    fern_photo_thresh: float = 115.0
    # keyframe-add dissimilarity threshold ('-ft', Ferns.cpp:72-142)
    fern_thresh: float = 0.3095
    # consecutive unseen frames before deactivation.  The reference's GUI knob
    # (modelDeactivateCnt=10) is dead code — inactivation fires on the first
    # unseen frame (CoFusion.cpp:285); 1 reproduces that, higher adds tolerance.
    model_deactivate_count: int = 1
    # local loop closure gates ('-cv', '-ie', '-ic' flags;
    # MainController.cpp:176-196 defaults; count is for 640x480 and scaled by
    # resolution at the use site)
    local_loop_cov_thresh: float = 1e-5
    local_loop_err_thresh: float = 5e-5
    local_loop_count_thresh: float = 40000.0
