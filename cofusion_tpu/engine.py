"""The CoFusion engine: per-frame orchestration of track -> segment -> fuse ->
clean -> predict over a batched model axis.

Reference: Core/CoFusion.{h,cpp} (processFrame :171-524, predict :533-545,
spawnObjectModel :588-597, inactivateModel :612-626, getNextModelID :628-644).

TPU-first architecture:
  * the reference loops over `std::list<Model>` on the host, fusing each model's
    passes sequentially (CoFusion.cpp:214-217, 465-489); here every per-model
    stage (tracking pyramids, GN solve, point render, fuse, clean) is **vmapped
    over a fixed-capacity model axis** with an `active` mask — model spawn/death
    never changes shapes, so nothing recompiles;
  * one jitted `_step` covers the whole frame: upload -> filter -> track ->
    fuse -> clean -> predict.  Host code sees only a small stats pytree per frame
    (single device->host transfer), vs. the reference's ~38 syncs/model/frame;
  * model spawn/inactivate decisions are host-side (they re-shape nothing; they
    flip `active` flags and reset slots), mirroring the reference's listener
    callbacks (Core/Callbacks.h).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cofusion_tpu.config import CameraConfig, CoFusionConfig, FusionParams, TrackingParams
from cofusion_tpu.models import surfel_model as sm
from cofusion_tpu.models.surfel_model import SurfelStore
from cofusion_tpu.ops import fusion as fu
from cofusion_tpu.ops import lie
from cofusion_tpu.ops import odometry as od
from cofusion_tpu.ops import preprocess as pp
from cofusion_tpu.ops import rasterize as rz
from cofusion_tpu.utils.stopwatch import Stopwatch


class ModelState(NamedTuple):
    """Batched per-model state; every leaf has a leading (M,) model axis.

    Two-tier surfel map (TPU-native redesign of the reference's single VBO):
    `store` is the ACTIVE tier — the surfels inside the reference's own
    time-window (time - lastUpdate <= timeDelta, the gate every per-frame
    reference shader applies: index_map.vert:48, copy_unstable.vert:136).  All
    per-frame passes (render, fuse, clean, compact) touch only this tier, whose
    capacity is bounded (cfg.active_capacity ~ 1M) so every randomly
    gathered/scattered operand stays inside VMEM where XLA's TPU fast path
    lives.  `stable` is the append-only tier holding surfels that aged out of
    the window — untouched per frame (exactly like the reference, whose clean
    pass declares inactive surfels immune) and only read by INACTIVE renders,
    loop-closure deformations and exports."""

    store: SurfelStore          # ACTIVE tier, leaves (M, A, ...)
    stable: SurfelStore         # STABLE tier, leaves (M, S, ...), append-only
    pose: jnp.ndarray           # (M, 4, 4) model pose (camera-to-model-origin)
    prev_pose: jnp.ndarray      # (M, 4, 4) pose at previous frame (velocity weight)
    conf_threshold: jnp.ndarray  # (M,)
    max_depth: jnp.ndarray      # (M,) per-model fusion depth clamp
    active: jnp.ndarray         # (M,) bool
    age: jnp.ndarray            # (M,) int32 ticks since spawn
    model_id: jnp.ndarray       # (M,) int32 mask label of this model
    unseen: jnp.ndarray         # (M,) int32 consecutive frames without segment
    spawn_cooldown: jnp.ndarray  # () int32 frames since last spawn (CoFusion.cpp:230)


class EngineState(NamedTuple):
    models: ModelState
    tick: jnp.ndarray           # () int32
    so3_ref: jnp.ndarray        # coarsest-level intensity of the previous frame
    icp_error_maps: jnp.ndarray  # (M, H, W) last per-model ICP error (for CRF)
    prev_rgb: jnp.ndarray       # (H, W, 3) previous frame rgb (FillIn source)
    prev_filtered: jnp.ndarray  # (H, W) previous frame filtered depth
    prev_mask: jnp.ndarray      # (H, W) previous frame's segmentation (slot ids)
    #   — tracking gates read the PREVIOUS segmentation (the reference's MASK
    #   texture still holds frame t-1's result when tracking frame t,
    #   CoFusion.cpp:211 vs :233)
    pose_history: jnp.ndarray   # (LOG_CAP, M, 4, 4) on-device pose log.
    #   Living inside the (donated) state keeps the host loop fully async with
    #   no aliasing hazards: jit outputs that duplicate state leaves share
    #   device buffers, so host-held handles would be overwritten by the next
    #   donated step.  History is materialized in one bulk transfer at export.
    fern_db: object             # FernDB | int placeholder (relocalization off)
    lost: jnp.ndarray           # () bool — tracking-lost flag (CoFusion.cpp:301-338)
    unstable_count: jnp.ndarray  # () int32 consecutive high-covariance frames
    mask_history: jnp.ndarray   # (R, H, W) uint8 segmentation ring — '-es'
    #   exports drain it in bulk (one transfer per R frames) so the async host
    #   loop never blocks on a per-frame mask readback
    pred: object                # SplatMap with (M, H, W[, C]) leaves — the
    #   tracking/segmentation prediction CARRIED FORWARD from the previous
    #   frame's post-fuse render (built by splatting _fuse_clean_all's overlay
    #   imaps), replacing the reference's start-of-frame combinedPredict.  The
    #   content matches a fresh render of (map after frame t-1's fuse, pose
    #   t-1) — exactly what combinedPredict would draw at the start of frame t
    #   — except frame t-1's clean removals, which linger one frame.


class FrameOutputs(NamedTuple):
    """Small per-frame outputs (a few KB — the host loop stays async; the
    reference blocks ~38x/frame on GPU downloads, we block zero times unless
    stats are explicitly requested)."""

    poses: jnp.ndarray          # (M, 4, 4)
    icp_error: jnp.ndarray      # (M,)
    icp_count: jnp.ndarray      # (M,)
    rgb_error: jnp.ndarray      # (M,)
    surfel_counts: jnp.ndarray  # (M,)
    active: jnp.ndarray         # (M,) bool
    spawned: jnp.ndarray        # () bool — a new model was created this frame
    loop_closed: jnp.ndarray    # () bool — a local loop closure deformed the map


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def _render_pred_init(store, poses, conf_threshold, tick, time_delta, depth_cutoff,
                      *, cam, cfg):
    """One-off batched prediction render used to seed EngineState.pred."""
    return rz.splat_predict_b(
        store, poses, cam, cfg, tick, time_delta, depth_cutoff, conf_threshold
    )


def _fusion_weight(pose: jnp.ndarray, prev_pose: jnp.ndarray, multiplier) -> jnp.ndarray:
    """Velocity-based fusion weight (Model::computeFusionWeight, Model.cpp:391-406):
    fast motion -> lower confidence deposits, clamped to [0.5, 1] x multiplier."""
    diff = lie.compose(lie.invert_rt(prev_pose), pose)
    w = jnp.maximum(
        jnp.linalg.norm(diff[:3, 3]), jnp.linalg.norm(lie.so3_log(diff[:3, :3]))
    )
    w = jnp.minimum(w, 0.01)
    return jnp.maximum(1.0 - w / 0.01, 0.5) * multiplier


class CoFusion:
    """Host-side engine wrapper (the reference's CoFusion class, minus GL)."""

    def __init__(
        self,
        cfg: CoFusionConfig,
        tracking: TrackingParams | None = None,
        fusion_params: FusionParams | None = None,
        enable_multi_model: bool = False,
        enable_relocalization: bool = False,
        close_loops: bool = False,
        frame_to_frame_rgb: bool = False,
        keep_models: bool = False,
    ):
        self.cfg = cfg
        self.cam = cfg.camera
        self.tracking = tracking or TrackingParams()
        self.fusion = fusion_params or FusionParams()
        self.enable_multi_model = enable_multi_model
        self.enable_relocalization = enable_relocalization
        self.close_loops = close_loops
        self.frame_to_frame_rgb = frame_to_frame_rgb
        # '-keep': keep deactivated models' data unconditionally; otherwise
        # smart delete keeps only mature maps (>= 4000 surfels AND confidence
        # threshold > 0.3 — CoFusion.cpp:612-626, CoFusion.h:384-385)
        self.keep_models = keep_models
        # hot-tunable runtime overrides (the reference re-reads ~25 Pangolin
        # Vars every frame, MainController.cpp:448-473); set via set_params()
        self._hot: dict = {}
        self.sw = Stopwatch.get()
        self.state: EngineState | None = None
        self._timestamps: list[int] = []
        from cofusion_tpu.ops.segmentation import GtMaskMapper

        self._gt_mapper = GtMaskMapper()
        self._used_slots: set[int] = {0}
        self._ever_active: set[int] = {0}
        # host mirror of per-slot consecutive-unseen counts (GT-mask mode slot
        # recycling; the CRF path reads the device's `active` flags instead)
        self._host_unseen: dict[int, int] = {}
        # model lifecycle listeners (addNewModelListener /
        # addInactiveModelListener, CoFusion.h:286-289; fired with the slot id
        # instead of a Model handle — use download_model(slot) for the data).
        # CRF-mode events fire at the periodic active-flag sync (<=4 frames
        # late), keeping the host loop async; GT-mask events fire immediately.
        self._new_model_listeners: list = []
        self._inactive_model_listeners: list = []
        self._active_snapshot: set[int] = {0}
        self._last_segmentation: np.ndarray | None = None
        self._last_outputs = None
        # host mirror of the device's spawn_cooldown counter: the GT-mask path
        # must only COMMIT a mask-id->slot mapping on frames where the device
        # will actually accept the spawn (cooldown >= spawn_offset), otherwise
        # the id is consumed but the model never exists and its pixels are
        # forever excluded from the background (the reference re-tries every
        # frame because it records the mapping only when allowNew is true,
        # Segmentation.cpp:86-90 + CoFusion.cpp:112)
        self._host_cooldown = 0
        # True once the GT-mask path has produced a host-side remapped mask —
        # current_segmentation() then serves it for free instead of reading back
        self._seg_from_host = False
        # frames whose masks were already pulled from the device mask ring
        self._masks_drained = 0
        # pose-history chunks flushed to host before the device ring wraps
        self._flushed_poses: list[np.ndarray] = []
        from cofusion_tpu.config import SegmentationParams

        self.segmentation = SegmentationParams()
        self._step_fns: dict[tuple, object] = {}
        self._frames_since_sync = 0
        self._render_fn = None
        # CRF-mode double-buffered active-flag readback: the handle whose
        # async device->host copy was initiated at the previous sync point
        self._pending_active = None
        self._sync_cadence = 4
        # True while un-synced CRF frames may hold pending lifecycle events
        self._lifecycle_dirty = False

    def _get_step(self, use_crf: bool, use_gt_pose: bool = False):
        key = (use_crf, self.enable_relocalization, use_gt_pose, self.close_loops)
        if key not in self._step_fns:
            self._step_fns[key] = jax.jit(
                functools.partial(
                    _step, cam=self.cam, cfg=self.cfg, tparams=self.tracking,
                    sparams=self.segmentation, use_crf=use_crf,
                    use_reloc=self.enable_relocalization,
                    use_gt_pose=use_gt_pose, close_loops=self.close_loops,
                ),
                donate_argnums=(0,),
            )
        return self._step_fns[key]

    # ------------------------------------------------------------------
    def _init_state(self, rgb, depth, mask) -> EngineState:
        cfg = self.cfg
        cam = self.cam
        M = cfg.max_models
        fp = self.fusion

        intensity = pp.rgb_to_intensity(rgb)
        filtered = pp.bilateral_filter(depth, fp.depth_cutoff)
        frame_surfels = fu.make_frame_surfels(
            depth, filtered, rgb, cam, 1.0, fp.depth_cutoff
        )
        # model 0 = static background/global model (CoFusion.cpp:70-71)
        store0 = fu.initialise(frame_surfels, jnp.eye(4), cfg.active_capacity, time=1)
        empty = sm.empty_store(cfg.active_capacity)
        stores = jax.tree.map(
            lambda a, b: jnp.broadcast_to(b[None], (M,) + b.shape).at[0].set(a),
            store0,
            empty,
        )
        empty_stable = sm.empty_store(cfg.max_surfels)
        stables = jax.tree.map(
            lambda b: jnp.broadcast_to(b[None], (M,) + b.shape), empty_stable
        )
        eye = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (M, 4, 4))
        models = ModelState(
            store=stores,
            stable=stables,
            pose=eye,
            prev_pose=eye,
            # NOTE: strong dtypes everywhere — a weak-typed leaf (jnp.full from
            # a Python float) makes the SECOND engine step retrace and
            # recompile the whole graph (the step's outputs are strong-typed),
            # which costs minutes per extra compile on this box
            conf_threshold=jnp.full((M,), fp.confidence_global, jnp.float32)
            .at[1:].set(fp.confidence_object),
            max_depth=jnp.full((M,), fp.depth_cutoff, jnp.float32),
            active=jnp.zeros((M,), bool).at[0].set(True),
            age=jnp.zeros((M,), jnp.int32),
            model_id=jnp.arange(M, dtype=jnp.int32),
            unseen=jnp.zeros((M,), jnp.int32),
            spawn_cooldown=jnp.int32(0),
        )
        so3_ref = intensity
        for _ in range(cfg.pyramid_levels - 1):
            so3_ref = pp.pyr_down_gauss(so3_ref)
        pose_history = jnp.broadcast_to(
            jnp.eye(4, dtype=jnp.float32), (cfg.max_log_frames, M, 4, 4)
        )
        if self.enable_relocalization:
            from cofusion_tpu.ops import ferns as fern_ops

            fern_db = fern_ops.new_db(cam, max_depth_mm=fp.depth_cutoff * 1000.0)
        else:
            fern_db = jnp.int32(0)  # placeholder leaf
        # seed the carried prediction with a one-off render of the initialised
        # map (thereafter _step maintains it from the post-fuse overlay imaps,
        # one render pass per frame) — frame 2 sees exactly what a
        # start-of-frame combinedPredict would draw
        pred = _render_pred_init(
            models.store, models.pose, models.conf_threshold, jnp.int32(1),
            jnp.int32(cfg.time_delta),
            jnp.full((M,), fp.depth_cutoff, jnp.float32),
            cam=cam, cfg=cfg,
        )
        return EngineState(
            models=models,
            tick=jnp.int32(1),
            so3_ref=so3_ref,
            icp_error_maps=jnp.zeros((M,) + cam.shape, jnp.float32),
            prev_rgb=rgb,
            prev_filtered=filtered,
            prev_mask=mask,
            pose_history=pose_history,
            fern_db=fern_db,
            lost=jnp.bool_(False),
            unstable_count=jnp.int32(0),
            mask_history=jnp.zeros(
                (cfg.mask_ring_frames,) + cam.shape, jnp.uint8
            ),
            pred=pred,
        )

    # ------------------------------------------------------------------
    def _make_fparams(self, weight_multiplier, new_slot, use_crf, mask_np, gt_pose):
        """Per-frame traced-scalar dict, cached: each eager `jnp.float32(...)`
        is a device dispatch (~25 per frame uncached), and on this platform
        host->device dispatches are the async loop's scarcest resource.  The
        run-constant fields are created ONCE; only the handful that actually
        vary (weight multiplier, GT-mask slot nomination, '-p' pose) are
        re-created, themselves memoized by value."""
        if not hasattr(self, "_fp_const"):
            f = self.fusion
            s = self.segmentation
            h = self._hot

            def hot(name, default):
                return jnp.float32(h.get(name, default))

            self._fp_const = dict(
                depth_cutoff=hot("depth_cutoff", f.depth_cutoff),
                outlier_coeff=hot("outlier_coefficient", f.outlier_coefficient),
                # hot-tunable GUI-Var set (MainController.cpp:448-473): traced
                # scalars — set_params() changes them with NO recompilation
                icp_weight=hot("icp_weight", self.tracking.icp_weight),
                crf_scale_rgb=hot("crf_scale_rgb", s.scale_rgb),
                crf_scale_depth=hot("crf_scale_depth", s.scale_depth),
                crf_scale_pos=hot("crf_scale_pos", s.scale_pos),
                crf_w_app=hot("weight_appearance", s.weight_appearance),
                crf_w_smooth=hot("weight_smoothness", s.weight_smoothness),
                unary_threshold_new=hot("unary_threshold_new", s.unary_threshold_new),
                unary_k_error=hot("unary_k_error", s.unary_k_error),
                unary_weight_error=hot("unary_weight_error", s.unary_weight_error),
                seg_min_new=hot("min_rel_size_new", s.min_rel_size_new),
                seg_max_new=hot("max_rel_size_new", s.max_rel_size_new),
                # '-keep' smart-delete gates (CoFusion.cpp:615, CoFusion.h:384-385)
                keep_data=jnp.bool_(self.keep_models),
                keep_min_surfels=hot("keep_min_surfels", 4000.0),
                keep_conf=hot("keep_conf_threshold", 0.3),
                time_delta=jnp.int32(self.cfg.time_delta),
                spawn_offset=jnp.int32(f.model_spawn_offset),
                conf_object=jnp.float32(f.confidence_object),
                deactivate_count=jnp.int32(f.model_deactivate_count),
                fern_min_age=jnp.int32(f.fern_min_age),
                fern_icp_thresh=jnp.float32(f.fern_icp_error_thresh),
                fern_photo_thresh=jnp.float32(f.fern_photo_thresh),
                fern_thresh=jnp.float32(f.fern_thresh),
                ftf=jnp.bool_(self.frame_to_frame_rgb),
                loop_cov_thresh=jnp.float32(f.local_loop_cov_thresh),
                loop_err_thresh=jnp.float32(f.local_loop_err_thresh),
                loop_count_thresh=jnp.float32(f.local_loop_count_thresh),
                gt_pose_eye=jnp.eye(4, dtype=jnp.float32),
                bool_true=jnp.bool_(True),
                bool_false=jnp.bool_(False),
            )
            self._fp_wmult: dict[float, jnp.ndarray] = {}
            self._fp_slot: dict[int, jnp.ndarray] = {}
        c = self._fp_const
        wm = float(weight_multiplier)
        if wm not in self._fp_wmult:
            self._fp_wmult[wm] = jnp.float32(wm)
        ns = int(new_slot)
        if ns not in self._fp_slot:
            self._fp_slot[ns] = jnp.int32(ns)
        fparams = dict(
            {
                k: v
                for k, v in c.items()
                if k not in ("gt_pose_eye", "bool_true", "bool_false")
            },
            weight_multiplier=self._fp_wmult[wm],
            new_slot=self._fp_slot[ns],
            allow_new=c["bool_true"] if ns >= 0 else c["bool_false"],
            gt_masks=(
                c["bool_true"]
                if (self.enable_multi_model and not use_crf and mask_np is not None)
                else c["bool_false"]
            ),
            gt_pose=(
                c["gt_pose_eye"] if gt_pose is None
                else jnp.asarray(gt_pose, jnp.float32)
            ),
        )
        return fparams

    # ------------------------------------------------------------------
    _HOT_PARAMS = frozenset(
        (
            "depth_cutoff", "outlier_coefficient", "icp_weight",
            "crf_scale_rgb", "crf_scale_depth", "crf_scale_pos",
            "weight_appearance", "weight_smoothness",
            "unary_threshold_new", "unary_k_error", "unary_weight_error",
            "min_rel_size_new", "max_rel_size_new",
            "keep_min_surfels", "keep_conf_threshold",
        )
    )

    def set_params(self, **kw) -> None:
        """Change runtime-tunable parameters mid-run WITHOUT recompilation —
        the reference's Pangolin Vars are re-read every frame and pushed into
        the engine via setters (MainController.cpp:448-473: icpWeight,
        depthCutoff, outlierCoefficient, all CRF weights/thresholds).  The
        values are traced scalars in the per-frame `fparams` dict, so the
        compiled program is unchanged; only the next frame's inputs differ."""
        bad = set(kw) - self._HOT_PARAMS
        if bad:
            raise ValueError(
                f"not hot-tunable: {sorted(bad)}; available: {sorted(self._HOT_PARAMS)}"
            )
        self._hot.update(kw)
        if hasattr(self, "_fp_const"):
            del self._fp_const  # rebuilt (with overrides) on the next frame

    def set_confidence_threshold(self, slot: int, value: float) -> None:
        """Hot-set one model's confidence threshold (the reference's per-model
        GUI sliders, GUI/Tools/GUI.h:39,58).  Device-side state write between
        frames; no recompilation."""
        if self.state is None:
            if slot == 0:
                self.fusion = dataclasses.replace(self.fusion, confidence_global=value)
            else:
                self.fusion = dataclasses.replace(self.fusion, confidence_object=value)
            return
        models = self.state.models
        self.state = self.state._replace(
            models=models._replace(
                conf_threshold=models.conf_threshold.at[slot].set(jnp.float32(value))
            )
        )

    # ------------------------------------------------------------------
    def process_frame(
        self,
        frame: dict,
        weight_multiplier: float = 1.0,
        sync: bool = False,
        gt_pose: np.ndarray | None = None,
    ) -> dict:
        """One frame.  `frame` dict: rgb uint8 (H,W,3), depth float32 meters (H,W),
        optional mask uint8 (H,W), timestamp int.

        The call is ASYNC by default: the jitted step is dispatched and small
        device handles are logged; nothing blocks on the device.  Pass
        `sync=True` (or call `.stats()`) to materialize this frame's numbers.
        `gt_pose`: 4x4 camera-to-world pose override ('-p' mode; tracking and
        segmentation are skipped, CoFusion.cpp:342).
        """
        with self.sw.section("Run"):
            rgb = jnp.asarray(frame["rgb"], jnp.float32)
            depth = jnp.asarray(frame["depth"], jnp.float32)
            ts = frame.get("timestamp", 0)

            if self.state is None:
                # first frame initialises the global model only (CoFusion.cpp:202-205);
                # objects spawn from later frames' segmentation
                with self.sw.section("Init"):
                    self.state = self._init_state(
                        rgb, depth, jnp.zeros(self.cam.shape, jnp.int32)
                    )
                self._timestamps.append(ts)
                self._last_outputs = None
                self._last_segmentation = np.zeros(self.cam.shape, np.uint8)
                return {"tick": 1}

            # --- choose segmentation source --------------------------------
            new_slot = -1
            mask_np = frame.get("mask")
            use_crf = False
            if gt_pose is not None:
                # '-p': the reference skips segmentation entirely under inPose
                # (CoFusion.cpp:340-343) — committing a mask-id->slot mapping
                # here would consume ids for models that never spawn and
                # permanently exclude their pixels from background fusion
                mask = jnp.zeros(self.cam.shape, jnp.int32)
            elif self.enable_multi_model and mask_np is not None:
                # ground-truth mask path: remap dataset ids -> model slots
                # (Segmentation.cpp:59-122; the persistent `mapping` vector).
                # allow_new mirrors the device's spawn_cooldown gate so the
                # mapping commits exactly when the device spawns; unmapped ids
                # fall back to background and retry next frame.
                free = [s for s in range(1, self.cfg.max_models) if s not in self._used_slots]
                allow = bool(free) and self._host_cooldown >= self.fusion.model_spawn_offset
                slot_mask, assigned = self._gt_mapper.remap(
                    np.asarray(mask_np), free, allow_new=allow
                )
                if assigned is not None:
                    new_slot = assigned
                    self._used_slots.add(assigned)
                    self._ever_active.add(assigned)
                    for fn in self._new_model_listeners:
                        fn(assigned)
                self._last_segmentation = slot_mask
                self._seg_from_host = True
                mask = jnp.asarray(slot_mask, jnp.int32)
                # host mirror of the device's unseen-deactivation
                # (CoFusion.cpp:284-291): slots whose mask id vanished for
                # model_deactivate_count consecutive frames are freed for
                # reuse and their stale dataset-id mappings purged — the
                # reference supports 256 SEQUENTIAL ids (:628-644), so the
                # number of objects over a run must not be capped at
                # max_models-1 concurrent slots
                present = {int(v) for v in np.unique(slot_mask)}
                for s in sorted(self._used_slots):
                    if s == 0 or s == assigned:
                        continue
                    if s in present:
                        self._host_unseen[s] = 0
                    else:
                        self._host_unseen[s] = self._host_unseen.get(s, 0) + 1
                        if self._host_unseen[s] >= self.fusion.model_deactivate_count:
                            self._used_slots.discard(s)
                            self._host_unseen.pop(s, None)
                            self._gt_mapper.purge_slot(s)
                            for fn in self._inactive_model_listeners:
                                fn(s)
            elif self.enable_multi_model:
                # motion-cue CRF path: device-side segmentation; the host only
                # nominates which free slot a new model would occupy
                use_crf = True
                free = [s for s in range(1, self.cfg.max_models) if s not in self._used_slots]
                new_slot = free[0] if free else -1
                mask = jnp.zeros(self.cam.shape, jnp.int32)
            else:
                mask = jnp.asarray(
                    mask_np if mask_np is not None else np.zeros(self.cam.shape, np.uint8),
                    jnp.int32,
                )
            with self.sw.section("odom+fuse"):
                fparams = self._make_fparams(
                    weight_multiplier, new_slot, use_crf, mask_np, gt_pose
                )
                self.state, outputs = self._get_step(use_crf, gt_pose is not None)(
                    self.state, rgb, depth, mask, fparams
                )

            self._last_outputs = outputs
            self._timestamps.append(ts)

            # spawn-cooldown mirror (matches the device update exactly:
            # new_cooldown = 0 if has_new else cooldown+1)
            if new_slot >= 0 and not use_crf and mask_np is not None:
                self._host_cooldown = 0
            else:
                self._host_cooldown = min(self._host_cooldown + 1, 10000)

            # CRF mode: periodically refresh the host's slot-usage view (the
            # device spawns/kills models autonomously).  ZERO blocking reads
            # on the frame path: each sync point CONSUMES the device->host
            # copy initiated at the PREVIOUS sync (the transfer had a full
            # cadence of frames to cross the tunnel, so np.asarray on it is
            # a cache hit) and STARTS a new async copy from this frame's
            # outputs.active — a fresh non-donated buffer, safe to hold
            # across later donated steps.  Slot-view staleness grows from
            # one cadence to two (<= 8 frames), still far inside the
            # spawn_cooldown window (22 frames) that makes between-sync
            # `new_slot` nominations safe.
            if use_crf:
                self._lifecycle_dirty = True
                self._frames_since_sync += 1
                if self._frames_since_sync >= self._sync_cadence:
                    self._frames_since_sync = 0
                    prev = self._pending_active
                    self._pending_active = outputs.active
                    try:
                        self._pending_active.copy_to_host_async()
                    except (AttributeError, NotImplementedError):
                        pass
                    if prev is not None:
                        self._apply_active_snapshot(np.asarray(prev))

            # flush the on-device pose-history ring to the host before it wraps
            # (sequences longer than max_log_frames would otherwise silently
            # alias early slots)
            n_tracked = len(self._timestamps) - 1
            cap = self.cfg.max_log_frames
            if n_tracked - len(self._flushed_poses) >= cap - 8:
                self._flush_pose_history()
            if sync:
                return self.stats()
        return {"tick": None}

    def _apply_active_snapshot(self, active: np.ndarray) -> None:
        """Fold a materialized active-flag snapshot into the host's slot view:
        fire lifecycle listeners on edges and recycle dead slots (the device
        resets a recycled slot's store/pose/threshold on spawn) — without
        recycling the TOTAL object count per run would be capped at
        max_models-1 (the reference supports 256 sequential ids,
        CoFusion.cpp:628-644)."""
        now = {0} | {s for s in range(1, self.cfg.max_models) if active[s]}
        for s in sorted(now - self._active_snapshot):
            self._ever_active.add(s)
            for fn in self._new_model_listeners:
                fn(s)
        for s in sorted(self._active_snapshot - now):
            for fn in self._inactive_model_listeners:
                fn(s)
        self._active_snapshot = now
        self._used_slots = set(now)

    def flush_lifecycle(self) -> None:
        """Materialize the freshest active flags and fire any pending
        lifecycle events (blocking; end-of-run / on-demand use only — the
        frame path syncs asynchronously at the sync cadence).  No-op outside
        CRF mode: the GT-mask path fires its events immediately host-side."""
        if self.state is None or not self._lifecycle_dirty:
            return
        self._lifecycle_dirty = False
        self._pending_active = None
        self._frames_since_sync = 0
        self._apply_active_snapshot(np.asarray(self.state.models.active))

    def _flush_pose_history(self) -> None:
        """Move device pose-history entries into the host-side chunk list."""
        n_tracked = len(self._timestamps) - 1
        cap = self.cfg.max_log_frames
        hist = np.asarray(self.state.pose_history)
        for i in range(len(self._flushed_poses) + 1, n_tracked + 1):
            self._flushed_poses.append(hist[i % cap].copy())

    def drain_segmentation(self, flush: bool = False) -> list[tuple[int, np.ndarray]]:
        """Pull newly available segmentation masks from the on-device ring.

        Returns [(tick, mask uint8 (H,W)), ...] for frames not yet drained.
        Masks live in `state.mask_history` (written by `_step` at slot
        (tick-1) % R) and come back in ONE bulk transfer every ~R frames, so
        '-es' exports never serialize the async loop with a per-frame readback
        (the reference writes the mask texture every frame, CoFusion.cpp:235-240;
        a per-frame device->host sync costs ~34 ms through the axon tunnel).
        Call every frame (usually returns []); pass flush=True at end of run.
        """
        out: list[tuple[int, np.ndarray]] = []
        n_tracked = len(self._timestamps) - 1
        pending = n_tracked - self._masks_drained
        R = self.cfg.mask_ring_frames
        if pending <= 0 or (not flush and pending < R - 4):
            return out
        hist = np.asarray(self.state.mask_history)
        start = max(self._masks_drained + 1, n_tracked - R + 1)
        for i in range(start, n_tracked + 1):
            # frame i was processed at tick i+1; _step wrote slot ((i+1)-1) % R
            out.append((i + 1, hist[i % R].copy()))
        self._masks_drained = n_tracked
        return out

    def stats(self) -> dict:
        """Materialize the most recent frame's outputs (blocks on the device).

        Reads through `self.state` (the authoritative, never-aliased handles),
        not stale output handles.
        """
        with self.sw.section("download"):
            out = self._last_outputs
            st = {
                "tick": int(self.state.tick),
                "poses": np.asarray(self.state.models.pose),
                "surfel_counts": np.asarray(self.state.models.store.count)
                + np.minimum(
                    np.asarray(self.state.models.stable.count),
                    self.state.models.stable.capacity,
                ),
                "active": np.asarray(self.state.models.active),
            }
            if out is not None:
                st["icp_error"] = np.asarray(out.icp_error)
                st["icp_count"] = np.asarray(out.icp_count)
                st["rgb_error"] = np.asarray(out.rgb_error)
        return st

    def materialized_pose_log(self) -> list[tuple[int, np.ndarray]]:
        """Pose log as numpy: host-flushed chunks + one bulk transfer of the
        on-device tail (frames beyond the last flush)."""
        n = len(self._timestamps)
        cap = self.cfg.max_log_frames
        nf = len(self._flushed_poses)
        if (n - 1) - nf > cap:
            raise RuntimeError(
                f"pose history wrapped: {n - 1 - nf} unflushed frames exceed "
                f"max_log_frames={cap} (flush cadence broken)"
            )
        hist = np.asarray(self.state.pose_history)
        out = [(self._timestamps[0], np.broadcast_to(np.eye(4, dtype=np.float32), hist.shape[1:]).copy())]
        for i in range(1, n):
            # tracked frame i is written at history slot i (tick i+1 - 1)
            if i <= nf:
                out.append((self._timestamps[i], self._flushed_poses[i - 1]))
            else:
                out.append((self._timestamps[i], hist[i % cap]))
        return out

    @property
    def pose_log(self) -> list[tuple[int, np.ndarray]]:
        return self.materialized_pose_log()

    def render_views(self) -> dict:
        """Global-model splat render at the current pose — feeds the -ev
        (viewport RGB) and -en (normals) exports (GUI/MainController.cpp:394-407
        renders the scene; headless equivalent is the model's predicted view)."""
        if self._render_fn is None:
            def _render(store, stable, pose, tick, fp):
                one = jax.tree.map(lambda a: a[0], store)
                sp = rz.splat_predict(
                    one, pose[0], self.cam, self.cfg, tick,
                    fp["time_delta"], fp["depth_cutoff"], fp["conf"],
                )
                # include the stable tier (no time window: everything the map
                # remembers is part of the viewport render)
                one_s = jax.tree.map(lambda a: a[0], stable)
                sp_s = rz.splat_predict(
                    one_s, pose[0], self.cam, self.cfg, tick,
                    jnp.int32(1 << 30), fp["depth_cutoff"], fp["conf"],
                )
                sp = rz.splat_merge(sp, sp_s)
                return sp.image, sp.normal_rad[..., :3], sp.valid

            self._render_fn = jax.jit(_render)
        fp = dict(
            time_delta=jnp.int32(self.cfg.time_delta),
            depth_cutoff=jnp.float32(self.fusion.depth_cutoff),
            conf=self.state.models.conf_threshold[0],
        )
        img, nrm, ok = self._render_fn(
            self.state.models.store, self.state.models.stable,
            self.state.models.pose, self.state.tick, fp,
        )
        return {
            "image": np.asarray(img),
            "normal": np.asarray(nrm),
            "valid": np.asarray(ok),
        }

    # ------------------------------------------------------------------
    def current_segmentation(self) -> np.ndarray | None:
        """Most recent segmentation mask (model ids per pixel).

        GT-mask mode serves the host-built remap for free; CRF mode blocks on
        one device readback — bulk exports should use `drain_segmentation`
        instead (no per-frame sync)."""
        if self._seg_from_host or self.state is None:
            return self._last_segmentation
        return np.asarray(self.state.prev_mask).astype(np.uint8)

    def model_ever_active(self, m: int) -> bool:
        self.flush_lifecycle()  # CRF events may be in flight; GT mode: no-op
        return m in self._ever_active

    # -- model lifecycle listeners (CoFusion.h:286-289) -----------------
    def add_new_model_listener(self, fn) -> None:
        """fn(slot: int) on model spawn (newModelListeners, CoFusion.cpp:607).
        CRF-mode events arrive at most two sync cadences (<=8 frames) late —
        the readback is double-buffered so the async loop NEVER blocks;
        GT-mask events are immediate.  flush_lifecycle() forces delivery."""
        self._new_model_listeners.append(fn)

    def add_inactive_model_listener(self, fn) -> None:
        """fn(slot: int) on model deactivation (inactiveModelListeners,
        CoFusion.cpp:624)."""
        self._inactive_model_listeners.append(fn)

    def pose_log_for(self, m: int) -> list[tuple[int, np.ndarray]]:
        """Pose log in the reference's export convention (CoFusion.cpp:502-519):
        model 0 logs cam->world; objects log P_cam * P_obj^-1 (obj->world)."""
        out = []
        for ts, poses in self.materialized_pose_log():
            if m == 0:
                out.append((ts, poses))
            else:
                composed = poses.copy()
                composed[m] = poses[0] @ np.linalg.inv(poses[m])
                out.append((ts, composed))
        return out

    def camera_pose(self) -> np.ndarray:
        """Current global-camera pose (model 0)."""
        return np.asarray(self.state.models.pose[0])

    def surfel_count(self, model: int = 0) -> int:
        return int(self.state.models.store.count[model]) + min(
            int(self.state.models.stable.count[model]),
            self.state.models.stable.capacity,
        )

    def download_model(self, model: int = 0) -> dict:
        """Whole two-tier map of one model (Model::downloadMap): stable (old)
        surfels first, then the active tier."""
        act = jax.tree.map(lambda a: a[model], self.state.models.store)
        stb = jax.tree.map(lambda a: a[model], self.state.models.stable)
        d_act = sm.download(act)
        d_stb = sm.download_masked(stb)
        return {k: np.concatenate([d_stb[k], d_act[k]], axis=0) for k in d_act}


# ---------------------------------------------------------------------------
# the jitted per-frame step


def _step(
    state: EngineState,
    rgb: jnp.ndarray,
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    fparams: dict,
    *,
    cam: CameraConfig,
    cfg: CoFusionConfig,
    tparams: TrackingParams,
    sparams=None,
    use_crf: bool = False,
    use_reloc: bool = False,
    use_gt_pose: bool = False,
    close_loops: bool = False,
):
    """The whole frame as one XLA program (CoFusion::processFrame).

    Static variants (each compiles its own program, cached per mode):
      * `use_crf` — motion-cue CRF segmentation vs externally-supplied masks;
      * `use_reloc` — fern keyframing + tracking-lost recovery ('-rl');
      * `use_gt_pose` — '-p': the global pose comes from fparams['gt_pose'] and
        tracking/segmentation are skipped entirely, mirroring the reference's
        `else { overridePose(*inPose) }` branch (CoFusion.cpp:210,342);
      * `close_loops` — model-to-model local loop closure + deformation-graph
        map correction (CoFusion.cpp:387-459; dead in the reference release —
        assert(0) at :447 — implemented here behind this gate per SURVEY §7).
    """
    M = cfg.max_models
    tick = state.tick + 1
    tickf = tick.astype(jnp.float32)
    models = state.models

    # --- preprocess -------------------------------------------------------
    intensity = pp.rgb_to_intensity(rgb)
    filtered = pp.bilateral_filter(depth, fparams["depth_cutoff"])

    if use_gt_pose:
        return _step_gt_pose(
            state, rgb, depth, mask, filtered, intensity, fparams,
            cam=cam, cfg=cfg, tick=tick,
        )

    # --- per-model prediction (tracking targets) --------------------------
    # CARRIED from the previous frame's post-fuse render (state.pred) — the
    # start-of-frame combinedPredict re-render the reference performs
    # (CoFusion.cpp:541 + ModelProjection) would draw the same content (same
    # map, same pose; only the previous clean's removals differ, one frame
    # stale), so the whole frame needs ONE render pass instead of three.
    splat = state.pred

    # --- FillIn (global model only, CoFusion.cpp:541): composite the previous
    # frame's raw data into prediction holes so tracking degrades to
    # frame-to-frame where the map has no confident surfels yet.  Passthrough
    # wiring mirrors Model::performFillIn (Model.cpp:901-910): geometry passes
    # through raw while lost; the image also does in '-ftf' mode.
    from cofusion_tpu.ops import fillin as fi

    splat0_for_fill = jax.tree.map(lambda a: a[0], splat)
    filled = fi.fill_in(
        splat0_for_fill, state.prev_rgb, state.prev_filtered, cam, fparams["depth_cutoff"],
        passthrough_geom=state.lost,
        passthrough_rgb=state.lost | fparams["ftf"],
    )
    pred_vert = splat.vert_conf[..., :3].at[0].set(filled.vert)
    pred_norm = splat.normal_rad[..., :3].at[0].set(filled.normal)
    pred_valid = splat.valid.at[0].set(filled.valid)
    pred_image = splat.image.at[0].set(filled.image)

    # --- build tracking pyramids -----------------------------------------
    multi = M > 1

    # ONE shared frame pyramid for all models; per-model masking is applied as
    # cheap validity gates on top (od.with_model_mask) instead of rebuilding
    # masked pyramids per model — the expensive downsample/sobel/normal chains
    # are computed once.
    frame_pyr = od.build_frame_pyramid(
        filtered, intensity, None, 0, cam, cfg, fparams["depth_cutoff"],
        tparams.max_depth_rgb,
    )
    if multi:
        # RGB-term mask (the ICP side is unmasked, reference parity): GT masks
        # exist before tracking; the CRF mask lags one frame (the reference's
        # MASK texture still holds frame t-1's result when tracking frame t)
        track_mask = jnp.where(fparams["gt_masks"], mask, state.prev_mask)
        mask_pyrs = [track_mask]
        for _ in range(cfg.pyramid_levels - 1):
            mask_pyrs.append(pp.pyr_down_nearest(mask_pyrs[-1]))
        # the 15-shift RGB-window erosion is shared across models (two integer
        # compares per model instead of 15 shifts x levels x models)
        mask_bounds = od.mask_window_bounds(mask_pyrs)
    else:
        mask_pyrs = None
        mask_bounds = None

    # --- track: ALL models in ONE batched program (od.track_models).  The
    # model axis folds into every pass — gathers flat-indexed, reductions one
    # batched MXU dot_general.  Unrolled per-model tracking at 640x480 is
    # dominated by per-pass fixed overhead (measured 106 ms for 4 models vs
    # 37 ms for 1); batching keeps the pass count constant in M.  Inactive
    # slots compute too (empty predictions -> zero correspondences -> pose
    # unchanged) — the north-star workload runs every slot live anyway.
    mpyr_b = jax.vmap(
        lambda vert, norm, ok, image, pose_m: od.build_model_pyramid(
            vert, norm, ok, pp.rgb_to_intensity(image), pose_m, cam, cfg,
            tparams.max_depth_rgb,
        )
    )(pred_vert, pred_norm, pred_valid, pred_image, models.pose)
    if multi:
        ids3 = models.model_id[:, None, None]
        valid_b = tuple(
            frame_pyr.valid[l][None] & (mask_pyrs[l][None] == ids3)
            for l in range(cfg.pyramid_levels)
        )
        rgb_ok_b = tuple(
            frame_pyr.rgb_ok[l][None]
            & (mask_bounds[l][0][None] == ids3)
            & (mask_bounds[l][1][None] == ids3)
            for l in range(cfg.pyramid_levels)
        )
    else:
        valid_b = tuple(v[None] for v in frame_pyr.valid)
        rgb_ok_b = tuple(v[None] for v in frame_pyr.rgb_ok)
    res = od.track_models(
        models.pose, frame_pyr, valid_b, rgb_ok_b, mpyr_b, state.so3_ref,
        cam, cfg, tparams, icp_weight=fparams["icp_weight"],
    )
    # inactive slots keep their pose and report identity/zero stats (parity
    # with the old per-slot idle branch)
    act = models.active
    act3 = act[:, None, None]
    res = od.OdometryResult(
        pose=jnp.where(act3, res.pose, models.pose),
        A=jnp.where(act3, res.A, jnp.eye(6, dtype=jnp.float32)[None]),
        b=jnp.where(act[:, None], res.b, 0.0),
        icp_error=jnp.where(act, res.icp_error, 0.0),
        icp_count=jnp.where(act, res.icp_count, 0.0),
        rgb_error=jnp.where(act, res.rgb_error, 0.0),
        rgb_count=jnp.where(act, res.rgb_count, 0.0),
        so3_error=jnp.where(act, res.so3_error, 0.0),
    )
    new_pose = res.pose
    if use_crf:
        seg_err_maps = od.icp_error_maps_b(
            new_pose, models.pose, frame_pyr.vmap[0], frame_pyr.nmap[0],
            frame_pyr.valid[0], mpyr_b, cam, tparams, stride=cfg.gn_stride_l0,
        )
        seg_err_maps = jnp.where(act3, seg_err_maps, 0.0)
    else:
        seg_err_maps = jnp.zeros((M,) + cam.shape, jnp.float32)

    # --- segmentation + model lifecycle (multi-model) ---------------------
    # Two sources of the per-pixel model mask (Segmentation::performSegmentation):
    #   * GT path: `mask` already carries model-slot ids (host-remapped);
    #   * CRF path (use_crf): SLIC + ICP-error unaries + dense CRF mean-field on
    #     device, fed by THIS frame's tracking error maps (CoFusion.cpp:232).
    # Spawn (CoFusion.cpp:243-282) and inactivation (:284-291) are DEVICE-side:
    # slots never change shape, only `active` flags flip — nothing recompiles.
    slot_ids = jnp.arange(M, dtype=jnp.int32)
    new_conf_threshold = models.conf_threshold
    if multi:
        from cofusion_tpu.ops import segmentation as sg

        if use_crf:
            # the device picks the spawn slot itself: first INACTIVE slot > 0.
            # (Using a host-nominated slot races with device-side spawns between
            # host syncs and can clobber a live model's unary.)  Slots still
            # holding a deactivated model's KEPT map are chosen LAST so '-keep'
            # data survives as long as capacity allows (the reference's
            # inactiveModels list is unbounded; our slot pool is the bound).
            inactive = (~models.active).at[0].set(False)
            any_free = jnp.any(inactive)
            slot_empty = (models.store.count + models.stable.count) == 0
            pref = inactive & slot_empty
            new_slot = jnp.where(
                jnp.any(pref), jnp.argmax(pref), jnp.argmax(inactive)
            ).astype(jnp.int32)
            allow_new = any_free & (
                models.spawn_cooldown >= fparams["spawn_offset"]
            )
            conf_proj = splat.vert_conf[..., 3]
            # hot-tunable CRF scalars ride fparams (traced; set_params());
            # loop counts stay static from sparams
            sp_run = dataclasses.replace(
                sparams,
                scale_rgb=fparams["crf_scale_rgb"],
                scale_depth=fparams["crf_scale_depth"],
                scale_pos=fparams["crf_scale_pos"],
                weight_appearance=fparams["crf_w_app"],
                weight_smoothness=fparams["crf_w_smooth"],
                unary_threshold_new=fparams["unary_threshold_new"],
                unary_k_error=fparams["unary_k_error"],
                unary_weight_error=fparams["unary_weight_error"],
                min_rel_size_new=fparams["seg_min_new"],
                max_rel_size_new=fparams["seg_max_new"],
            )
            seg = sg.perform_segmentation_crf(
                rgb, depth, seg_err_maps, conf_proj, models.active,
                jnp.clip(new_slot, 0, M - 1), allow_new, cam, cfg, sp_run,
            )
            mask = seg.full_segmentation
            counts = seg.superpixel_count
            has_new = seg.has_new_label
            dmean, dstd = seg.depth_mean, seg.depth_std
            # rising object confidence thresholds (CoFusion.cpp:293-298)
            new_conf_threshold = jnp.where(
                slot_ids > 0,
                jnp.minimum(jnp.maximum(models.conf_threshold, seg.avg_conf), 9.0),
                models.conf_threshold,
            )
        else:
            new_slot = fparams["new_slot"]
            counts = jnp.zeros((M,), jnp.int32).at[mask.reshape(-1)].add(1, mode="drop")
            has_new = (
                fparams["allow_new"]
                & (models.spawn_cooldown >= fparams["spawn_offset"])
                & (jnp.take(counts, jnp.clip(new_slot, 0, M - 1)) > 0)
            )
            dmean, dstd, _ = sg.gt_mask_stats(mask, depth, M)

        slot_free = ~jnp.take(
            models.active, jnp.clip(new_slot, 0, M - 1)
        )
        has_new = has_new & (new_slot >= 0) & slot_free
        is_new_slot = (slot_ids == new_slot) & has_new
        active_fuse = models.active | is_new_slot
        # unseen-count deactivation (CoFusion.cpp:284-291; the reference fires on
        # the first miss, deactivate_count=1 reproduces that)
        miss = models.active & (slot_ids > 0) & (counts == 0)
        new_unseen = jnp.where(miss, models.unseen + 1, 0)
        deactivate = new_unseen >= fparams["deactivate_count"]
        # smart delete (inactivateModel, CoFusion.cpp:612-626): a deactivated
        # model's map is KEPT only when mature (>= modelKeepMinSurfels surfels
        # AND confidence threshold > modelKeepConfThreshold) — or always under
        # '-keep' (keep_data).  Wiped slots also skip this frame's fuse (the
        # reference erases the model from the list before its fuse loop).
        total_count = models.store.count + models.stable.count
        kept = fparams["keep_data"] | (
            (total_count.astype(jnp.float32) >= fparams["keep_min_surfels"])
            & (models.conf_threshold > fparams["keep_conf"])
        )
        wipe = deactivate & ~kept & (slot_ids > 0)
        active_fuse = active_fuse & ~wipe
        new_active = active_fuse & ~deactivate
        new_cooldown = jnp.where(has_new, 0, jnp.minimum(models.spawn_cooldown + 1, 10000))
        # per-model fusion depth clamp = depthMean + 1.2 * depthStd (CoFusion.cpp:228)
        model_max_depth = jnp.where(
            (slot_ids > 0) & active_fuse & (dmean > 0),
            dmean + 1.2 * dstd,
            fparams["depth_cutoff"],
        )
        # the just-spawned model fuses with weight multiplier 100 (CoFusion.cpp:268)
        wmult = jnp.where(is_new_slot, 100.0, fparams["weight_multiplier"])
    else:
        active_fuse = models.active
        new_active = models.active
        has_new = jnp.bool_(False)
        is_new_slot = jnp.zeros((M,), bool)
        model_max_depth = jnp.full((M,), fparams["depth_cutoff"])
        wmult = jnp.full((M,), fparams["weight_multiplier"])
        new_unseen = models.unseen
        new_cooldown = models.spawn_cooldown

    # --- model-slot recycling (spawnObjectModel, CoFusion.cpp:588-597): a
    # freshly spawned slot starts EMPTY with the CURRENT camera pose and the
    # initial object confidence threshold.  A recycled slot (a dead model's)
    # would otherwise leak its leftover surfels, raised threshold and stale
    # pose into the new object.  Clearing the valid masks + counts suffices —
    # every pass gates on them — so the reset costs two bool-mask writes, not
    # a full-array zero.
    models_store = models.store
    models_stable = models.stable
    if multi:
        rs = is_new_slot | wipe  # recycled spawn slots + smart-deleted maps
        models_store = models_store._replace(
            valid=models_store.valid & ~rs[:, None],
            count=jnp.where(rs, 0, models_store.count),
        )
        models_stable = models_stable._replace(
            valid=models_stable.valid & ~rs[:, None],
            count=jnp.where(rs, 0, models_stable.count),
        )
        # a fresh model's pose is IDENTITY (Model.cpp:108: the constructor
        # initializes pose to Identity; spawnObjectModel never overrides it) —
        # its map lives in the spawn-frame CAMERA coordinates, and the export
        # convention globalPose * modelPose^-1 (CoFusion.cpp:504-508) then
        # yields O_t O_s^-1 C_s.  Spawning at the camera pose instead shifts
        # every exported object pose by C_s.
        new_pose = jnp.where(
            rs[:, None, None], jnp.eye(4, dtype=new_pose.dtype)[None], new_pose
        )
        new_conf_threshold = jnp.where(
            rs, fparams["conf_object"], new_conf_threshold
        )

    # --- relocalization (use_reloc = '-rl'; CoFusion.cpp:301-338 + Ferns) --
    if use_reloc:
        from cofusion_tpu.config import CameraConfig as _CC
        from cofusion_tpu.ops import ferns as fern_ops

        # tracking-lost detection: any covariance axis above threshold for >10
        # consecutive frames (CoFusion.cpp:301-338; covariance = lastA^-1).
        # With GN level-0 striding A scales by ~1/stride^2, so the absolute
        # threshold is rescaled to keep the same sensitivity.
        cov = jnp.diag(jnp.linalg.inv(res.A[0] + 1e-9 * jnp.eye(6)))
        unstable = jnp.any(cov > 1e-4 * float(cfg.gn_stride_l0) ** 2)
        unstable_count = jnp.where(unstable, state.unstable_count + 1, jnp.int32(0))
        lost = state.lost | (unstable_count > 10)

        # fern-resolution (1/8) maps
        factor = 8
        cam_s = _CC(
            width=cam.width // factor, height=cam.height // factor,
            fx=cam.fx / factor, fy=cam.fy / factor,
            cx=cam.cx / factor, cy=cam.cy / factor,
        )
        rgb_s, d_s = rgb, filtered
        for _ in range(3):
            rgb_s = (rgb_s[0::2, 0::2] + rgb_s[1::2, 0::2] + rgb_s[0::2, 1::2] + rgb_s[1::2, 1::2]) * 0.25
            d_s = d_s[0::2, 0::2]
        vm_s, va_s = pp.compute_vmap(d_s, cam_s, fparams["depth_cutoff"])
        nm_s, na_s = pp.compute_nmap(vm_s, va_s)

        # keyframe insertion while healthy (the reference's processFerns is
        # FIXME-disabled, CoFusion.cpp:496 — the machinery is intended to run)
        db_new, _ = fern_ops.add_frame(
            state.fern_db, rgb_s, vm_s, nm_s, new_pose[0], tick,
            threshold=fparams["fern_thresh"],
        )
        fern_db = jax.tree.map(
            lambda new, old: jnp.where(~lost, new, old), db_new, state.fern_db
        )

        # retrieval + fern-resolution ICP verification (Ferns::findFrame)
        match = fern_ops.find_frame(fern_db, rgb_s, vm_s, tick, min_age=fparams["fern_min_age"])
        # 20 iterations (2x reference): at 1/8 resolution each is microseconds and
        # the 3e-4 error gate needs full convergence
        fern_cfg = cfg.replace(
            use_so3=False, use_pyramid=False, gn_iters=(20, 0, 0), camera=cam_s,
            gn_stride_l0=1,  # fern inlier-count gates assume full-res counts
        )
        fern_tp = tparams.__class__(icp_weight=100.0, min_correspondences=tparams.min_correspondences)
        fern_frame = od.build_frame_pyramid(
            jnp.where(va_s, d_s, 0.0), pp.rgb_to_intensity(rgb_s), None, 0,
            cam_s, fern_cfg, fparams["depth_cutoff"],
        )
        fern_int = pp.rgb_to_intensity(match.fern_rgb)
        fern_valid = match.fern_verts[..., 2] > 0
        fern_model = od.build_model_pyramid(
            match.fern_verts, match.fern_norms, fern_valid, fern_int,
            match.fern_pose, cam_s, fern_cfg,
        )
        fern_res = od.get_incremental_transformation(
            match.fern_pose, fern_frame, fern_model,
            pp.rgb_to_intensity(rgb_s), cam_s, fern_cfg, fern_tp,
        )
        est_pose = fern_res.pose
        photo = fern_ops.photometric_check(
            fern_db, vm_s, rgb_s, est_pose, match.fern_pose, match.fern_rgb,
            cam_s, fparams["depth_cutoff"],
        )
        # inlier thresholds 1400/2400 are for 80x60=4800 probes; scale to res
        npx = cam_s.width * cam_s.height
        icp_thresh = jnp.where(lost, 1400.0, 2400.0) * (npx / 4800.0)
        good = (
            match.found
            & (fern_res.icp_error < fparams["fern_icp_thresh"])
            & (fern_res.icp_count > icp_thresh)
            & (photo < fparams["fern_photo_thresh"])
        )
        # fern match while HEALTHY: candidate for a global deformation
        # (CoFusion.cpp:360-384; constraints sampled at fern probes)
        fern_cand = good & ~lost
        fern_est = est_pose
        fern_src, fern_tgt, fern_ok = fern_ops.sample_constraints(
            fern_db, vm_s, new_pose[0], est_pose, fparams["depth_cutoff"]
        )
        # the matched keyframe's tick: fern-sourced deformation constraints are
        # anchored at the KEYFRAME's srcTime (Deformation.cpp:75-180) so the
        # graph's time-based node association pulls the OLD geometry toward the
        # corrected pose, not the newest nodes
        fern_time = jnp.take(
            fern_db.src_time, jnp.clip(match.keyframe, 0, fern_db.codes.shape[0] - 1)
        ).astype(jnp.float32)

        recover = lost & good
        new_pose = new_pose.at[0].set(jnp.where(recover, est_pose, new_pose[0]))
        lost = lost & ~recover
        unstable_count = jnp.where(recover, 0, unstable_count)
        # fusion is suspended while lost (CoFusion.cpp:463)
        active_fuse = active_fuse & ~lost
    else:
        fern_db = state.fern_db
        lost = state.lost
        unstable_count = state.unstable_count
        fern_cand = jnp.bool_(False)
        fern_est = jnp.eye(4, dtype=jnp.float32)
        fern_src = jnp.zeros((1, 3), jnp.float32)
        fern_tgt = jnp.zeros((1, 3), jnp.float32)
        fern_ok = jnp.zeros((1,), bool)

    # --- local loop closure + deformation (global model; CoFusion.cpp:387-459,
    # gated off by default like the reference's assert(0)-dead path) ---------
    stores_in = models_store
    stables_in = models_stable
    loop_accepted = jnp.bool_(False)
    loop_deformed = jnp.bool_(False)
    pose_history_in = state.pose_history
    if close_loops:
        from cofusion_tpu.ops import deformation as df
        from cofusion_tpu.ops import local_loop as ll

        store0 = jax.tree.map(lambda a: a[0], models_store)
        stable0 = jax.tree.map(lambda a: a[0], models_stable)
        pose0 = new_pose[0]
        conf0 = models.conf_threshold[0]
        # ACTIVE prediction at the POST-tracking pose (the reference refreshes
        # with predict() right before the loop block, CoFusion.cpp:347)
        act = rz.splat_predict(
            store0, pose0, cam, cfg, state.tick, fparams["time_delta"],
            fparams["depth_cutoff"], conf0,
        )
        # INACTIVE render: the union of both tiers' out-of-window surfels (old
        # surfels live in `stable`; active-tier surfels past the window exist
        # only between expel cadences), z-merged into one predicted view
        old_a = rz.splat_predict(
            store0, pose0, cam, cfg, state.tick, fparams["time_delta"],
            fparams["depth_cutoff"], conf0, active_window=False,
        )
        old_s = rz.splat_predict(
            stable0, pose0, cam, cfg, state.tick, fparams["time_delta"],
            fparams["depth_cutoff"], conf0, active_window=False,
        )
        old = rz.splat_merge(old_a, old_s)
        # gates are tuned for 640x480: inlier counts scale with pixel count and
        # the covariance diagonal scales with its inverse (cov ~ 1/N)
        npx_scale = (cam.width * cam.height) / (640.0 * 480.0)
        res_ll = ll.local_loop(
            old, pose0, act, cam, cfg, tparams, state.tick,
            fparams["time_delta"], fparams["depth_cutoff"], conf0,
            fparams["loop_cov_thresh"] / npx_scale, fparams["loop_err_thresh"],
            fparams["loop_count_thresh"] * npx_scale,
        )
        local_accept = res_ll.accepted & ~lost & (res_ll.num_constraints >= 3)
        # constraint source: a healthy fern match takes priority over the local
        # loop (the reference's rawGraph.size()==0 gating, CoFusion.cpp:387) —
        # both feed the SAME deformation optimizer
        is_fern = fern_cand if use_reloc else jnp.bool_(False)
        C = max(res_ll.src.shape[0], fern_src.shape[0])

        def _pad(a):
            n = a.shape[0]
            if n >= C:
                return a
            fill = jnp.zeros((C - n,) + a.shape[1:], a.dtype)
            return jnp.concatenate([a, fill], axis=0)

        cons_src = jnp.where(is_fern, _pad(fern_src), _pad(res_ll.src))
        cons_tgt = jnp.where(is_fern, _pad(fern_tgt), _pad(res_ll.tgt))
        cons_ok = jnp.where(is_fern, _pad(fern_ok), _pad(res_ll.cons_valid))
        est_loop = jnp.where(is_fern, fern_est, res_ll.est_pose)
        loop_accepted = is_fern | local_accept

        def do_deform(operand):
            store, stable, est_pose, hist = operand
            # graph nodes must span the WHOLE map's time range (the reference
            # samples time-sequentially over all surfels, Deformation.cpp:207):
            # stable tier first (old times), then the active tier
            union = sm.concat_stores(stable, store)
            graph = df.sample_graph(union, cfg.deform_nodes)
            # fern constraints anchor at the matched KEYFRAME's srcTime so the
            # time-kNN node association pulls the old geometry; local-loop
            # constraints are current-time (Deformation.cpp:75-180)
            src_times = jnp.where(
                is_fern, fern_time if use_reloc else tickf, tickf
            ) * jnp.ones((C,), jnp.float32)
            graph_opt, err = df.optimize(graph, cons_src, src_times, cons_tgt, cons_ok)
            mce = df.mean_constraint_error(graph_opt, cons_src, src_times, cons_tgt, cons_ok)
            # fern matches take the reference's meanConsError gate
            # (Deformation.cpp:134); local matches apply unconditionally like
            # the reference's !fernMatch branch
            ok = jnp.isfinite(err) & (~is_fern | (mce < 3e-4))
            warped_a = df.apply_to_surfels(graph_opt, store)
            warped_s = df.apply_to_surfels(graph_opt, stable)
            # synthesizeDepth bookkeeping: refresh last-update stamps of surfels
            # agreeing with the deformed model's depth at the corrected pose
            warped_a = df.refresh_timestamps(
                warped_a, est_pose, cam, tick, fparams["depth_cutoff"], conf0
            )
            warped_s = df.refresh_timestamps(
                warped_s, est_pose, cam, tick, fparams["depth_cutoff"], conf0
            )
            # RESURRECTION: stable surfels whose stamps were refreshed are back
            # inside the active window — migrate them to the active tier so
            # tracking and fusion see the revisited geometry again (bounded to
            # one expel block; active-tier overflow drops)
            fresh = warped_s.valid & (warped_s.last_time >= tickf)
            stable_new, blk = sm.expel_split(
                warped_s, warped_s.valid, fresh, cfg.expel_block
            )
            active_new = sm.append(warped_a, blk, blk.valid)
            out_a = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), active_new, store
            )
            out_s = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), stable_new, stable
            )
            # pose-HISTORY correction (applyGraphToPoses,
            # DeformationGraph.cpp:89-116): every camera pose already logged is
            # warped through the optimized graph, so '-ep' exports a trajectory
            # the closure actually healed, not just a corrected final pose.
            # Ring slot j's latest stored tick is (tick-1) - ((tick-2-j) mod
            # cap); unwritten/overwritten slots warp to junk but are never
            # read (materialized_pose_log only reads live, unflushed entries).
            cap_h = cfg.max_log_frames
            j = jnp.arange(cap_h, dtype=jnp.int32)
            hist_t = ((tick - 1) - jnp.mod(tick - 2 - j, cap_h)).astype(jnp.float32)
            hist0_w = df.apply_to_poses(graph_opt, hist[:, 0], hist_t)
            hist_out = jnp.where(
                ok, hist.at[:, 0].set(hist0_w), hist
            )
            return out_a, out_s, ok, hist_out

        def no_deform(operand):
            store, stable, _, hist = operand
            return store, stable, jnp.bool_(False), hist

        # lax.cond: the deformation solve (dense GN over 12*deform_nodes vars +
        # full-map warp + tier exchange) only executes on accepted loop closures
        store0_new, stable0_new, loop_deformed, pose_history_in = jax.lax.cond(
            loop_accepted, do_deform, no_deform,
            (store0, stable0, est_loop, state.pose_history),
        )
        apply_loop = loop_accepted & loop_deformed
        new_pose = new_pose.at[0].set(
            jnp.where(apply_loop, est_loop, new_pose[0])
        )
        stores_in = jax.tree.map(
            lambda all_m, one: all_m.at[0].set(
                jnp.where(apply_loop, one, all_m[0])
            ),
            models_store, store0_new,
        )
        stables_in = jax.tree.map(
            lambda all_m, one: all_m.at[0].set(
                jnp.where(apply_loop, one, all_m[0])
            ),
            models_stable, stable0_new,
        )

    # --- fuse + clean -----------------------------------------------------
    # a just-spawned slot has no meaningful previous pose: treat it as
    # motionless (its velocity fusion weight is the wmult=100 bootstrap)
    prev_pose_eff = jnp.where(is_new_slot[:, None, None], new_pose, models.pose)
    weight = jax.vmap(_fusion_weight)(new_pose, prev_pose_eff, wmult)
    new_stores, new_stables, imap_b = _fuse_clean_all(
        stores_in, stables_in, new_pose, weight, models.model_id,
        models.conf_threshold, active_fuse, model_max_depth, depth, filtered,
        rgb, mask, multi, cam, cfg, tick, fparams,
    )
    # next frame's tracking/segmentation prediction: ONE batched window-splat
    # over the post-fuse renders, conf-gated per model (splat.vert:58)
    pred_new = rz.splat_from_imap(
        imap_b, cam, cfg, conf_threshold=new_conf_threshold
    )

    so3_ref = intensity
    for _ in range(cfg.pyramid_levels - 1):
        so3_ref = pp.pyr_down_gauss(so3_ref)

    new_models = ModelState(
        store=new_stores,
        stable=new_stables,
        pose=new_pose,
        prev_pose=prev_pose_eff,
        conf_threshold=new_conf_threshold,
        max_depth=model_max_depth,
        active=new_active,
        age=jnp.where(is_new_slot, 0, models.age) + new_active.astype(jnp.int32),
        model_id=models.model_id,
        unseen=new_unseen,
        spawn_cooldown=new_cooldown,
    )
    new_state = EngineState(
        models=new_models,
        tick=tick,
        so3_ref=so3_ref,
        icp_error_maps=seg_err_maps,
        prev_rgb=rgb,
        prev_filtered=filtered,
        prev_mask=mask,
        pose_history=pose_history_in.at[(tick - 1) % cfg.max_log_frames].set(new_pose),
        fern_db=fern_db,
        lost=lost,
        unstable_count=unstable_count,
        mask_history=state.mask_history.at[(tick - 1) % cfg.mask_ring_frames].set(
            mask.astype(jnp.uint8)
        ),
        pred=pred_new,
    )
    outputs = FrameOutputs(
        poses=new_pose,
        icp_error=res.icp_error,
        icp_count=res.icp_count,
        rgb_error=res.rgb_error,
        surfel_counts=new_stores.count
        + jnp.minimum(new_stables.count, new_stables.capacity),
        # (tick < 0) is always False at runtime but not foldable at trace
        # time: it forces a DISTINCT output buffer so the host may hold this
        # handle across later donated steps (an aliased copy of the state
        # leaf would be overwritten by the next step's donation)
        active=new_active | (tick < 0),
        spawned=has_new,
        loop_closed=loop_accepted & loop_deformed,
    )
    return new_state, outputs


def _fuse_clean_all(
    stores, stables, new_pose, weight, model_ids, conf_thresholds, active_fuse,
    model_max_depth, depth, filtered, rgb, mask, multi, cam, cfg, tick, fparams,
):
    """Per-model fuse + clean (CoFusion.cpp:463-489: predictIndices -> fuse ->
    predictIndices -> clean for every model), plus the two-tier maintenance
    step: survivors that aged out of the active time window are expelled into
    the append-only stable tier.  Returns (new_active_stores,
    new_stable_stores, post_fuse_imaps) — the stacked (M,...) post-fuse index
    renders double as the source of the NEXT frame's tracking prediction
    (state.pred), so the whole frame performs exactly ONE z-buffer render per
    model (the reference renders three: combinedPredict + fuse's + clean's).
    The clean render is replaced by fu.overlay_imap (pixel-local patch of the
    fuse render — no second z-buffer).

    The model axis is UNROLLED in Python (it is static and small): each
    per-model op then contains only plain 1D scatters/gathers on one model's
    (A,) arrays — the TPU fast path.  A vmap here lowers the scatters to XLA's
    batched forms, measured ~2 orders of magnitude slower.

    OBJECT slots (m > 0) run their whole per-frame pipeline on a STATIC SLICE
    [:object_active_capacity] of the stacked store: per-surfel pass cost is
    per-ROW over the static capacity (live or dead — gathers/scatters at
    ~4-7 ns/row, CLAUDE.md perf model), and an object's surface is a small
    fraction of the background's, so a full-width slice pays ~4x dead rows.
    Correctness rides the existing invariants: every pass reads only the valid
    prefix, appends are bounded by the slice capacity (overflow drops, exactly
    the semantics of a smaller dedicated store), and fresh runs never mark a
    row >= the slice valid (spawn resets clear full-width)."""
    M = int(new_pose.shape[0])
    H, W = cam.height, cam.width
    tickf = tick.astype(jnp.float32)
    td_f = fparams["time_delta"].astype(jnp.float32)
    A = int(stores.px.shape[1])
    A_obj = min(cfg.object_active_capacity, A)

    def slice_model(m: int):
        cap = A if m == 0 else A_obj
        return SurfelStore(
            **{f: getattr(stores, f)[m, :cap] for f in sm.DATA_FIELDS},
            count=jnp.minimum(stores.count[m], cap),
        )

    def fuse_clean_one(op):
        store, pose, w, model_id, conf_threshold, max_d = op
        fs = fu.make_frame_surfels(depth, filtered, rgb, cam, w, max_d)
        mask_ok = (mask == model_id) if multi else jnp.ones(cam.shape, bool)
        imap = rz.predict_indices(
            store, pose, cam, tick, fparams["time_delta"], max_d
        )
        fused, aux = fu.fuse(
            store, fs, depth, imap, mask_ok, pose, cam, cfg, tick, max_d,
            return_aux=True,
        )
        imap2 = fu.overlay_imap(fused, imap, aux, fs, pose, cam, tick)
        cleaned, keep = fu.clean_eval(
            fused, imap2, filtered, mask if multi else None, model_id, pose, cam, cfg,
            tick, fparams["time_delta"], conf_threshold, fparams["outlier_coeff"],
        )
        # age-out migration: surfels past the time window (the clean pass keeps
        # them — copy_unstable.vert:136 immunity — but per-frame passes never
        # need them again) move to the stable tier
        out, blk = sm.expel_split(
            cleaned, keep,
            (cleaned.last_time > 0) & ((tickf - cleaned.last_time) > td_f),
            cfg.expel_block,
        )
        return out, blk, imap2

    def idle_one(op):
        store = op[0]
        z1 = jnp.zeros((H, W), jnp.float32)
        z4 = jnp.zeros((H, W, 4), jnp.float32)
        empty_imap = rz.IndexMap(
            index=jnp.full((H, W), -1, jnp.int32),
            vert_conf=z4, normal_rad=z4, color_time=z4,
            last_time=z1, valid=jnp.zeros((H, W), bool),
        )
        return store, sm.empty_store(cfg.expel_block), empty_imap

    outs, blks, imaps = [], [], []
    for m in range(M):
        op = (
            slice_model(m), new_pose[m], weight[m], model_ids[m],
            conf_thresholds[m], model_max_depth[m],
        )
        # inactive slots skip the whole fuse/clean pipeline at runtime
        out_m, blk_m, imap_m = jax.lax.cond(active_fuse[m], fuse_clean_one, idle_one, op)
        outs.append(out_m)
        blks.append(blk_m)
        imaps.append(imap_m)
    # write the per-model results back into the stacked leaves (static-offset
    # contiguous slice updates; object rows beyond the slice keep their old —
    # never-valid — content)
    leaves = {f: getattr(stores, f) for f in sm.DATA_FIELDS}
    for m, out_m in enumerate(outs):
        for f in sm.DATA_FIELDS:
            leaves[f] = leaves[f].at[m, : (A if m == 0 else A_obj)].set(
                getattr(out_m, f)
            )
    new_stores = SurfelStore(
        **leaves, count=jnp.stack([out_m.count for out_m in outs])
    )
    blks_b = jax.tree.map(lambda *xs: jnp.stack(xs), *blks)
    imap_b = jax.tree.map(lambda *xs: jnp.stack(xs), *imaps)
    return new_stores, _append_expel_blocks(stables, blks_b, cfg), imap_b


def _append_expel_blocks(stables, blks, cfg):
    """Append each model's expel block into its stable tier with contiguous
    dynamic-slice writes (unrolled over the static model axis: a vmapped
    dynamic_update_slice would lower to a scatter over the whole (M, S, ...)
    array — exactly the beyond-VMEM random-access path the two-tier design
    exists to avoid).

    The tier is a RING: `count` is the monotone total-ever-appended cursor and
    the write offset is count mod S.  When the remaining tail is smaller than
    one block the cursor skips to the next S boundary (losing < B tail rows of
    capacity once, keeping every write a static contiguous slice), so on
    overflow the OLDEST stable surfels are overwritten round-robin — not the
    same tail window every frame.  The per-row `valid` mask stays
    authoritative for reads; display code clips `count` to S."""
    M = int(stables.count.shape[0])
    S = int(stables.capacity)
    B = int(cfg.expel_block)
    data_fields = sm.DATA_FIELDS
    leaves = {f: getattr(stables, f) for f in data_fields}
    counts = []
    for m in range(M):
        n_ex = blks.count[m]
        cursor = stables.count[m]
        off_raw = jnp.mod(cursor, S)
        wrap = off_raw + B > S
        base = jnp.where(wrap, cursor - off_raw + S, cursor)
        off = jnp.mod(base, S)
        write = n_ex > 0
        for f in data_fields:
            leaf = leaves[f]
            blk_rows = getattr(blks, f)[m][None]  # (1, B, ...)
            start = (m, off) + (0,) * (leaf.ndim - 2)
            # branchless guard: when nothing is expelled, write the existing
            # window back (reads B rows; keeps the update a contiguous
            # in-place dynamic-slice either way)
            cur = jax.lax.dynamic_slice(leaf, start, (1, B) + leaf.shape[2:])
            rows = jnp.where(
                jnp.reshape(write, (1,) * leaf.ndim), blk_rows, cur
            )
            leaves[f] = jax.lax.dynamic_update_slice(leaf, rows, start)
        counts.append(jnp.where(write, base + n_ex, cursor))
    return SurfelStore(count=jnp.stack(counts), **leaves)


def _step_gt_pose(
    state: EngineState,
    rgb, depth, mask, filtered, intensity, fparams,
    *, cam: CameraConfig, cfg: CoFusionConfig, tick,
):
    """'-p' ground-truth pose branch (CoFusion.cpp:340-343): tracking,
    segmentation, reloc and loop closure are all skipped — the global pose is
    overridden with the provided one and active models fuse/clean at their
    current poses."""
    M = cfg.max_models
    models = state.models
    multi = M > 1
    new_pose = models.pose.at[0].set(fparams["gt_pose"])
    wmult = jnp.full((M,), fparams["weight_multiplier"])
    weight = jax.vmap(_fusion_weight)(new_pose, models.pose, wmult)
    model_max_depth = jnp.full((M,), fparams["depth_cutoff"])
    new_stores, new_stables, imap_b = _fuse_clean_all(
        models.store, models.stable, new_pose, weight, models.model_id,
        models.conf_threshold, models.active, model_max_depth, depth, filtered,
        rgb, mask, multi, cam, cfg, tick, fparams,
    )
    # '-p' skips tracking/segmentation entirely, so nothing consumes the
    # prediction: keep the window-splat off this graph and carry state.pred
    # through unchanged (mixing GT-pose and tracked frames in one run is not a
    # supported mode — the reference's -p path is all-frames too)
    so3_ref = intensity
    for _ in range(cfg.pyramid_levels - 1):
        so3_ref = pp.pyr_down_gauss(so3_ref)
    new_models = models._replace(
        store=new_stores,
        stable=new_stables,
        pose=new_pose,
        prev_pose=models.pose,
        max_depth=model_max_depth,
        age=models.age + models.active.astype(jnp.int32),
        spawn_cooldown=jnp.minimum(models.spawn_cooldown + 1, 10000),
    )
    new_state = EngineState(
        models=new_models,
        tick=tick,
        so3_ref=so3_ref,
        icp_error_maps=jnp.zeros((M,) + cam.shape, jnp.float32),
        prev_rgb=rgb,
        prev_filtered=filtered,
        prev_mask=mask,
        pose_history=state.pose_history.at[(tick - 1) % cfg.max_log_frames].set(new_pose),
        fern_db=state.fern_db,
        lost=state.lost,
        unstable_count=state.unstable_count,
        mask_history=state.mask_history.at[(tick - 1) % cfg.mask_ring_frames].set(
            mask.astype(jnp.uint8)
        ),
        pred=state.pred,
    )
    zm = jnp.zeros((M,), jnp.float32)
    outputs = FrameOutputs(
        poses=new_pose,
        icp_error=zm,
        icp_count=zm,
        rgb_error=zm,
        surfel_counts=new_stores.count
        + jnp.minimum(new_stables.count, new_stables.capacity),
        active=models.active | (tick < 0),  # fresh buffer — see _step
        spawned=jnp.bool_(False),
        loop_closed=jnp.bool_(False),
    )
    return new_state, outputs
