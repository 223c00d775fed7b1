"""cofusion_tpu — a TPU-native (JAX/XLA/Pallas) multi-object dense RGB-D SLAM framework.

A ground-up rebuild of the capabilities of Co-Fusion (Rünz & Agapito, ICRA 2017;
reference C++/CUDA/OpenGL implementation surveyed in SURVEY.md): it ingests RGB-D
streams, segments the scene into a static background plus independently moving rigid
objects, tracks the 6-DoF pose of every object with dense joint ICP + photometric
Gauss-Newton odometry, and fuses a confidence-weighted surfel map per object.

Architecture (TPU-first, not a port):
  * one jitted ``process_frame(state, frame) -> (state, outputs)`` — no per-iteration
    host syncs (the reference does ~38 GPU->CPU downloads per model per frame);
  * the model axis is batched and vmapped (the reference loops over models on the host);
  * OpenGL rasterization (index map / surfel splatting) is replaced by a scatter/gather
    z-buffer rasterizer; transform-feedback stream compaction by masked cumsum
    compaction; CUDA warp reductions by MXU-friendly matmul reductions.
"""

__version__ = "0.1.0"

from cofusion_tpu.config import CameraConfig, CoFusionConfig  # noqa: F401
