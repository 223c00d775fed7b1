"""Multi-chip scaling: device meshes and sharding layouts for the engine state.

The reference is single-GPU (SURVEY.md §2.9 — no NCCL/MPI anywhere); this package
is the TPU-native scaling story it never had: shard the surfel axis and image
rows over a `jax.sharding.Mesh` and let XLA insert the ICI collectives.
"""

from cofusion_tpu.parallel.mesh import make_mesh, shard_engine_state, shard_frame  # noqa: F401
