"""Device-side compute ops (JAX/XLA/Pallas) — the TPU equivalents of the reference's
CUDA kernels (Core/Cuda/), GLSL shaders (Core/Shaders/), and hot CPU loops."""
