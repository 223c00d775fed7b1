"""Model-state containers: per-object surfel maps and the batched model axis."""
