"""Multi-chip sharding: the full engine step must compile and run with the surfel
axis and image rows sharded over an 8-device mesh (virtual CPU devices)."""

import jax
import numpy as np
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sharded_step_runs():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # raises on failure


def test_mesh_helpers():
    from cofusion_tpu.parallel import make_mesh, shard_frame

    n = min(len(jax.devices()), 8)
    mesh = make_mesh(n)
    import jax.numpy as jnp

    x = jnp.zeros((128, 160))
    xs = shard_frame(mesh, x)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("d")
