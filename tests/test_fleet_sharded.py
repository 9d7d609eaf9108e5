"""Fleet-axis sharding: run_batched over a device mesh == unsharded.

Data parallelism over worlds (parallel.mesh.make_fleet_mesh): worlds never
exchange information, so sharding the vmapped world axis partitions the
whole pipeline (init -> filter -> fused refine loop) across devices with
zero collectives.  The 8-virtual-CPU-device mesh (conftest) validates the
partitioned program against the unsharded one.
"""
import numpy as np
import pytest

import jax

from icm_slam_tpu.config import ICMConfig
from icm_slam_tpu.data.datasets import synthetic_world
from icm_slam_tpu.parallel.mesh import (fleet_sharding, make_fleet_mesh,
                                        put_fleet_sharded)
from icm_slam_tpu.solver.icm import run_batched


def _worlds(n, T=220):
    return [synthetic_world(T=T, n_landmarks=20, seed=100 + s)
            for s in range(n)]


def _cfg():
    return ICMConfig(N=2, L=256, cota=8.0, dtype="float32")


def _assert_equal(sharded, unsharded):
    """Same census; init poses bitwise-level; refined poses/map to f32
    partitioning-reorder noise (measured <= 5e-5 over 2 iterations — the
    partitioned program packs vmap lanes differently, and the refine loop
    amplifies the reduction-order ulps; same band as the dryrun witness)."""
    assert len(sharded) == len(unsharded)
    for rs, ru in zip(sharded, unsharded):
        assert rs.map_pos.shape == ru.map_pos.shape   # same census
        # 1e-3, not 5e-4: the sharded program (W/n worlds per device) and
        # the unsharded W-world batch fuse differently, and LM iterations
        # amplify the f32 rounding delta (the multichip dryrun measured a
        # 5.6e-4 element on its fixture after a pure op-reorder change)
        np.testing.assert_allclose(rs.x, ru.x, atol=1e-3)
        np.testing.assert_allclose(rs.x_init, ru.x_init, atol=1e-6)
        np.testing.assert_allclose(rs.map_pos, ru.map_pos, atol=1e-5)


def test_fleet_sharded_matches_unsharded():
    """W divisible by the mesh size: every device gets one world."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_fleet_mesh(devs, 4)
    worlds = _worlds(4)
    cfg = _cfg()
    _assert_equal(run_batched(worlds, cfg, mesh=mesh),
                  run_batched(worlds, cfg))


def test_fleet_sharded_pads_nondivisible():
    """W=3 on a 2-device mesh: the last world is replicated into the pad
    lane and the padded lane's result discarded."""
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_fleet_mesh(devs, 2)
    worlds = _worlds(3, T=180)
    cfg = _cfg()
    sharded = run_batched(worlds, cfg, mesh=mesh)
    assert len(sharded) == 3
    _assert_equal(sharded, run_batched(worlds, cfg))


def test_fleet_inputs_actually_sharded():
    """put_fleet_sharded distributes the leading axis across devices
    (one shard per device, not replication)."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_fleet_mesh(devs, 4)
    import jax.numpy as jnp
    a = put_fleet_sharded(mesh, jnp.zeros((8, 16)))
    assert a.sharding == fleet_sharding(mesh)
    shard_rows = {s.data.shape[0] for s in a.addressable_shards}
    assert shard_rows == {2}      # 8 worlds / 4 devices
