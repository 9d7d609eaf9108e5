"""Multi-device sharding: the sharded batched sweep must equal 1-device."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icm_slam_tpu.config import ICMConfig
from icm_slam_tpu.core.energy import weights
from icm_slam_tpu.data.datasets import synthetic_world
from icm_slam_tpu.mapping.landmark_map import filter_map
from icm_slam_tpu.parallel.mesh import (make_mesh, replicated,
                                        shard_sweep_inputs, time_sharding)
from icm_slam_tpu.solver.icm import prepare, seed_map
from icm_slam_tpu.solver.sweeps import refine_sweep_batched

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _setup(T=67):
    config = ICMConfig(N=1, L=64, cota=3.0, dtype="float32",
                       pose_gn_iters=4, pose_passes=1)
    ds = synthetic_world(T=T, n_landmarks=8, seed=0)
    data = prepare(ds, config)
    x0 = jnp.asarray(ds.x0, data.dist.dtype)
    seed = seed_map(data, x0, config)
    x = jnp.asarray(ds.odom, data.dist.dtype)
    return config, data, seed, x


def test_sharded_equals_single_device():
    config, data, seed, x = _setup()
    w = weights(config)
    T = x.shape[0]

    # single device reference
    state1, x1 = refine_sweep_batched(data, seed, x, config, w)
    fm1 = filter_map(state1, config.cota, config.dist_thr)

    # 8-device sharded (T=67 not divisible by 8 -> exercises padding)
    mesh = make_mesh(n_devices=8)
    data_s, x_s, true_T = shard_sweep_inputs(mesh, data, x)
    seed_s = jax.device_put(seed, replicated(mesh))
    ts, rep = time_sharding(mesh), replicated(mesh)

    @jax.jit
    def step(d, m, xx):
        st, xx = refine_sweep_batched(d, m, xx, config, w, last_t=true_T - 1)
        xx = jax.lax.with_sharding_constraint(xx, ts)
        fm = jax.tree.map(lambda a: jax.lax.with_sharding_constraint(a, rep),
                          filter_map(st, config.cota, config.dist_thr))
        return fm, xx

    fm8, x8 = step(data_s, seed_s, x_s)

    # sharded cumsum/collectives reorder f32 reductions: allow tiny noise
    np.testing.assert_allclose(np.asarray(x8)[:T], np.asarray(x1),
                               atol=5e-4)
    assert int(fm8.nact) == int(fm1.nact)
    n = int(fm1.nact)
    np.testing.assert_allclose(np.asarray(fm8.pos[:n]),
                               np.asarray(fm1.pos[:n]), atol=5e-4)


def test_mesh_padding_roundtrip():
    config, data, seed, x = _setup(T=61)
    mesh = make_mesh(n_devices=8)
    data_s, x_s, true_T = shard_sweep_inputs(mesh, data, x)
    assert true_T == 61
    assert data_s.dist.shape[0] % 8 == 0
    # padded frames are all-masked (treated as empty frames)
    assert not bool(np.asarray(data_s.mask)[61:].any())
