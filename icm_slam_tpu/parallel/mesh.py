"""Device-mesh sharding for the batched ICM sweep.

The parallelization axis is TIME (keyframes) — the reference's trajectory
sweep is the analog of sequence parallelism (SURVEY.md §2.3/§5).  The batched
sweep is expressed in plain jnp ops over (T, ...) arrays, so distribution is
pure GSPMD: shard the T axis of the per-frame arrays across a 1-D mesh and
let XLA insert the collectives —

  * per-frame association / LM solves: fully local per shard,
  * cumulative segment sums over T (running-mean map): associative-scan
    collectives,
  * red-black neighbour reads x[t-1], x[t+1]: halo exchange
    (collective-permute) on the sharded axis,
  * map filtering / reductions: psum into a replicated (L,2) table.

Landmark-table arrays (L, 2) stay replicated — the map is tiny (KBs).
A 1-device mesh runs the identical code path.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TIME_AXIS = "t"


def make_mesh(devices=None, n_devices=None) -> Mesh:
    """1-D mesh over the time axis (first ``n_devices`` of ``devices``)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (TIME_AXIS,))


def time_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(TIME_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_sweep_inputs(mesh: Mesh, data, x, pad_to=None):
    """Place SweepData + poses on the mesh: T-axis sharded, rest replicated.

    Pads T up to a multiple of the mesh size if needed (padded frames are
    all-masked -> empty frames, which the sweep treats as dead-reckoning;
    callers slice the poses back).
    """
    from icm_slam_tpu.solver.sweeps import SweepData
    import jax.numpy as jnp

    n = mesh.devices.size
    T = data.dist.shape[0]
    pad = (-T) % (pad_to or n)
    if pad:
        def pad_t(a, value=0.0):
            cfgw = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, cfgw, constant_values=value)

        data = SweepData(
            dist=pad_t(data.dist), mask=pad_t(data.mask, False),
            ang=data.ang, odom=pad_t(data.odom), u=pad_t(data.u))
        x = jnp.pad(x, [(0, pad), (0, 0)])

    ts = time_sharding(mesh)
    rep = replicated(mesh)
    data = SweepData(
        dist=jax.device_put(data.dist, ts),
        mask=jax.device_put(data.mask, ts),
        ang=jax.device_put(data.ang, rep),
        odom=jax.device_put(data.odom, ts),
        u=jax.device_put(data.u, ts))
    x = jax.device_put(x, ts)
    return data, x, T
