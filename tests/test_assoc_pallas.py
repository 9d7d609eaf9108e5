"""Pallas correspondence kernel vs the jnp reference (interpret mode on CPU).

On real TPU hardware the compiled kernel was validated separately: 100%
label agreement and bitwise-equal distances on 1833x181 points vs 1024
landmarks (see ops/assoc_pallas.py hardware notes).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icm_slam_tpu.ops.assoc_pallas import (nearest_landmark,
                                           nearest_landmark_reference)


@pytest.mark.parametrize("nact", [0, 1, 37, 256])
def test_interpret_matches_reference(nact):
    rng = np.random.default_rng(0)
    T, B, L = 16, 181, 256
    pts = jnp.asarray(rng.normal(0, 10, size=(T, B, 2)), jnp.float32)
    mp = jnp.asarray(rng.normal(0, 10, size=(L, 2)), jnp.float32)
    n = jnp.asarray(nact, jnp.int32)
    lp, dp = nearest_landmark(pts, mp, n, interpret=True)
    lr, dr = nearest_landmark_reference(pts, mp, n)
    if nact == 0:
        # no live landmark: distances must all exceed any gate
        assert float(jnp.min(dp)) > 1e6
        return
    assert float((lp == lr).mean()) == 1.0
    np.testing.assert_allclose(np.asarray(dp), np.asarray(dr), atol=1e-4)


def test_batched_associate_pallas_path_matches():
    """Full batched_associate with the kernel (interpret) == jnp path."""
    from icm_slam_tpu.config import ICMConfig
    from icm_slam_tpu.data.datasets import synthetic_world
    from icm_slam_tpu.solver.icm import prepare, seed_map
    from icm_slam_tpu.solver.sweeps import batched_associate

    ds = synthetic_world(T=48, n_landmarks=8, seed=0)
    base = dict(N=1, L=256, cota=3.0, dtype="float32")
    cfg_j = ICMConfig(**base, use_pallas_assoc=False)
    cfg_p = ICMConfig(**base, use_pallas_assoc=True)
    data = prepare(ds, cfg_j)
    x0 = jnp.asarray(ds.x0, data.dist.dtype)
    seed = seed_map(data, x0, cfg_j)
    x = jnp.asarray(ds.odom, data.dist.dtype)

    import icm_slam_tpu.ops.assoc_pallas as ap
    orig = ap.nearest_landmark

    def interp(pts, mp, nact, interpret=False):
        return orig(pts, mp, nact, interpret=True)

    ap.nearest_landmark = interp
    try:
        lab_p, map_p, matched_p = batched_associate(data, seed, x, cfg_p)
    finally:
        ap.nearest_landmark = orig
    lab_j, map_j, matched_j = batched_associate(data, seed, x, cfg_j)

    np.testing.assert_array_equal(np.asarray(lab_p), np.asarray(lab_j))
    np.testing.assert_allclose(np.asarray(matched_p), np.asarray(matched_j),
                               atol=1e-5)
    assert int(map_p.nact) == int(map_j.nact)
