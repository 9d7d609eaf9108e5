"""Fused association+sums kernel vs the jnp reference (interpret on CPU).

Contract parity for ops/assoc_sums_pallas.py and end-to-end sweep parity
for the `use_pallas_fused_assoc` opt-in (the integration passes
interpret=True automatically off-TPU).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from icm_slam_tpu.config import ICMConfig
from icm_slam_tpu.data.datasets import synthetic_world
from icm_slam_tpu.ops.assoc_sums_pallas import (associate_and_sums,
                                                associate_and_sums_reference)
from icm_slam_tpu.solver.icm import _refine_jit, prepare, resolve_config, \
    seed_map


@pytest.mark.parametrize("nact", [0, 1, 7, 128])
def test_interpret_matches_reference(nact):
    rng = np.random.default_rng(11)
    T, B, K = 24, 24, 128
    pts = jnp.asarray(rng.uniform(-10, 10, (T, B, 2)), jnp.float32)
    mp = jnp.asarray(rng.uniform(-10, 10, (K, 2)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(T, B)) < 0.7)
    n = jnp.asarray(nact, jnp.int32)
    lab_k, d2_k, sums_k = associate_and_sums(pts, mp, mask, n, 1.0,
                                             interpret=True)
    lab_r, d2_r, sums_r = associate_and_sums_reference(pts, mp, mask, n, 1.0)
    np.testing.assert_array_equal(np.asarray(lab_k), np.asarray(lab_r))
    np.testing.assert_allclose(np.asarray(d2_k), np.asarray(d2_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sums_k), np.asarray(sums_r),
                               atol=1e-4)


def test_fused_sweep_matches_default_path():
    """A full refine sweep with the fused kernel == the XLA path.

    Both run the capped quirk path; the only admissible difference is the
    d^2-form gate at f32 rounding on exactly-borderline beams, which the
    smooth synthetic world does not produce.
    """
    ds = synthetic_world(T=200, n_landmarks=12, seed=7)
    base = dict(N=1, L=256, cota=5.0, map_run_cap=128)
    cfg_x = ICMConfig(**base)
    cfg_f = ICMConfig(**base, use_pallas_fused_assoc=True)
    data = prepare(ds, cfg_x)
    cfg_x = resolve_config(cfg_x, data)
    cfg_f = resolve_config(cfg_f, data)
    assert cfg_x.map_run_cap == cfg_f.map_run_cap
    x0 = jnp.asarray(ds.x0, data.dist.dtype)
    seed = seed_map(data, x0, cfg_x)
    x = jnp.asarray(ds.odom, data.dist.dtype)
    m_x, x_x, w_x = _refine_jit(data, seed, x, cfg_x)
    m_f, x_f, w_f = _refine_jit(data, seed, x, cfg_f)
    np.testing.assert_array_equal(np.asarray(w_x), np.asarray(w_f))
    assert int(m_x.nact) == int(m_f.nact)
    np.testing.assert_allclose(np.asarray(m_x.pos), np.asarray(m_f.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_x), np.asarray(x_f), atol=1e-4)
