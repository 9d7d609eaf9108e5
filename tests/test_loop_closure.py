"""Loop-closure detection (scan ICP) + pose-graph correction, and exports."""
import numpy as np
import jax.numpy as jnp
import pytest

from icm_slam_tpu.config import ICMConfig
from icm_slam_tpu.data.datasets import synthetic_world
from icm_slam_tpu.models.loop_closure import close_loops, detect, icp_register
from icm_slam_tpu.solver.icm import prepare


def test_icp_register_recovers_known_transform():
    rng = np.random.default_rng(0)
    B = 64
    pts_i = jnp.asarray(rng.uniform(-4, 4, (B, 2)), jnp.float32)
    mask = jnp.ones(B, bool)
    # true relative pose of j in i
    rel = jnp.asarray([0.4, -0.3, 0.2], jnp.float32)
    c, s = np.cos(-0.2), np.sin(-0.2)
    # j's body points = inverse transform of i's points
    pi = np.asarray(pts_i)
    shifted = pi - np.array([0.4, -0.3])
    pts_j = jnp.asarray(np.stack([c * shifted[:, 0] - s * shifted[:, 1],
                                  s * shifted[:, 0] + c * shifted[:, 1]], 1),
                        jnp.float32)
    rel0 = jnp.asarray([0.3, -0.2, 0.1], jnp.float32)  # perturbed init
    est, frac, rms = icp_register(pts_i, mask, pts_j, mask, rel0)
    np.testing.assert_allclose(np.asarray(est), np.asarray(rel), atol=1e-3)
    assert float(frac) > 0.95 and float(rms) < 1e-3


@pytest.fixture(scope="module")
def loop_world():
    ds = synthetic_world(T=500, n_landmarks=25, seed=7, loop=True)
    cfg = ICMConfig(L=128, cota=10.0, dtype="float32")
    data = prepare(ds, cfg)
    return ds, cfg, data


def test_detect_finds_closures_on_loop(loop_world):
    ds, cfg, data = loop_world
    x = jnp.asarray(ds.odom, data.dist.dtype)
    cl = detect(data, x, min_gap=150, radius=3.0)
    assert cl.pairs.shape[0] >= 1
    assert (cl.pairs[:, 1] - cl.pairs[:, 0] > 150).all()
    assert (cl.inliers >= 0.5).all()


def test_close_loops_reduces_drift(loop_world):
    ds, cfg, data = loop_world
    # corrupt the trajectory estimate with smooth drift; odometry (the
    # chain measurement source) stays clean
    T = ds.T
    drift = np.zeros((T, 3))
    drift[:, 0] = np.linspace(0, 0.8, T)
    drift[:, 1] = np.linspace(0, -0.5, T)
    x_bad = jnp.asarray(ds.odom + drift, data.dist.dtype)
    x_fix, cl = close_loops(data, x_bad, cfg, min_gap=150, radius=3.0)
    assert cl.pairs.shape[0] >= 1
    err_before = np.sqrt(((np.asarray(x_bad)[:, :2] - ds.odom[:, :2]) ** 2
                          ).sum(1)).mean()
    err_after = np.sqrt(((np.asarray(x_fix)[:, :2] - ds.odom[:, :2]) ** 2
                         ).sum(1)).mean()
    assert err_after < err_before * 0.5, (err_before, err_after)


def test_exports(tmp_path):
    from icm_slam_tpu.utils.export import (load_trajectory_tum, save_map_pgm,
                                           save_trajectory_tum)
    rng = np.random.default_rng(1)
    x = np.cumsum(rng.normal(0, 0.1, (200, 3)), 0)
    lm = rng.uniform(-5, 5, (9, 2))
    pgm, yml = save_map_pgm(str(tmp_path / "map.pgm"), lm, trajectory=x)
    data = open(pgm, "rb").read()
    assert data.startswith(b"P5") and len(data) > 5000
    assert "resolution" in open(yml).read()

    tum = save_trajectory_tum(str(tmp_path / "traj.txt"), x)
    x2 = load_trajectory_tum(tum)
    np.testing.assert_allclose(x2[:, :2], x[:, :2], atol=1e-5)
    dyaw = np.abs(np.mod(x2[:, 2] - x[:, 2] + np.pi, 2 * np.pi) - np.pi)
    np.testing.assert_allclose(dyaw, 0, atol=1e-5)


def test_iterated_rounds_on_real_drift():
    """Two-lap world, odometry integrated from biased controls (real drift):
    iterated detect->correct rounds verify closures and cut ATE vs truth.
    Mirrors benchmarks/loop_closure_eval.py at test scale."""
    from icm_slam_tpu.models.loop_closure import close_loops
    from icm_slam_tpu.data.datasets import drifted_world

    drifted, x_true, _ = drifted_world(T=600, n_landmarks=90,
                                       world_size=35.0, seed=5,
                                       w_bias=0.004, laps=2)
    cfg = ICMConfig(L=256, cota=10.0, dtype="float32")
    data = prepare(drifted, cfg)
    x0 = jnp.asarray(drifted.odom, data.dist.dtype)

    def ate(x):
        return float(np.mean(np.linalg.norm(
            np.asarray(x)[:, :2] - x_true[:, :2], axis=1)))

    x_fix, cl = close_loops(data, x0, cfg, min_gap=120, radius=5.0,
                            icp_coarse_gate=4.0, gn_iters=15, cg_iters=300,
                            rounds=2)
    assert cl.pairs.shape[0] >= 3
    assert ate(x_fix) < 0.6 * ate(x0), (ate(x0), ate(x_fix))


def test_regime_guard_noops_at_low_drift(loop_world):
    """VERDICT r3 #4: applying closures to an already-good estimate used to
    regress it (measured 0.064 -> 0.21-0.26 m) — the guard must no-op and
    report the decision instead."""
    ds, cfg, data = loop_world
    T = ds.T
    drift = np.zeros((T, 3))
    drift[:, 0] = np.linspace(0, 0.05, T)   # 5 cm total: below closure noise
    x_good = jnp.asarray(ds.odom + drift, data.dist.dtype)
    rep = {}
    x_fix, cl = close_loops(data, x_good, cfg, min_gap=150, radius=3.0,
                            report=rep)
    assert rep["rounds"], rep
    assert rep["rounds"][0]["applied"] is False
    # the no-op returns the estimate UNCHANGED (bitwise)
    np.testing.assert_array_equal(np.asarray(x_fix), np.asarray(x_good))
    # the detected (unapplied) closures are still surfaced for inspection
    assert cl.pairs.shape[0] >= 1


def test_regime_guard_applies_at_high_drift(loop_world):
    """The guard must NOT block the high-drift regime the existing
    reduces-drift test measures — same setup, assert the report says
    applied."""
    ds, cfg, data = loop_world
    T = ds.T
    drift = np.zeros((T, 3))
    drift[:, 0] = np.linspace(0, 0.8, T)
    drift[:, 1] = np.linspace(0, -0.5, T)
    x_bad = jnp.asarray(ds.odom + drift, data.dist.dtype)
    rep = {}
    x_fix, cl = close_loops(data, x_bad, cfg, min_gap=150, radius=3.0,
                            report=rep)
    assert rep["rounds"][0]["applied"] is True, rep
    assert not np.array_equal(np.asarray(x_fix), np.asarray(x_bad))
