"""Randomized engine-vs-oracle parity on synthetic worlds.

The golden-trace tests pin the two real datasets; this fuzz extends the
oracle comparison to structurally different random worlds (sparser
landmarks, loop trajectories, low cota — regimes where the real datasets
never exercise e.g. the no-prune filter path, which hid an oracle fixture
bug until this fuzz found it).

Gates are empirical (probed over seeds 0-4): trajectory ATE vs the oracle
stays an order of magnitude under the 0.1 m target, and the landmark
census matches within one borderline duplicate-merge (seed 1's engine
merges one pair the oracle keeps apart — the same ATE-level tolerance
class as the Nelder-Mead -> LM swap, docs/PARITY.md).
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0] + "/oracle")

from icm_slam_tpu.config import ICMConfig
from icm_slam_tpu.data.datasets import Dataset, synthetic_world
from icm_slam_tpu.solver.icm import run


@pytest.mark.slow
def test_sequential_mode_census_exact_where_batched_differs():
    """Fidelity mode on the borderline world (seed 1): census EXACT.

    Seed 1 is where the batched red-black sweep merges one landmark pair
    the oracle keeps apart; the sequential mode reproduces the oracle's
    update order and must keep the census exact (ATE probed 0.021) —
    pinning the batched diff to update ORDER, not a semantics bug.
    """
    from reference_oracle import OracleParams, run_pipeline

    ds = synthetic_world(T=150, n_landmarks=10, seed=1)
    p = OracleParams(N=3, L=256, cota=5.0)
    scans_o = np.minimum(np.asarray(ds.scans) + p.radio, p.rango_laser_max)
    out = run_pipeline(scans_o.T.copy(), np.asarray(ds.odom).T.copy(),
                       np.asarray(ds.u).T.copy(), p, verbose=False)
    ds_e = Dataset(ds.scans, ds.odom, ds.u, np.asarray(ds.odom)[0].copy(),
                   name="fuzz")
    res = run(ds_e, ICMConfig(N=3, L=256, cota=5.0,
                              sweep_mode="sequential"))
    assert res.map_pos.shape[0] == out["map"].shape[1]
    ate = float(np.mean(np.linalg.norm(
        res.x[:, :2] - out["x"].T[:, :2], axis=1)))
    assert ate < 0.05, ate


@pytest.mark.slow
@pytest.mark.parametrize("seed,census_exact", [(0, True), (1, False),
                                               (4, True)])
def test_random_world_matches_oracle(seed, census_exact):
    from reference_oracle import OracleParams, run_pipeline

    ds = synthetic_world(T=150, n_landmarks=10, seed=seed)
    p = OracleParams(N=3, L=256, cota=5.0)
    # the engine's prepare() applies the +radio/clip ingest step; the
    # oracle expects it pre-applied (tools/make_golden.py convention)
    scans_o = np.minimum(np.asarray(ds.scans) + p.radio, p.rango_laser_max)
    out = run_pipeline(scans_o.T.copy(), np.asarray(ds.odom).T.copy(),
                       np.asarray(ds.u).T.copy(), p, verbose=False)

    # reference convention: x0 = first odometry column (ICM_ROS.py:57)
    ds_e = Dataset(ds.scans, ds.odom, ds.u, np.asarray(ds.odom)[0].copy(),
                   name="fuzz")
    res = run(ds_e, ICMConfig(N=3, L=256, cota=5.0))

    ate = float(np.mean(np.linalg.norm(
        res.x[:, :2] - out["x"].T[:, :2], axis=1)))
    assert ate < 0.1, ate
    diff = res.map_pos.shape[0] - out["map"].shape[1]
    if census_exact:
        assert diff == 0, (res.map_pos.shape[0], out["map"].shape[1])
    else:
        assert abs(diff) <= 1, (res.map_pos.shape[0], out["map"].shape[1])
