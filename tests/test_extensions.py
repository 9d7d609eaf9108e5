"""User-extensible energy hooks + visualization smoke tests."""
import os
import numpy as np
import jax.numpy as jnp

from icm_slam_tpu.config import ICMConfig
from icm_slam_tpu.core.energy import EnergyModel
from icm_slam_tpu.data.datasets import synthetic_world
from icm_slam_tpu.solver.icm import run


def test_custom_energy_model_changes_solution():
    ds = synthetic_world(T=80, n_landmarks=8, seed=4)

    def heavy_obs_downweight(dist, ang):
        # downweight long-range beams (custom h reweighting)
        return 1.0 / (1.0 + dist)

    def anchor_to_odom(x, prob):
        # extra residual pulling poses toward raw odometry
        return 5.0 * (x[:2] - prob.odo_cur[:2])

    model = EnergyModel(obs_scale=heavy_obs_downweight,
                        extra_one_sided=anchor_to_odom,
                        extra_two_sided=anchor_to_odom)
    base = dict(N=1, L=128, cota=5.0, dtype="float32")
    r_def = run(ds, ICMConfig(**base))
    r_cus = run(ds, ICMConfig(**base, model=model))
    # the hook must actually alter the optimization
    assert np.abs(r_def.x - r_cus.x).max() > 1e-5
    # and the odometry anchor should pull poses toward odometry
    d_def = np.abs(r_def.x[:, :2] - ds.odom[:, :2]).mean()
    d_cus = np.abs(r_cus.x[:, :2] - ds.odom[:, :2]).mean()
    assert d_cus <= d_def + 1e-9


def test_plots_render(tmp_path):
    from icm_slam_tpu.utils.viz import LivePlot, plot_convergence, plot_slam
    x = np.cumsum(np.random.default_rng(0).normal(size=(50, 3)), 0)
    lm = np.random.default_rng(1).normal(size=(5, 2))
    p1 = tmp_path / "slam.png"
    p2 = tmp_path / "conv.png"
    plot_slam(x, lm, odom=x + 0.1, path=str(p1), title="t")
    plot_convergence(np.abs(np.random.default_rng(2).normal(size=(7, 3))),
                     path=str(p2))
    assert p1.exists() and p1.stat().st_size > 1000
    assert p2.exists() and p2.stat().st_size > 1000
    LivePlot().update(x, lm)  # headless no-crash
