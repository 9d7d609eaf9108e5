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


def test_full_potential_replacement_hooks():
    """The reference's subclass power: REPLACE h / fun_x / fun_xn wholesale
    (example.py:13-35) — not just rescale or append."""
    import jax.numpy as jnp
    from icm_slam_tpu.core.energy import (DEFAULT_MODEL, one_sided_residuals,
                                          two_sided_residuals)

    ds = synthetic_world(T=80, n_landmarks=8, seed=4)
    base = dict(N=1, L=128, cota=5.0, dtype="float32")

    # 1) a pass-through replacement must reproduce the default (atol: a
    # custom two_sided cannot statically be known to keep the default
    # [forward, backward] stacking, so the sweep runs the last frame as the
    # legacy separate one-sided chain instead of the folded in-batch solve
    # — f32 reduction-order noise at the last frames, see
    # sweeps._solve_two_at; the trajectories are otherwise identical)
    ident = EnergyModel(
        one_sided=lambda x, p, w: one_sided_residuals(x, p, w, DEFAULT_MODEL),
        two_sided=lambda x, p, w: two_sided_residuals(x, p, w, DEFAULT_MODEL))
    r_def = run(ds, ICMConfig(**base))
    r_id = run(ds, ICMConfig(**base, model=ident, init_mode="sequential"))
    r_def_seq = run(ds, ICMConfig(**base, init_mode="sequential"))
    np.testing.assert_allclose(r_id.x, r_def_seq.x, atol=2e-4)

    # 2) a structurally different observation model (robust soft-gated h)
    def robust_obs(x, p, sqrt_q):
        a = p.ang + x[2] - jnp.pi / 2.0
        pts = x[:2][None, :] + p.dist[:, None] * jnp.stack(
            [jnp.cos(a), jnp.sin(a)], axis=-1)
        r = (pts - p.matched) * sqrt_q[None, :]
        # Geman-McClure-style soft gate: bounded influence of outliers
        n2 = jnp.sum(r * r, axis=-1, keepdims=True)
        r = r / jnp.sqrt(1.0 + n2)
        return jnp.where(p.mask[:, None], r, 0.0)

    r_rob = run(ds, ICMConfig(**base, model=EnergyModel(obs_model=robust_obs)))
    assert np.abs(r_rob.x - r_def.x).max() > 1e-5
    assert np.isfinite(r_rob.x).all()

    # 3) a fully custom fun_x (odometry-increment-only cost, no landmarks)
    def odom_only(x, p, w):
        sqrt_r, _, sqrt_odom, deltat = w
        gg = x - DEFAULT_MODEL.kinematics(p.x_prev, p.u_prev, deltat)
        return sqrt_r * gg

    r_odo = run(ds, ICMConfig(**base, model=EnergyModel(one_sided=odom_only),
                              sweep_mode="sequential"))
    assert np.isfinite(r_odo.x).all()
    assert np.abs(r_odo.x - r_def_seq.x).max() > 1e-5


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
