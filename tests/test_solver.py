"""Per-pose LM solver: energies must match the oracle's costs and reach at
least Nelder-Mead quality minima."""
import numpy as np
import jax.numpy as jnp

from icm_slam_tpu.config import ICMConfig
from icm_slam_tpu.core.energy import (PoseProblem, energy,
                                      one_sided_residuals,
                                      two_sided_residuals, weights)
from icm_slam_tpu.solver.gauss_newton import lm_minimize
from tests.oracle import reference_oracle as oracle


def _random_problem(rng, B=24):
    p = oracle.OracleParams()
    icm_o = oracle.OracleICM.__new__(oracle.OracleICM)
    icm_o.p = p

    d = rng.uniform(1.0, 8.0, size=B)
    ang = rng.uniform(0, np.pi, size=B)
    mask = rng.random(B) > 0.3
    matched = rng.normal(0, 5, size=(B, 2))
    x_prev = rng.normal(size=3)
    x_next = x_prev + rng.normal(0, 0.1, size=3)
    u_prev = rng.normal(size=2)
    u_cur = rng.normal(size=2)
    odo = rng.normal(0, 1, size=(3, 3))

    prob = PoseProblem(
        dist=jnp.asarray(d), ang=jnp.asarray(ang), mask=jnp.asarray(mask),
        matched=jnp.asarray(matched), x_prev=jnp.asarray(x_prev),
        u_prev=jnp.asarray(u_prev), odo_prev=jnp.asarray(odo[:, 0]),
        odo_cur=jnp.asarray(odo[:, 1]), x_next=jnp.asarray(x_next),
        u_cur=jnp.asarray(u_cur), odo_next=jnp.asarray(odo[:, 2]))

    z = np.stack([d, ang, d * np.cos(ang), d * np.sin(ang)], 1)[mask]
    mm = matched[mask]
    return icm_o, p, prob, z, mm, x_prev, x_next, u_prev, u_cur, odo


def test_one_sided_energy_matches_fun_x():
    rng = np.random.default_rng(5)
    cfg = ICMConfig()
    w = weights(cfg)
    for _ in range(10):
        icm_o, p, prob, z, mm, x_prev, _, u_prev, _, odo = _random_problem(rng)
        x = x_prev + rng.normal(0, 0.2, size=3)
        ours = float(energy(one_sided_residuals(jnp.asarray(x), prob, w)))
        theirs = icm_o.cost_one_sided(x, z, mm, x_prev, u_prev, odo[:, 0:2])
        np.testing.assert_allclose(ours, theirs, rtol=1e-9)


def test_two_sided_energy_matches_fun_xn():
    rng = np.random.default_rng(6)
    cfg = ICMConfig()
    w = weights(cfg)
    for _ in range(10):
        (icm_o, p, prob, z, mm, x_prev, x_next, u_prev, u_cur,
         odo) = _random_problem(rng)
        x = (x_prev + x_next) / 2 + rng.normal(0, 0.2, size=3)
        ours = float(energy(two_sided_residuals(jnp.asarray(x), prob, w)))
        theirs = icm_o.cost_two_sided(
            x, z, mm, x_prev, x_next,
            np.stack([u_prev, u_cur], 1), odo)
        np.testing.assert_allclose(ours, theirs, rtol=1e-9)


def test_lm_beats_nelder_mead():
    from scipy.optimize import fmin
    rng = np.random.default_rng(7)
    cfg = ICMConfig()
    w = weights(cfg)
    worse = 0
    for _ in range(10):
        icm_o, p, prob, z, mm, x_prev, _, u_prev, _, odo = _random_problem(rng)
        x0 = x_prev + rng.normal(0, 0.05, size=3)

        def f_ours(x):
            return float(energy(one_sided_residuals(jnp.asarray(x), prob, w)))

        x_nm = fmin(f_ours, x0, xtol=0.001, disp=0)
        x_lm = np.asarray(lm_minimize(
            lambda x: one_sided_residuals(x, prob, w), jnp.asarray(x0),
            iters=20))
        # these synthetic problems have huge residuals at the optimum
        # (energy ~800), where GN converges linearly; accept a small
        # relative gap.  On real SLAM costs LM lands far below NM's
        # xtol=1e-3 (covered by the end-to-end golden-trace tests).
        if f_ours(x_lm) > f_ours(x_nm) + 1e-4 * max(1.0, f_ours(x_nm)):
            worse += 1
    assert worse <= 1


def test_lm_exact_on_quadratic():
    A = jnp.asarray(np.diag([2.0, 3.0, 0.5]))
    b = jnp.asarray(np.array([1.0, -2.0, 0.3]))

    def resid(x):
        return A @ x - b

    x = lm_minimize(resid, jnp.zeros(3, jnp.float64), iters=8)
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(np.asarray(A), np.asarray(b)),
                               atol=1e-8)


def test_analytic_jacobians_match_jacfwd():
    """core.energy one/two_sided_jacobian vs autodiff (exactness check)."""
    import jax
    import jax.numpy as jnp
    from icm_slam_tpu.core.energy import (one_sided_jacobian,
                                          two_sided_jacobian)
    rng = np.random.default_rng(11)
    cfg = ICMConfig()
    w = weights(cfg)
    for _ in range(5):
        _, _, prob, *_ = _random_problem(rng)
        x = jnp.asarray(rng.normal(size=3))
        Jf1 = jax.jacfwd(lambda xx: one_sided_residuals(xx, prob, w))(x)
        np.testing.assert_allclose(np.asarray(one_sided_jacobian(x, prob, w)),
                                   np.asarray(Jf1), atol=1e-12)
        Jf2 = jax.jacfwd(lambda xx: two_sided_residuals(xx, prob, w))(x)
        np.testing.assert_allclose(np.asarray(two_sided_jacobian(x, prob, w)),
                                   np.asarray(Jf2), atol=1e-12)
