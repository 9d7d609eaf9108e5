"""Per-pose energy terms as weighted least-squares residuals.

The reference minimizes two scalar costs per pose with Nelder-Mead:
one-sided fun_x (ICM_ROS.py:262-278) for the causal sweep / last frame, and
the symmetric two-sided fun_xn (ICM_ROS.py:220-252) for interior poses of the
refinement sweep.  Both are sums of squares, so here they are expressed as
*residual vectors* r(x) with the property  energy(x) == sum(r(x)**2)  — the
form a Gauss-Newton / Levenberg-Marquardt solver consumes directly.

Terms (weights folded in as square roots):
  kinematic   sqrt(R) * wrap(x - g(x_prev, u_prev))
  observation sqrt(Q) * mask * (world_point(x, beam) - matched_landmark)
  odometry    sqrt(cte_odom) * relative-displacement residual (Eq.16 form)

Observation residuals are masked fixed-shape (B beams); masked-out beams
contribute exact zeros, matching the reference's variable-length sums.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from icm_slam_tpu.core.geometry import rot2, unicycle_step, wrap_angle


class PoseProblem(NamedTuple):
    """Data defining one pose's local cost (all fixed-shape, batchable).

    For the one-sided cost, the *_next fields are ignored (pass zeros).
    """
    dist: jnp.ndarray      # (B,) filtered beam ranges
    ang: jnp.ndarray       # (B,) beam angles [rad]
    mask: jnp.ndarray      # (B,) informative-beam mask
    matched: jnp.ndarray   # (B, 2) associated landmark positions
    x_prev: jnp.ndarray    # (3,)
    u_prev: jnp.ndarray    # (2,) control at t-1
    odo_prev: jnp.ndarray  # (3,) odometry at t-1
    odo_cur: jnp.ndarray   # (3,) odometry at t
    x_next: jnp.ndarray    # (3,)
    u_cur: jnp.ndarray     # (2,) control at t
    odo_next: jnp.ndarray  # (3,) odometry at t+1


def _odo_residual(th_anchor, odo0, odo1, dxy, dth):
    """Relative-displacement odometry residual (ICM_ROS.py:272-277).

    rot2(odo0_theta) @ (odo1_xy - odo0_xy) - rot2(th_anchor) @ dxy, plus the
    wrapped heading increment mismatch.
    """
    rxy = (rot2(odo0[2]) @ (odo1[:2] - odo0[:2])) - (rot2(th_anchor) @ dxy)
    rth = wrap_angle(odo1[2] - odo0[2] - dth)
    return jnp.concatenate([rxy, rth[None]])


def obs_residuals(x, p: PoseProblem, sqrt_q):
    """(B, 2) masked observation residuals (h potential, ICM_ROS.py:171-200)."""
    a = p.ang + x[2] - jnp.pi / 2.0
    pts = x[:2][None, :] + p.dist[:, None] * jnp.stack(
        [jnp.cos(a), jnp.sin(a)], axis=-1)
    r = (pts - p.matched) * sqrt_q[None, :]
    return jnp.where(p.mask[:, None], r, 0.0)


def one_sided_residuals(x, p: PoseProblem, w):
    """Residuals of fun_x (ICM_ROS.py:262-278). w = (sqrt_r, sqrt_q, sqrt_odom)."""
    sqrt_r, sqrt_q, sqrt_odom, deltat = w
    gg = x - unicycle_step(p.x_prev, p.u_prev, deltat)
    gg = gg.at[2].set(wrap_angle(gg[2]))
    r_kin = sqrt_r * gg
    r_obs = obs_residuals(x, p, sqrt_q)
    r_odo = sqrt_odom * _odo_residual(
        p.x_prev[2], p.odo_prev, p.odo_cur, x[:2] - p.x_prev[:2],
        x[2] - p.x_prev[2])
    return jnp.concatenate([r_kin, r_obs.reshape(-1), r_odo])


def two_sided_residuals(x, p: PoseProblem, w):
    """Residuals of fun_xn (ICM_ROS.py:220-252): forward + backward terms."""
    sqrt_r, sqrt_q, sqrt_odom, deltat = w
    ggf = unicycle_step(x, p.u_cur, deltat) - p.x_next
    ggf = ggf.at[2].set(wrap_angle(ggf[2]))
    r_kinf = sqrt_r * ggf
    r_odof = sqrt_odom * _odo_residual(
        x[2], p.odo_cur, p.odo_next, p.x_next[:2] - x[:2],
        p.x_next[2] - x[2])
    return jnp.concatenate(
        [r_kinf, r_odof, one_sided_residuals(x, p, w)])


def weights(config):
    """Precompute sqrt weights tuple from an ICMConfig."""
    dtype = jnp.dtype(config.dtype)
    sqrt_r = jnp.sqrt(jnp.asarray(config.R, dtype))
    sqrt_q = jnp.sqrt(jnp.asarray(config.Q, dtype))
    sqrt_odom = jnp.sqrt(jnp.asarray(config.cte_odom, dtype))
    return sqrt_r, sqrt_q, sqrt_odom, config.deltat


def energy(residuals):
    return jnp.sum(residuals * residuals)
