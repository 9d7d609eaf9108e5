"""SE(2) / sensor geometry primitives — pure JAX, shape-polymorphic via vmap.

Conventions follow the reference (cited per function), notably the -pi/2
beam-frame offset: beam index 0 points at -90 degrees in the body frame.
"""
from __future__ import annotations

import jax.numpy as jnp


def wrap_angle(a):
    """Wrap angle(s) to (-pi, pi]. Branch-free equivalent of the reference's
    entrepi (ICM_SLAM.py:455-463)."""
    a = jnp.mod(a, 2.0 * jnp.pi)
    return jnp.where(a > jnp.pi, a - 2.0 * jnp.pi, a)


def rot2(theta):
    """Reference 2D rotation convention [[c, s], [-s, c]] (ICM_SLAM.py:482-488).

    Works for scalar or batched theta: returns (..., 2, 2).
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, s], axis=-1)
    row1 = jnp.stack([-s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def unicycle_step(x, u, deltat):
    """Forward unicycle kinematics g(x, u) (ICM_ROS.py:202-207).

    x: (..., 3) pose [px, py, theta]; u: (..., 2) control [v, omega].
    """
    v = u[..., 0]
    w = u[..., 1]
    th = x[..., 2]
    dx = jnp.stack([v * jnp.cos(th), v * jnp.sin(th), w], axis=-1)
    return x + deltat * dx


def beam_angles(n_beams, step_deg=1.0, start_deg=0.0, dtype=jnp.float32):
    """Static per-beam scan-frame angles in radians (index * 1 degree)."""
    idx = jnp.arange(n_beams, dtype=dtype)
    return (start_deg + idx * step_deg) * jnp.pi / 180.0


def beams_to_world(pose, dist, ang):
    """World-frame 2D points of beams (dist, ang) observed from ``pose``.

    Applies the rotation by (theta - pi/2) of the reference's tras_rot_z
    (ICM_SLAM.py:465-480) in polar form (equivalently h's alfa,
    ICM_ROS.py:191-196).

    pose: (..., 3); dist, ang: (..., B). Returns (..., B, 2).
    """
    a = ang + (pose[..., 2:3] - jnp.pi / 2.0)
    offs = dist[..., None] * jnp.stack([jnp.cos(a), jnp.sin(a)], axis=-1)
    return pose[..., None, :2] + offs
