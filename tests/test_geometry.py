"""Geometry primitives vs the bitwise-verified oracle."""
import numpy as np
import jax.numpy as jnp

from icm_slam_tpu.core import geometry as geo
from tests.oracle import reference_oracle as oracle


def test_wrap_angle_matches_entrepi():
    angles = np.linspace(-10, 10, 401)
    ours = np.asarray(geo.wrap_angle(jnp.asarray(angles)))
    theirs = np.array([oracle.wrap_angle(a) for a in angles])
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_rot2_matches_reference_convention():
    for th in np.linspace(-7, 7, 23):
        np.testing.assert_allclose(np.asarray(geo.rot2(th)),
                                   oracle.rot2(th), atol=1e-12)


def test_unicycle_matches_g():
    rng = np.random.default_rng(0)
    p = oracle.OracleParams()

    class FakeICM:
        def __init__(self):
            self.p = p
        g = oracle.OracleICM.g

    icm = FakeICM()
    for _ in range(20):
        x = rng.normal(size=3)
        u = rng.normal(size=2)
        ours = np.asarray(geo.unicycle_step(jnp.asarray(x), jnp.asarray(u),
                                            p.deltat))
        np.testing.assert_allclose(ours, icm.g(x, u).reshape(3), atol=1e-12)


def test_beams_to_world_matches_tras_rot_z():
    rng = np.random.default_rng(1)
    p = oracle.OracleParams()
    for _ in range(10):
        pose = rng.normal(size=3)
        n = 17
        d = rng.uniform(0.5, 9.0, size=n)
        ang = rng.uniform(0, np.pi, size=n)
        z = np.stack([d, ang, d * np.cos(ang), d * np.sin(ang)], axis=1)
        theirs = oracle.body_to_world(pose, z)
        ours = np.asarray(geo.beams_to_world(jnp.asarray(pose),
                                             jnp.asarray(d), jnp.asarray(ang)))
        np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_beams_to_world_batched():
    rng = np.random.default_rng(2)
    poses = rng.normal(size=(5, 3))
    d = rng.uniform(0.5, 9.0, size=(5, 11))
    ang = rng.uniform(0, np.pi, size=11)
    batched = np.asarray(geo.beams_to_world(jnp.asarray(poses),
                                            jnp.asarray(d), jnp.asarray(ang)))
    for i in range(5):
        single = np.asarray(geo.beams_to_world(jnp.asarray(poses[i]),
                                               jnp.asarray(d[i]),
                                               jnp.asarray(ang)))
        np.testing.assert_allclose(batched[i], single, atol=1e-12)
