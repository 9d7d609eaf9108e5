"""Custom energy hooks — the reference's example.py subclass mechanism.

    python examples/03_custom_potentials.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from icm_slam_tpu import ICMConfig
from icm_slam_tpu.core.energy import EnergyModel
from icm_slam_tpu.data.datasets import load
from icm_slam_tpu.solver.icm import run


def range_weighted_h(dist, ang):
    """Downweight long-range beams (sensor noise grows with distance)."""
    return 1.0 / (1.0 + 0.1 * dist)


def soft_odometry_anchor(x, prob):
    """Extra residual pulling each pose toward raw odometry."""
    return 0.5 * (x[:2] - prob.odo_cur[:2])


model = EnergyModel(obs_scale=range_weighted_h,
                    extra_one_sided=soft_odometry_anchor,
                    extra_two_sided=soft_odometry_anchor)

ds = load("ijac2018").slice(600)
res = run(ds, ICMConfig(N=5, model=model), verbose=True)
print(f"custom-model run: {res.map_pos.shape[0]} landmarks")
