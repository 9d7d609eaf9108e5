"""Pose-graph optimization with loop closures on a synthetic drifting loop.

    python examples/04_pose_graph_loop_closure.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from icm_slam_tpu.models.pose_graph import (from_trajectory, optimize,
                                            relative_se2)
from icm_slam_tpu.utils.metrics import ate

T = 400
rng = np.random.default_rng(0)
th = np.linspace(0, 2 * np.pi, T)
gt = np.stack([12 * np.cos(th), 12 * np.sin(th), th + np.pi / 2], 1)
est = gt + np.cumsum(rng.normal(0, [0.01, 0.01, 0.001], (T, 3)), 0)

odom_rel = np.asarray(relative_se2(jnp.asarray(gt[:-1]), jnp.asarray(gt[1:])))
loops = np.array([[0, T - 1], [50, T - 50]])
loop_rel = np.asarray(relative_se2(jnp.asarray(gt[loops[:, 0]]),
                                   jnp.asarray(gt[loops[:, 1]])))

g = from_trajectory(jnp.asarray(est), odom_rel_noise=jnp.asarray(odom_rel),
                    loop_pairs=loops, loop_rel=loop_rel)
x_opt, norms = optimize(g, gn_iters=12, cg_iters=250)
print("ATE before:", ate(est, gt, align=True)["mean"])
print("ATE after :", ate(np.asarray(x_opt), gt, align=True)["mean"])
print("residual norm:", float(norms[0]), "->", float(norms[-1]))
