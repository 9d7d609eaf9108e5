"""Windowed bundle adjustment: joint pose solves over keyframe blocks.

The middle ground between ICM's single-pose coordinate descent and the
full-chain joint solve (models/bundle_adjustment.py): the trajectory is cut
into W-keyframe windows (default 64, BASELINE config 3), each window's poses
are optimized JOINTLY by dense Gauss-Newton with its boundary poses frozen
(the map contribution enters through the same frozen running-mean matched
values as the ICM sweep), and all windows solve in parallel (one vmap).
Two half-sweeps with the second offset by W/2 update the boundaries —
the block analog of red-black Gauss-Seidel; on a sharded time axis each
window is shard-local and the offset sweep provides the halo exchange.

Exposed as sweep_mode="windowed_ba".  Per outer iteration this contracts
the chain W times faster than per-pose sweeps (information propagates a
whole window per pass instead of one frame).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from icm_slam_tpu.core.geometry import rot2, unicycle_step, wrap_angle
from icm_slam_tpu.mapping.landmark_map import MapState
from icm_slam_tpu.solver.sweeps import (SweepData, batched_associate,
                                        compact_data)


def _chain_residuals(xa, xb, u_a, odo_a, odo_b, w):
    """Kinematic + odometry residuals of the edge (a -> b). (6,)-vector."""
    sqrt_r, _, sqrt_odom, deltat = w
    gg = xb - unicycle_step(xa, u_a, deltat)
    gg = gg.at[2].set(wrap_angle(gg[2]))
    r_kin = sqrt_r * gg
    meas = rot2(odo_a[2]) @ (odo_b[:2] - odo_a[:2])
    est = rot2(xa[2]) @ (xb[:2] - xa[:2])
    rth = wrap_angle(odo_b[2] - odo_a[2] - (xb[2] - xa[2]))
    r_odo = sqrt_odom * jnp.concatenate([meas - est, rth[None]])
    return jnp.concatenate([r_kin, r_odo])


def _window_residuals(p, x_prev_fix, x_next_fix, dist, ang, mask, matched,
                      u_in, odo_in, odo_prev, u_last, odo_next, frame_ok,
                      next_ok, w):
    """All residuals owned by one window.

    p: (W, 3) free poses; x_prev_fix: (3,) pose before the window (frozen);
    x_next_fix: (3,) pose after it (frozen); dist/ang/mask/matched: (W, K...)
    compacted observations; u_in/odo_in: (W,...) control/odometry AT window
    frames; odo_prev: (3,) odometry of the frame before; u_last/odo_next:
    the edge to the pose after the window; frame_ok: (W,) validity (frames
    past the real trajectory end contribute nothing); next_ok: scalar bool
    — whether a REAL frame exists after the window.  When the window ends
    exactly at the trajectory's last frame, x_next_fix clamps to that same
    frame's stale value and the forward edge would become a self-edge
    biasing the final pose — next_ok masks it, giving the last pose the
    reference's one-sided treatment (ICM_ROS.py:153-156).
    """
    sqrt_q = w[1]
    W = p.shape[0]

    # observation residuals (same form as core.energy.obs_residuals)
    a = ang + p[:, 2:3] - jnp.pi / 2.0                       # (W, K)
    pts = p[:, None, :2] + dist[..., None] * jnp.concatenate(
        [jnp.cos(a)[..., None], jnp.sin(a)[..., None]], axis=-1)
    r_obs = (pts - matched) * sqrt_q[None, None, :]
    r_obs = jnp.where((mask & frame_ok[:, None])[..., None], r_obs, 0.0)

    # chain edges: (prev -> p0), (p0 -> p1), ..., (p_{W-1} -> next)
    xs_a = jnp.concatenate([x_prev_fix[None], p], axis=0)       # (W+1, 3)
    xs_b = jnp.concatenate([p, x_next_fix[None]], axis=0)
    u_e = jnp.concatenate([u_in, u_last[None]], axis=0)         # (W+1, 2)
    odo_a = jnp.concatenate([odo_prev[None], odo_in], axis=0)
    odo_b = jnp.concatenate([odo_in, odo_next[None]], axis=0)
    edge_ok = jnp.concatenate([frame_ok, (frame_ok[-1] & next_ok)[None]])
    r_chain = jax.vmap(_chain_residuals, in_axes=(0, 0, 0, 0, 0, None))(
        xs_a, xs_b, u_e, odo_a, odo_b, w)
    r_chain = jnp.where(edge_ok[:, None], r_chain, 0.0)

    return jnp.concatenate([r_obs.reshape(-1), r_chain.reshape(-1)])


def _solve_windows(data: SweepData, obs, x, offset, W, last_t, config, w):
    """One parallel pass over windows starting at offset, offset+W, ..."""
    T = x.shape[0]
    dist_c, ang_c, mask_c, matched_c = obs
    n_win = max(1, -(-(T - offset - 1) // W))
    starts = offset + 1 + jnp.arange(n_win) * W  # window begins after pose 0
    dtype = x.dtype
    eye = jnp.eye(3 * W, dtype=dtype)

    def solve_one(s):
        idx = s + jnp.arange(W)
        ok = (idx >= 1) & (idx <= last_t)
        idx_c = jnp.minimum(idx, T - 1)
        p0 = x[idx_c]
        x_prev = x[jnp.maximum(s - 1, 0)]
        x_next = x[jnp.minimum(s + W, T - 1)]
        args = (x_prev, x_next, dist_c[idx_c], ang_c[idx_c], mask_c[idx_c],
                matched_c[idx_c], data.u[idx_c],
                data.odom[idx_c], data.odom[jnp.maximum(s - 1, 0)],
                data.u[jnp.minimum(s + W - 1, T - 1)],
                data.odom[jnp.minimum(s + W, T - 1)], ok,
                (s + W) <= last_t)

        def resid(flat):
            return _window_residuals(flat.reshape(W, 3), *args, w)

        def gn(carry, _):
            flat, lam = carry
            r = resid(flat)
            J = jax.jacfwd(resid)(flat)
            g = J.T @ r
            H = J.T @ J
            delta = jnp.linalg.solve(
                H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-9)) +
                1e-9 * eye, -g)
            new = flat + delta
            better = jnp.sum(resid(new) ** 2) < jnp.sum(r * r)
            flat = jnp.where(better, new, flat)
            lam = jnp.where(better, lam * 0.3, lam * 5.0)
            return (flat, lam), None

        (flat, _), _ = jax.lax.scan(
            gn, (p0.reshape(-1), jnp.asarray(1e-4, dtype)), None,
            length=config.ba_gn_iters)
        return flat.reshape(W, 3), idx_c, ok

    new_p, idxs, oks = jax.vmap(solve_one)(starts)
    upd = jnp.zeros_like(x)
    cnt = jnp.zeros((T, 1), dtype)
    upd = upd.at[idxs.reshape(-1)].add(
        (new_p * oks[..., None]).reshape(-1, 3))
    cnt = cnt.at[idxs.reshape(-1)].add(oks.reshape(-1, 1).astype(dtype))
    return jnp.where(cnt > 0, upd / jnp.maximum(cnt, 1.0), x)


def windowed_ba_refine(data: SweepData, old_map: MapState, x, config, w,
                       window: int = 64, last_t: int | None = None
                       ) -> Tuple[MapState, jnp.ndarray]:
    """One outer iteration: batched association + two offset window passes."""
    T = x.shape[0]
    if last_t is None:
        last_t = T - 1
    # compact beams before association (see solver.sweeps.compact_data)
    cap = config.obs_cap if config.obs_cap else data.dist.shape[1]
    if cap < data.dist.shape[1]:
        data_c = compact_data(data, cap)
    else:
        data_c = data._replace(ang=jnp.broadcast_to(data.ang,
                                                    data.dist.shape))
    _, final_map, matched = batched_associate(data_c, old_map, x, config)
    obs = (data_c.dist, data_c.ang, data_c.mask, matched)
    x = _solve_windows(data, obs, x, 0, window, last_t, config, w)
    x = _solve_windows(data, obs, x, window // 2, window, last_t, config, w)
    # empty frames follow the reference's neighbor average
    empty = ~jnp.any(data.mask, axis=1)
    t_idx = jnp.arange(T)
    avg = (x[jnp.maximum(t_idx - 1, 0)] + x[jnp.minimum(t_idx + 1, T - 1)]) / 2
    sel = empty & (t_idx >= 1) & (t_idx <= last_t)
    x = jnp.where(sel[:, None], avg, x)
    return final_map, x
