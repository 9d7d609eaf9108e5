"""Joint pose+landmark Gauss-Newton with Schur complement ("full-chain BA").

The ICM sweeps minimize the MRF energy by coordinate descent (poses one at a
time, map by closed-form means).  This backend minimizes the SAME global
energy

    E(x, y) = sum_t |x_t - g(x_{t-1}, u)|_R^2 + cte |odo residual_t|^2
            + sum_{t,b} mask |world(x_t, beam) - y_{label(t,b)}|_Q^2

JOINTLY over all poses x (T,3) and landmarks y (L,2) with Gauss-Newton —
quadratic convergence near the fixed point instead of ICM's linear sweeps.

TPU-native structure (the BASELINE "distributed BA via Schur-complement
reduction" design):

* associations are frozen per outer iteration (same batched labels as the
  ICM sweep, including the one-new-landmark-per-frame reference quirk);
* the landmark block H_yy is EXACTLY diagonal: the observation residual is
  linear in y with Jacobian -sqrt(Q), so H_yy[l] = Q * count_l — its inverse
  is elementwise (the "blocked Schur reduction" collapses to a segment-sum,
  which psum-distributes over time shards for free);
* the reduced pose system  S dx = -(g_x - H_xy H_yy^-1 g_y)  is solved
  MATRIX-FREE with PCG: S v = J_x^T J_x v - J_x^T J_y H_yy^-1 J_y^T J_x v,
  each product one jvp/vjp of the stacked residual map — no Jacobian or
  Schur matrix is ever materialized;
* the PCG is block-Jacobi preconditioned: the residual graph is banded in
  t, so a 2-coloring extracts the EXACT per-pose 3x3 diagonal blocks of
  J_x^T J_x with 6 Hessian products; 12 preconditioned iterations match 60
  unpreconditioned ones bit-for-quality (full-depth ATE 0.0911 vs 0.0912);
* dy back-substitutes in closed form.

Everything is jnp over (T,...)/(L,...) arrays — the same time-axis GSPMD
sharding as the ICM sweep distributes it.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from icm_slam_tpu.core.geometry import (beams_to_world, rot2, unicycle_step,
                                        wrap_angle)
from icm_slam_tpu.mapping.landmark_map import MapState
from icm_slam_tpu.solver.sweeps import SweepData, batched_associate


class BAProblem(NamedTuple):
    """Fixed association + (optionally beam-compacted) observation arrays.

    dist/ang/labels/obs_w are (T, K) with K = obs_cap (or B uncompacted);
    compaction is exact when K >= the max per-frame valid-beam count.
    """
    data: SweepData
    dist: jnp.ndarray        # (T, K) beam ranges feeding the obs term
    ang: jnp.ndarray         # (T, K) beam angles
    labels: jnp.ndarray      # (T, K) int32 in [0, L]; L = discard
    obs_w: jnp.ndarray       # (T, K) 0/1 observation weights
    counts: jnp.ndarray      # (L,) per-landmark observation counts
    live: jnp.ndarray        # (L,) live-landmark mask (counts > 0)


def _residuals(x, y, p: BAProblem, w):
    """Stacked residuals: (obs (T,K,2), kin (T-1,3), odo (T-1,3))."""
    sqrt_r, sqrt_q, sqrt_odom, deltat = w
    data = p.data
    T = x.shape[0]
    L = y.shape[0]

    # observations: world points minus matched landmarks (linear in y)
    pts = beams_to_world(x, p.dist, p.ang)                   # (T, K, 2)
    matched = y[jnp.clip(p.labels, 0, L - 1)]                # (T, K, 2)
    r_obs = (pts - matched) * sqrt_q[None, None, :] * p.obs_w[..., None]

    # kinematic chain (one-sided form: the global MRF energy)
    pred = unicycle_step(x[:-1], data.u[:-1], deltat)        # (T-1, 3)
    gg = x[1:] - pred
    gg = gg.at[:, 2].set(wrap_angle(gg[:, 2]))
    r_kin = gg * sqrt_r[None, :]

    # odometry relative-displacement residuals
    odo0, odo1 = data.odom[:-1], data.odom[1:]
    R0 = rot2(odo0[:, 2])                                    # (T-1, 2, 2)
    Ra = rot2(x[:-1, 2])
    meas = jnp.einsum("tij,tj->ti", R0, odo1[:, :2] - odo0[:, :2])
    est = jnp.einsum("tij,tj->ti", Ra, x[1:, :2] - x[:-1, :2])
    r_oxy = meas - est
    r_oth = wrap_angle(odo1[:, 2] - odo0[:, 2] - (x[1:, 2] - x[:-1, 2]))
    r_odo = jnp.concatenate([r_oxy, r_oth[:, None]], axis=1) * sqrt_odom

    return r_obs, r_kin, r_odo


def energy(x, y, p: BAProblem, w):
    r_obs, r_kin, r_odo = _residuals(x, y, p, w)
    return (jnp.sum(r_obs * r_obs) + jnp.sum(r_kin * r_kin)
            + jnp.sum(r_odo * r_odo))


def _sqsum(tree):
    return sum(jnp.sum(t * t) for t in tree)


def ba_refine(data: SweepData, old_map: MapState, x, config, w,
              gn_iters: int = 6, cg_iters: int = 60, damping: float = 1e-5
              ) -> Tuple[MapState, jnp.ndarray]:
    """One outer BA iteration: batched association + joint GN-Schur solve.

    Returns (map_state with optimized landmark positions, optimized poses).
    """
    sqrt_q = w[1]
    L = old_map.pos.shape[0]
    T = x.shape[0]

    labels, assoc_map, _ = batched_associate(data, old_map, x, config)
    counts = assoc_map.counts
    live = counts > 0
    y0 = assoc_map.pos  # segment means = exact minimizer of obs term given x

    # beam compaction (same exactness argument as solver.sweeps.compact_obs)
    valid = (labels < L) & data.mask
    cap = config.obs_cap if config.obs_cap else data.dist.shape[1]
    order = jnp.argsort(~valid, axis=1, stable=True)[:, :cap]
    dist_c = jnp.take_along_axis(data.dist, order, axis=1)
    # ang is the shared 1-D beam vector, or (T, B) when the caller
    # pre-compacted the beam axis (solver.icm._refine_loop_jit hoist)
    ang_c = (jnp.take_along_axis(data.ang, order, axis=1)
             if data.ang.ndim == 2 else data.ang[order])
    lab_c = jnp.take_along_axis(labels, order, axis=1)
    obs_w = jnp.take_along_axis(valid, order, axis=1).astype(x.dtype)

    prob = BAProblem(data, dist_c, ang_c, lab_c, obs_w, counts, live)
    qdiag = sqrt_q * sqrt_q                                  # (2,)
    gauge = jnp.ones((T, 3), x.dtype).at[0].set(0.0)         # anchor pose 0

    def obs_vjp_y(r_obs):
        """J_y^T r_obs: scatter weighted residuals back to landmarks."""
        contrib = -(r_obs * sqrt_q[None, None, :] * prob.obs_w[..., None])
        flat = contrib.reshape(-1, 2)
        lab = prob.labels.reshape(-1)
        return jax.ops.segment_sum(flat, lab, num_segments=L + 1)[:L]

    def obs_jvp_y(dy):
        """J_y dy: gather landmark deltas to observation residual space."""
        d = dy[jnp.clip(prob.labels, 0, L - 1)]
        return -d * sqrt_q[None, None, :] * prob.obs_w[..., None]

    def hyy_inv(gy):
        """(Q * count_l)^-1 gy — the (diagonal) landmark Schur block."""
        denom = counts[:, None] * qdiag[None, :] + damping
        return jnp.where(live[:, None], gy / denom, 0.0)

    def gn_step(carry, _):
        x, y = carry

        def rx(xx):
            return _residuals(xx, y, prob, w)

        r = rx(x)
        (_, vjp_x) = jax.vjp(rx, x)
        (gx,) = vjp_x(r)
        gx = gx * gauge
        gy = obs_vjp_y(r[0])
        gy = jnp.where(live[:, None], gy, 0.0)

        def jx(v):
            _, jv = jax.jvp(rx, (x,), (v * gauge,))
            return jv

        def jxt(rt):
            (out,) = vjp_x(rt)
            return out * gauge

        def schur_mv(v):
            jv = jx(v)                                   # residual-space
            # landmark coupling: J_y^T J_x v -> H_yy^-1 -> J_y
            gyv = obs_vjp_y(jv[0])
            corr = obs_jvp_y(hyy_inv(gyv))
            jv_corr = (jv[0] - corr, jv[1], jv[2])
            return jxt(jv_corr) + damping * v * gauge

        rhs = -(gx - jxt((obs_jvp_y(hyy_inv(gy)),
                          jnp.zeros_like(r[1]), jnp.zeros_like(r[2]))))

        # Block-Jacobi preconditioner on the pose block.  The residual
        # graph is BANDED in t (obs couples only x_t; kin/odo couple
        # t and t+1), so poses of equal parity never share a residual:
        # 2 colors x 3 basis vectors = 6 Hessian products recover the
        # EXACT per-pose 3x3 diagonal blocks of J_x^T J_x.
        parity_sel = ((jnp.arange(T) % 2)[:, None]
                      == jnp.arange(2)[None, :]).astype(x.dtype)  # (T, 2)
        cols = []
        for i in range(3):
            acc = jnp.zeros_like(x)
            for p_ in range(2):
                sel = parity_sel[:, p_:p_ + 1]
                v = jnp.zeros_like(x).at[:, i].set(1.0) * sel
                acc = acc + jxt(jx(v)) * sel
            cols.append(acc)
        M = jnp.stack(cols, axis=-1)                         # (T, 3, 3)
        M = M + damping * jnp.eye(3, dtype=x.dtype)
        # pose 0 is gauge-anchored (zero row/col) -> identity block
        M = M.at[0].set(jnp.eye(3, dtype=x.dtype))
        Minv = jnp.linalg.inv(M)

        def prec(rr):
            return jnp.einsum("tij,tj->ti", Minv, rr) * gauge

        def pcg(mv, b, iters):
            x0 = jnp.zeros_like(b)
            r0 = b
            z0 = prec(r0)
            p0 = z0

            def body(c, _):
                xx, rr, zz, pp = c
                hp = mv(pp)
                rz = jnp.vdot(rr, zz)
                denom = jnp.vdot(pp, hp)
                alpha = jnp.where(denom > 0, rz / denom, 0.0)
                x1 = xx + alpha * pp
                r1 = rr - alpha * hp
                z1 = prec(r1)
                beta = jnp.where(rz > 0, jnp.vdot(r1, z1) / rz, 0.0)
                return (x1, r1, z1, z1 + beta * pp), None

            (xs, _, _, _), _ = jax.lax.scan(body, (x0, r0, z0, p0), None,
                                            length=iters)
            return xs

        dx = pcg(schur_mv, rhs, cg_iters)
        # back-substitute landmarks: dy = -H_yy^-1 (gy + J_y^T J_x dx)
        dy = -hyy_inv(gy + obs_vjp_y(jx(dx)[0]))

        x_new = x + dx
        y_new = y + dy
        e_old = _sqsum(r)
        e_new = energy(x_new, y_new, prob, w)
        ok = e_new < e_old
        x = jnp.where(ok, x_new, x)
        y = jnp.where(ok, y_new, y)
        return (x, y), jnp.minimum(e_new, e_old)

    (x_opt, y_opt), energies = jax.lax.scan(gn_step, (x, y0), None,
                                            length=gn_iters)
    final = MapState(jnp.where(live[:, None], y_opt, 0.0), counts,
                     assoc_map.nact)
    return final, x_opt
