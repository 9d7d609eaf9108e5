"""Fused correspondence + per-frame landmark-sum kernel (Pallas/TPU).

One kernel pass per T-tile computes, against the (frozen, capped) landmark
table, everything the batched sweep's association block needs per beam:

  * the nearest live landmark (argmin over the cap columns) and its
    SQUARED distance (reference semantics: ICM_SLAM.py:169-172's
    cdist+argmin, threshold compared in the d^2 form);
  * the per-frame per-landmark weighted sums [sum px*w, sum py*w, sum w]
    over the beams matched to OLD landmarks (w = valid & within
    dist_thr) — the input of the running-mean prefix sums
    (solver/sweeps.batched_associate).

Motivation (round-2 attribution, docs/RESULTS.md): with the solves and
filter cheap, the association+map block dominates the 4.3 ms sweep; its
cost is op-count latency — distances, argmin, one-hot build, contraction
are separate XLA ops over small tensors.  This kernel collapses them
into one pass over VMEM-resident tiles.  Like ops/assoc_pallas.py it is
OPT-IN (`use_pallas_fused_assoc`) until an in-context A/B on real
hardware proves it; the XLA path stays the default.

Hardware notes (same axon runtime lessons as ops/assoc_pallas.py):
no scalar operands (dead landmarks pre-masked to a far sentinel
position outside the kernel), no sublane-merging reshapes, all
reductions ride the VPU (B ~ 24 beams; no MXU needed).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 8
DEAD_POS = 1e9  # sentinel coordinate for dead landmark columns


def _kernel(thr2, pts_ref, map_ref, mask_ref, lab_ref, d2_ref, sums_ref):
    """pts (tt, B, 2); map (2, K); mask (tt, B) f32 ->
    lab/d2 (tt, B), sums (tt, 3, K)."""
    tt, B, _ = pts_ref.shape
    K = map_ref.shape[1]
    px = pts_ref[:, :, 0]                                   # (tt, B)
    py = pts_ref[:, :, 1]
    mx = map_ref[0, :]                                      # (K,)
    my = map_ref[1, :]

    dx = px[:, :, None] - mx[None, None, :]                 # (tt, B, K)
    dy = py[:, :, None] - my[None, None, :]
    d2 = dx * dx + dy * dy
    lab = jnp.argmin(d2, axis=2).astype(jnp.int32)          # (tt, B)
    d2min = jnp.min(d2, axis=2)

    # old-landmark weight: valid beam AND within the association gate
    w = mask_ref[:, :] * (d2min <= thr2).astype(jnp.float32)  # (tt, B)
    onehot = (lab[:, :, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (tt, B, K), 2)
              ).astype(jnp.float32)                         # (tt, B, K)
    wh = onehot * w[:, :, None]
    sums_ref[:, 0, :] = jnp.sum(wh * px[:, :, None], axis=1)   # (tt, K)
    sums_ref[:, 1, :] = jnp.sum(wh * py[:, :, None], axis=1)
    sums_ref[:, 2, :] = jnp.sum(wh, axis=1)
    lab_ref[:, :] = lab
    d2_ref[:, :] = d2min


@functools.partial(jax.jit, static_argnames=("dist_thr", "interpret"))
def associate_and_sums(pts, map_pos, mask, nact, dist_thr, interpret=False):
    """pts (T, B, 2) f32; map_pos (K, 2) f32 (K multiple of 128);
    mask (T, B) bool; nact () int32 live count; dist_thr static float.

    Returns (lab (T, B) int32  — argmin column over live landmarks,
             d2min (T, B) f32  — squared distance to it,
             sums (T, 3, K) f32 — per-frame [sum px*w, sum py*w, sum w]
             with w = mask & (d2min <= dist_thr^2)).
    Dead columns can never win the argmin (DEAD_POS sentinel), so beams
    with no live landmark within the gate report d2min ~ 1e18.
    """
    T, B, _ = pts.shape
    K = map_pos.shape[0]
    assert K % 128 == 0, "landmark cap must be a multiple of 128 lanes"
    live = (jnp.arange(K) < nact)[:, None]
    map_masked = jnp.where(live, map_pos.astype(jnp.float32), DEAD_POS)
    thr2 = float(dist_thr) * float(dist_thr)
    grid = (pl.cdiv(T, TILE_T),)

    lab, d2min, sums = pl.pallas_call(
        functools.partial(_kernel, thr2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_T, B, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_T, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, 3, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B), jnp.int32),
            jax.ShapeDtypeStruct((T, B), jnp.float32),
            jax.ShapeDtypeStruct((T, 3, K), jnp.float32),
        ],
        interpret=interpret,
    )(pts.astype(jnp.float32), map_masked.T,
      mask.astype(jnp.float32))
    return lab, d2min, sums


def associate_and_sums_reference(pts, map_pos, mask, nact, dist_thr):
    """jnp reference with the identical contract (tests / non-TPU)."""
    K = map_pos.shape[0]
    live = jnp.arange(K) < nact
    mp = jnp.where(live[:, None], map_pos, DEAD_POS)
    diff = pts[:, :, None, :] - mp[None, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    lab = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    d2min = jnp.min(d2, axis=-1)
    w = mask.astype(jnp.float32) * (d2min <= dist_thr * dist_thr)
    oh = (lab[..., None] == jnp.arange(K)).astype(jnp.float32)
    wh = oh * w[..., None]
    sums = jnp.stack([jnp.sum(wh * pts[..., 0:1], axis=1),
                      jnp.sum(wh * pts[..., 1:2], axis=1),
                      jnp.sum(wh, axis=1)], axis=1)
    return lab, d2min, sums
