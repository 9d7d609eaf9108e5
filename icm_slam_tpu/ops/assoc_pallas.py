"""Fused correspondence-search kernel (Pallas/TPU).

Computes, for every beam point of every frame, the nearest live landmark and
its distance — the hot inner product of data association
(cdist+argmin+threshold, reference ICM_SLAM.py:169-172, batched over the
whole trajectory).

The XLA path materializes the (T, B, L) distance tensor in HBM
(1833 x 181 x 1024 x 4 B ~ 1.4 GB per sweep); this kernel streams T-tiles
through VMEM and keeps a running (min, argmin) over L-chunks, so HBM traffic
drops to the inputs plus two (T, B) outputs.

MEASURED REALITY (see CLAUDE.md "measurement traps"): inside the full
refinement jit the kernel and the XLA path are equal at BOTH tested scales
— 62.5 vs 63.1 ms/iter at reference scale, and 243.2 vs 240.6 ms/iter at
the 20k-frame / L=1024 stress world (round-2 A/B, docs/RESULTS.md) — XLA's
own fusion already avoids materializing the distances.  The question is
SETTLED: the kernel is opt-in (`use_pallas_assoc` / `--pallas`), kept as
the explicit-control scaffold for future custom-kernel work.

Hardware notes (learned on the axon remote-TPU runtime):
  * no in-kernel reshape of the (TILE_T, B, 2) block — merging sublane dims
    forces a Mosaic relayout that blows the 16 MB scoped-VMEM budget;
  * the map rides transposed as (2, L): landmark coordinates live on the
    lane axis, so an L-chunk is a cheap lane slice;
  * NO scalar operands: both PrefetchScalarGridSpec and SMEM (1,1) inputs
    stall at execution time on this runtime.  Dead landmarks are masked
    OUTSIDE the kernel by moving them to a far sentinel position, which the
    running argmin can never select;
  * distances use the direct (p-m)^2 form (same numerics as the jnp path,
    no MXU needed — the kernel is bandwidth-, not FLOP-bound).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 8
CHUNK_L = 256
DEAD_POS = 1e9  # sentinel coordinate for dead landmark slots


def _kernel(pts_ref, map_ref, lab_ref, dist_ref):
    """pts (TILE_T, B, 2); map (2, L) -> labels/dist (TILE_T, B)."""
    tt, B, _ = pts_ref.shape
    L = map_ref.shape[1]
    px = pts_ref[:, :, 0]                                   # (tt, B)
    py = pts_ref[:, :, 1]
    n_chunks = L // CHUNK_L

    big = jnp.full((tt, B), jnp.inf, jnp.float32)
    zero_lab = jnp.zeros((tt, B), jnp.int32)

    def body(c, carry):
        best, blab = carry
        mx = map_ref[0, pl.ds(c * CHUNK_L, CHUNK_L)]        # (LC,)
        my = map_ref[1, pl.ds(c * CHUNK_L, CHUNK_L)]
        dx = px[:, :, None] - mx[None, None, :]             # (tt, B, LC)
        dy = py[:, :, None] - my[None, None, :]
        d2 = dx * dx + dy * dy
        cmin = jnp.min(d2, axis=2)                          # (tt, B)
        clab = (jnp.argmin(d2, axis=2).astype(jnp.int32) + c * CHUNK_L)
        upd = cmin < best                                   # strict: first
        return jnp.where(upd, cmin, best), jnp.where(upd, clab, blab)

    best, blab = jax.lax.fori_loop(0, n_chunks, body, (big, zero_lab))
    lab_ref[:] = blab
    dist_ref[:] = jnp.sqrt(jnp.maximum(best, 0.0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_landmark(pts, map_pos, nact, interpret=False):
    """pts: (T, B, 2) f32; map_pos: (L, 2) f32 (L multiple of 256);
    nact: () int32 live-landmark count.

    Returns (labels (T,B) int32 = argmin over live landmarks,
             min_dist (T,B) f32; >= ~1e9 where no live landmark exists).
    """
    T, B, _ = pts.shape
    L = map_pos.shape[0]
    assert L % CHUNK_L == 0, f"landmark capacity must be a multiple of {CHUNK_L}"
    live = (jnp.arange(L) < nact)[:, None]
    map_masked = jnp.where(live, map_pos.astype(jnp.float32), DEAD_POS)
    grid = (pl.cdiv(T, TILE_T),)

    labels, dists = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_T, B, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_T, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, B), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B), jnp.int32),
            jax.ShapeDtypeStruct((T, B), jnp.float32),
        ],
        interpret=interpret,
    )(pts.astype(jnp.float32), map_masked.T)
    return labels, dists


def nearest_landmark_reference(pts, map_pos, nact):
    """jnp reference implementation (same contract) for tests/CPU."""
    L = map_pos.shape[0]
    live = jnp.arange(L) < nact
    diff = pts[..., None, :] - map_pos[None, None, :, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    d = jnp.where(live[None, None, :], d, jnp.inf)
    return jnp.argmin(d, axis=-1).astype(jnp.int32), jnp.min(d, axis=-1)
