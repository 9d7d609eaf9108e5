"""Knob-sweep cost attribution for the refinement sweep and init.

Times the fused refinement loop and the init sweep across profile knobs
(pose_gn_iters, pose_passes, init_rounds) on the current backend, using
the honest protocol (chained state, median of repetitions — see CLAUDE.md
"measurement traps").  Differences between knob settings attribute cost
to the LM iterations, the half-pass machinery, and the association+map
block without a profiler (jax.profiler hangs on the axon runtime).

    python benchmarks/attribution.py [--dataset ijac2018] [--reps 6]

Round-2 reference-scale findings this tool reproduces (docs/RESULTS.md):
LM iterations ~0.34 ms each, half-pass pair ~1.9 ms, association+map
block ~1.6 ms after the one-hot build, filter ~0 after the dynamic
relabel walk.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ijac2018")
    ap.add_argument("--iters", type=int, default=30,
                    help="sweeps per timed loop call")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from icm_slam_tpu.config import ICMConfig
    from icm_slam_tpu.data.datasets import load
    from icm_slam_tpu.solver.icm import (_filter_jit, _init_jit,
                                         _refine_loop_jit, prepare,
                                         resolve_config, seed_map)

    ds = load(args.dataset)

    def setup(cfg):
        data = prepare(ds, cfg)
        cfg = resolve_config(cfg, data)
        x0 = jnp.asarray(ds.x0, data.dist.dtype)
        return data, cfg, x0, seed_map(data, x0, cfg)

    def time_refine(passes, gn, fused=False):
        cfg0 = ICMConfig(N=args.iters, L=1024, pose_passes=passes,
                         pose_gn_iters=gn, use_pallas_fused_assoc=fused)
        data, cfg, x0, seed = setup(cfg0)
        st, x, _ = _init_jit(data, seed, x0, cfg)
        cur = _filter_jit(st, cfg)
        m, xr, _, _ = _refine_loop_jit(data, cur, x, cfg, args.iters,
                                       with_metrics=False)
        jax.block_until_ready(xr)
        ts = []
        for _ in range(args.reps):
            xc = xr + jnp.asarray(1e-30, xr.dtype)
            jax.block_until_ready(xc)
            t0 = time.perf_counter()
            m, xr, _, _ = _refine_loop_jit(data, m, xc, cfg, args.iters,
                                           with_metrics=False)
            jax.block_until_ready(xr)
            ts.append((time.perf_counter() - t0) * 1e3 / args.iters)
        return _median(ts)

    def time_init(rounds, **kw):
        cfg0 = ICMConfig(N=0, L=1024, init_rounds=rounds, **kw)
        data, cfg, x0, seed = setup(cfg0)
        st, x, _ = _init_jit(data, seed, x0, cfg)
        jax.block_until_ready(x)
        ts = []
        for _ in range(args.reps):
            x0c = x0 + 1e-30 * x[-1]          # chained dep, value-identical
            t0 = time.perf_counter()
            st, x, _ = _init_jit(data, seed, x0c, cfg)
            jax.block_until_ready(x)
            ts.append((time.perf_counter() - t0) * 1e3)
        return _median(ts)

    r_fast = time_refine(1, 6)
    r_gn2 = time_refine(1, 2)
    r_gn1 = time_refine(1, 1)
    r_default = time_refine(2, 8)
    # fused assoc+sums kernel A/B at the fast profile (opt-in candidate);
    # interpret mode off-TPU makes this row meaningless on CPU
    r_fused = (time_refine(1, 6, fused=True)
               if jax.devices()[0].platform == "tpu" else None)
    i_r1 = time_init(1)
    i_r2 = time_init(2)
    # round-3 depth-reduction candidates (opt-in knobs; full N=30 quality
    # matrix green on both datasets x both profiles — docs/RESULTS.md)
    i_merge_cap = time_init(2, init_merge_cap=-1)
    i_no_final = time_init(2, init_final_assoc=False)
    i_gn4 = time_init(2, init_gn_iters=4)
    i_all = time_init(2, init_merge_cap=-1, init_final_assoc=False,
                      init_gn_iters=4)
    # bigger chunks alone lose landmarks (round-2 cliff), but with
    # no-final-assoc the cliff moves out to C=96: C=64+K2+K3 is green on
    # all four combos at BETTER ATE than C=48 (0.029-0.043) — the deepest
    # validated depth cut (29 steps x 2 assoc x 4 LM vs 58 x 3 x 6-8,
    # ~67% fewer sequential steps than C=32/R=2)
    i_c48_all = time_init(2, init_chunk_len=48, init_merge_cap=-1,
                          init_final_assoc=False, init_gn_iters=4)
    i_c64_all = time_init(2, init_chunk_len=64, init_merge_cap=-1,
                          init_final_assoc=False, init_gn_iters=4)

    per_lm_iter = (r_fast - r_gn2) / 4.0
    non_lm = r_gn1 - per_lm_iter          # assoc + map + half-pass + filter
    out = {
        "dataset": args.dataset,
        "backend": jax.devices()[0].platform,
        "refine_ms_per_iter": {"fast_1p6g": round(r_fast, 2),
                               "1p2g": round(r_gn2, 2),
                               "1p1g": round(r_gn1, 2),
                               "default_2p8g": round(r_default, 2),
                               "fast_fused_kernel":
                                   None if r_fused is None
                                   else round(r_fused, 2)},
        "attribution_ms": {
            "per_lm_iteration": round(per_lm_iter, 3),
            "lm_at_gn6": round(6 * per_lm_iter, 2),
            "assoc_map_halfpass_filter": round(non_lm, 2),
            "extra_pass_pair_at_gn6": round(r_default
                                            - r_fast
                                            - 2 * 2 * per_lm_iter, 2),
        },
        "init_ms": {"rounds_1": round(i_r1, 1), "rounds_2": round(i_r2, 1),
                    "per_round": round(i_r2 - i_r1, 1),
                    "k1_merge_cap": round(i_merge_cap, 1),
                    "k2_no_final_assoc": round(i_no_final, 1),
                    "k3_init_gn4": round(i_gn4, 1),
                    "k123_combined": round(i_all, 1),
                    "c48_k123_combined": round(i_c48_all, 1),
                    "c64_k123_combined": round(i_c64_all, 1)},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
