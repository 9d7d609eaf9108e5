"""Full-dataset quality validation: run the engine, report ATE vs golden.

    python tools/validate_golden.py [--mode batched] [--iters 30]
        [--dataset ijac2018] [--passes P] [--gn-iters K] [--cpu]

Compares the engine trajectory against the bitwise-verified oracle's golden
trace (tests/golden/) and prints a one-line JSON summary:
ATE of init + refined trajectories, landmark census, and per-stage wall time.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

GOLDEN = {
    ("ijac2018", 30): "ijac2018_T1833_N30_inconsistent.npz",
    ("ijac2018", 5): "ijac2018_full_N5.npz",
    ("palomar", 5): "palomar_N5.npz",
    ("palomar", 30): "palomar_T1833_N30_inconsistent.npz",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="ijac2018")
    ap.add_argument("--mode", default="batched")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--passes", type=int, default=None)
    ap.add_argument("--gn-iters", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np

    key = (args.dataset, args.iters)
    if key not in GOLDEN:
        sys.exit(f"no golden trace for {key}; available: {sorted(GOLDEN)}")
    g = np.load(os.path.join(ROOT, "tests", "golden", GOLDEN[key]))

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from icm_slam_tpu.api import run_offline
    from icm_slam_tpu.config import ICMConfig
    from icm_slam_tpu.data.datasets import load

    overrides = {"N": args.iters, "sweep_mode": args.mode}
    if args.passes is not None:
        overrides["pose_passes"] = args.passes
    if args.gn_iters is not None:
        overrides["pose_gn_iters"] = args.gn_iters
    cfg = ICMConfig(**overrides)
    ds = load(args.dataset)

    t0 = time.perf_counter()
    res = run_offline(ds, cfg, verbose=False)
    wall = time.perf_counter() - t0

    def ate(a, b):
        return float(np.mean(np.linalg.norm(a[:, :2] - b[:, :2], axis=1)))

    from scipy.spatial.distance import cdist
    gmap = g["map"].T
    census_ok = res.map_pos.shape[0] == gmap.shape[0]
    map_dev = float(cdist(res.map_pos, gmap).min(axis=0).max()) \
        if res.map_pos.size and gmap.size else float("nan")

    print(json.dumps({
        "dataset": args.dataset, "mode": args.mode, "iters": args.iters,
        "passes": cfg.pose_passes, "gn_iters": cfg.pose_gn_iters,
        "ate_init": round(ate(res.x_init, g["x_init"].T), 4),
        "ate_refined": round(ate(res.x, g["x"].T), 4),
        "landmarks": [int(res.map_pos.shape[0]), int(gmap.shape[0])],
        "census_ok": bool(census_ok),
        "map_max_dev_m": round(map_dev, 4),
        "wall_s": round(wall, 2),
    }))


if __name__ == "__main__":
    main()
