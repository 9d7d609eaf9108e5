"""Generate golden traces from the NumPy oracle for test/ATE validation.

Usage:
    python tools/make_golden.py [--iters N] [--frames T] [--criterion C] [--out PATH]

Writes an .npz with x_init (3,T), x (3,T), map (2,K), counts (K,), changes.
"""
import argparse
import os
import sys
import time

import numpy as np
import scipy.io as sio

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests", "oracle"))
from reference_oracle import OracleParams, run_pipeline  # noqa: E402

DATA = "/root/reference/scripts/data_IJAC2018.mat"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--frames", type=int, default=0, help="0 = all")
    ap.add_argument("--criterion", default="inconsistent")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    m = sio.loadmat(DATA)
    scans = m["observations"]
    odom = m["odometry"]
    u = m["velocities"]
    T = args.frames or scans.shape[1]
    scans, odom, u = scans[:, :T], odom[:, :T], u[:, :T]

    p = OracleParams(N=args.iters, cluster_criterion=args.criterion)
    t0 = time.time()
    out = run_pipeline(scans, odom, u, p)
    dt = time.time() - t0

    path = args.out or os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden",
        f"ijac2018_T{T}_N{args.iters}_{args.criterion}.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out, wall_seconds=dt, frames=T,
                        iters=args.iters, criterion=args.criterion)
    print(f"saved {path}  ({dt:.1f}s, {T} frames x {args.iters} iters, "
          f"{out['map'].shape[1]} landmarks)")


if __name__ == "__main__":
    main()
