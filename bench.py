"""Headline benchmark entry point (driver-facing).

Prints ONE JSON line:
  {"metric": "icm_refine_frames_per_s", "value": ..., "unit": "frames/s",
   "vs_baseline": ...}

The implementation lives in icm_slam_tpu.benchmarks.headline (single source
of truth, also reachable as ``icm-slam-tpu bench`` from an installed
package).  See that module for flags; notable ones:

  --dataset ijac2018|palomar   benchmark dataset (default ijac2018)
  --passes / --gn-iters        quality/speed profile knobs
  --cpu                        force the CPU backend
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icm_slam_tpu.benchmarks.headline import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
