"""Fleet mode: run_batched == per-world run(), as one device program.

The roofline analysis (docs/RESULTS.md) shows a single run is
latency-bound; run_batched fills the idle chip with W independent worlds.
Correctness contract: per-world results are bitwise-equal to run() on CPU
(the vmapped program executes the same ops per lane).
"""
import numpy as np
import pytest

from icm_slam_tpu.config import ICMConfig
from icm_slam_tpu.data.datasets import synthetic_world
from icm_slam_tpu.solver.icm import (prepare, resolve_fleet_config, run,
                                     run_batched)


def test_batched_matches_per_world():
    worlds = [synthetic_world(T=300, n_landmarks=25, seed=s)
              for s in (0, 1, 2)]
    cfg = ICMConfig(N=4, L=256, cota=10.0, dtype="float32")
    batched = run_batched(worlds, cfg)
    assert len(batched) == 3
    # solo runs must use the SAME merged caps the batch resolved (solo
    # resolution picks per-world caps; different f32 reduction widths
    # deviate at borderline associations — see resolve_fleet_config)
    merged = resolve_fleet_config(cfg, [prepare(w, cfg) for w in worlds])
    for ds, rb in zip(worlds, batched):
        r1 = run(ds, merged)
        assert r1.map_pos.shape == rb.map_pos.shape
        np.testing.assert_allclose(rb.x, r1.x, atol=1e-5)
        np.testing.assert_allclose(rb.x_init, r1.x_init, atol=1e-5)
        np.testing.assert_allclose(rb.map_pos, r1.map_pos, atol=1e-5)


def test_batched_rejects_mixed_shapes():
    worlds = [synthetic_world(T=300, seed=0), synthetic_world(T=301, seed=1)]
    with pytest.raises(ValueError, match="identical dataset shapes"):
        run_batched(worlds, ICMConfig(N=1, L=128, cota=10.0))


def test_batched_empty():
    assert run_batched([], ICMConfig(N=1)) == []
