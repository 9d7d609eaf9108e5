"""Online streaming engine: chunked causal results == batch init sweep."""
import numpy as np
import pytest

from icm_slam_tpu.config import ICMConfig
from icm_slam_tpu.runtime.online import OnlineSLAM
from icm_slam_tpu.runtime.replay import stream_dataset
from icm_slam_tpu.solver.icm import run


@pytest.mark.parametrize("chunk", [7, 64])
def test_online_matches_offline_init(ijac, chunk):
    ds = ijac.slice(200)
    # the streaming engine IS the causal sequential init — compare against
    # that engine, not the offline default (batched Picard init)
    cfg = ICMConfig(N=0, L=256, dtype="float32", init_mode="sequential")
    eng = OnlineSLAM(cfg, chunk_size=chunk)
    for frame in stream_dataset(ds):
        eng.push(*frame)
    r_on = eng.finish(refine=False)
    r_off = run(ds, cfg, n_iters=0)
    # run() compacts the LM observation set (obs_cap); the streaming engine
    # cannot (future frames unknown) -> identical math, different f32 op
    # order, so agreement is to float noise rather than bitwise
    np.testing.assert_allclose(r_on.x_init, r_off.x_init, atol=1e-3)
    assert r_on.map_pos.shape == r_off.map_pos.shape
    np.testing.assert_allclose(r_on.map_pos, r_off.map_pos, atol=1e-3)


def test_online_with_refinement(ijac):
    ds = ijac.slice(150)
    cfg = ICMConfig(N=1, L=256, dtype="float32")
    eng = OnlineSLAM(cfg, chunk_size=32)
    for frame in stream_dataset(ds):
        eng.push(*frame)
    res = eng.finish(refine=True)
    ref = run(ds, cfg)
    np.testing.assert_array_equal(res.x, ref.x)


def test_online_empty_first_frame():
    """Bootstrap with an all-max-range first frame must not crash."""
    from icm_slam_tpu.data.datasets import synthetic_world
    ds = synthetic_world(T=40, n_landmarks=6, seed=5)
    ds.scans[0] = 10.0
    cfg = ICMConfig(N=0, L=64, cota=2.0, dtype="float32")
    eng = OnlineSLAM(cfg, chunk_size=8)
    for frame in stream_dataset(ds):
        eng.push(*frame)
    res = eng.finish(refine=False)
    assert np.isfinite(res.x_init).all()
