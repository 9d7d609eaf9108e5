"""Checkpoint + metrics unit tests."""
import numpy as np

from icm_slam_tpu.utils import checkpoint as ckpt
from icm_slam_tpu.utils.metrics import JsonlLogger, ate, rpe


def test_checkpoint_roundtrip(tmp_path):
    x = np.random.default_rng(0).normal(size=(50, 3))
    mp = np.random.default_rng(1).normal(size=(7, 2))
    path = str(tmp_path / "icm_ckpt_3.npz")
    ckpt.save(path, 3, x, mp, np.arange(7.0), 7, x_init=x * 0.5)
    st = ckpt.load(path)
    assert int(st["iteration"]) == 3
    np.testing.assert_array_equal(st["x"], x)
    np.testing.assert_array_equal(st["map_pos"], mp)
    np.testing.assert_array_equal(st["x_init"], x * 0.5)


def test_checkpoint_latest(tmp_path):
    for k in (0, 2, 10):
        ckpt.save(str(tmp_path / f"icm_ckpt_{k}.npz"), k,
                  np.zeros((2, 3)), np.zeros((1, 2)), np.ones(1), 1)
    assert ckpt.latest(str(tmp_path)).endswith("icm_ckpt_10.npz")
    assert ckpt.latest(str(tmp_path / "nope")) is None


def test_ate_alignment_invariance():
    rng = np.random.default_rng(2)
    x = np.cumsum(rng.normal(size=(100, 3)), 0)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    x2 = x.copy()
    x2[:, :2] = x[:, :2] @ R.T + np.array([5.0, -3.0])
    # rigidly transformed trajectory: aligned ATE ~ 0
    assert ate(x2, x, align=True)["rmse"] < 1e-8
    assert ate(x2, x, align=False)["rmse"] > 1.0


def test_rpe_translation_invariance():
    rng = np.random.default_rng(3)
    x = np.cumsum(rng.normal(size=(100, 3)), 0)
    x2 = x + np.array([100.0, -50.0, 0.0])
    assert rpe(x2, x)["rmse"] < 1e-9


def test_jsonl_logger(tmp_path):
    import json
    path = str(tmp_path / "log.jsonl")
    lg = JsonlLogger(path)
    lg.log("iteration", k=1, v=np.float32(2.5), arr=np.array([1, 2]))
    lg.close()
    rec = json.loads(open(path).read().strip())
    assert rec["event"] == "iteration" and rec["v"] == 2.5
    assert rec["arr"] == [1, 2]
