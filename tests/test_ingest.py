"""Message parsing + frame synchronization (reference L1/L2 semantics)."""
import math

import numpy as np

from icm_slam_tpu.runtime.ingest import (FrameSynchronizer, parse_laser_scan,
                                         parse_odometry, quat_to_yaw)


def _laser_msg(ranges, angle_min=-math.pi / 2, inc=math.pi / 180):
    return {"header": {"stamp": {"secs": 1, "nsecs": 0}, "seq": 0},
            "ranges": list(ranges), "angle_min": angle_min,
            "angle_increment": inc}


def test_parse_laser_nan_radius_clip():
    r = [float("nan"), 9.95, 5.0] + [10.0] * 178
    z = parse_laser_scan(_laser_msg(r), 10.0, 0.137)
    assert z.shape == (181,)
    assert z[0] == 10.0          # NaN -> max
    assert z[1] == 10.0          # 9.95 + 0.137 clipped
    np.testing.assert_allclose(z[2], 5.137)


def test_parse_laser_resample():
    # half-degree scan over the same arc -> every 2nd beam
    n = 362
    r = np.linspace(1.0, 8.0, n)
    msg = _laser_msg(r, angle_min=-math.pi / 2, inc=math.pi / 360)
    z = parse_laser_scan(msg, 10.0, 0.0)
    assert z.shape == (181,)
    np.testing.assert_allclose(z[:5], r[:10:2], atol=1e-12)


def test_quat_yaw_roundtrip():
    for yaw in np.linspace(-3, 3, 13):
        qz, qw = math.sin(yaw / 2), math.cos(yaw / 2)
        assert abs(quat_to_yaw(0, 0, qz, qw) - yaw) < 1e-12


def test_parse_odometry():
    yaw = 0.7
    msg = {"header": {"stamp": {"secs": 2, "nsecs": 500000000}, "seq": 1},
           "pose": {"pose": {"position": {"x": 1.0, "y": 2.0, "z": 0.0},
                             "orientation": {"x": 0.0, "y": 0.0,
                                             "z": math.sin(yaw / 2),
                                             "w": math.cos(yaw / 2)}}},
           "twist": {"twist": {"linear": {"x": 0.5, "y": 0, "z": 0},
                               "angular": {"x": 0, "y": 0, "z": -0.2}}}}
    pose, u = parse_odometry(msg)
    np.testing.assert_allclose(pose, [1.0, 2.0, yaw], atol=1e-12)
    np.testing.assert_allclose(u, [0.5, -0.2])


def test_synchronizer_pairs_and_drops():
    sync = FrameSynchronizer(deltat=0.1)
    # laser at a perfect 10 Hz grid; odometry slightly offset
    for k in range(30):
        sync.feed_laser(k * 0.1, np.full(181, float(k)))
        sync.feed_odometry(k * 0.1 + 0.01, np.array([k, 0, 0.0]),
                           np.array([1.0, 0.0]))
    frames = list(sync.drain())
    assert len(frames) >= 25
    r0, p0, u0 = frames[0]
    assert r0[0] == 0.0 and p0[0] == 0
    # monotone pairing
    ks = [p[0] for _, p, _ in frames]
    assert ks == sorted(ks)


def test_synchronizer_gap_dropped():
    sync = FrameSynchronizer(deltat=0.1)
    for k in range(30):
        sync.feed_laser(k * 0.1, np.full(3, float(k)))
        if not (10 <= k <= 12):     # odometry blackout
            sync.feed_odometry(k * 0.1, np.array([k, 0, 0.0]),
                               np.array([1.0, 0.0]))
    frames = list(sync.drain())
    ks = [int(p[0]) for _, p, _ in frames]
    assert 11 not in ks  # fully missing frames are dropped, stream continues
    assert any(k > 13 for k in ks)


def test_parse_laser_scan_pads_uncovered_left_sector():
    """A scan whose field of view starts AFTER -pi/2 (angle_min > -pi/2)
    must left-pad the uncovered sector with max_range — the old slice
    arithmetic produced a negative start that silently wrapped to the END
    of the ranges array (round-4 review)."""
    msg = _laser_msg([5.0] * 90, angle_min=0.0)
    z = parse_laser_scan(msg, max_range=10.0, radio=0.0)
    assert z.shape == (181,)
    np.testing.assert_array_equal(z[:90], 10.0)   # uncovered left sector
    np.testing.assert_array_equal(z[90:180], 5.0)  # the real 90 beams
    assert z[180] == 10.0                          # one beam past the FoV
