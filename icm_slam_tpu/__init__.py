"""icm_slam_tpu — TPU-native ICM-SLAM engine (JAX / XLA / Pallas / pjit).

Brand-new implementation of the capabilities of the reference ICM-SLAM
package (Seba-san/icm-slam), redesigned TPU-first: masked fixed shapes,
batched Gauss-Newton pose solves, segment-sum map updates, red-black
parallel sweeps, and device-mesh sharding over the time axis.
"""
from icm_slam_tpu.config import ICMConfig

__version__ = "0.1.0"
__all__ = ["ICMConfig"]
