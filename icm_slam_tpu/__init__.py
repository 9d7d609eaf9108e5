"""icm_slam_tpu — TPU-native ICM-SLAM engine (JAX / XLA / Pallas / pjit).

Brand-new implementation of the capabilities of the reference ICM-SLAM
package (Seba-san/icm-slam), redesigned TPU-first: masked fixed shapes,
batched Gauss-Newton pose solves, segment-sum map updates, red-black
parallel sweeps, and device-mesh sharding over the time axis.
"""
import os as _os

from icm_slam_tpu.config import ICMConfig

__version__ = "0.1.0"
__all__ = ["ICMConfig"]


def _enable_compilation_cache():
    """Persistent XLA compilation cache (first compiles through the remote
    TPU tunnel take ~minutes; cached reloads take seconds).  Opt out with
    ICM_NO_COMPILE_CACHE=1."""
    if _os.environ.get("ICM_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            path = _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   _os.path.expanduser("~/.jax_cache"))
            _os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
    except Exception:
        pass  # caching is best-effort


_enable_compilation_cache()
