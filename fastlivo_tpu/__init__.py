"""fastlivo_tpu — a TPU-native LiDAR-Inertial-Visual Odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hku-mars/FAST-LIVO (tightly-coupled sparse-direct LIVO with an 18-state
iterated error-state Kalman filter; see /root/reference, SURVEY.md).

Architecture (TPU-first, not a port):
  - ops/        batched math kernels: SO(3), plane fit, voxel-hash map,
                image sampling, Pallas kernels for the hot gathers.
  - state.py    18-dim error-state ("StatesGroup" equivalent) as a pytree.
  - imu.py      IMU init + forward propagation + scan undistortion
                (lax.scan over padded IMU samples).
  - lio.py      point-to-plane iterated EKF update (batched, masked).
  - camera.py   pinhole + radial-tangential camera model.
  - vio.py      sparse-direct photometric iterated EKF update and the
                SoA visual map (fixed-capacity, index-based).
  - sync.py     measurement synchronization (host side).
  - preprocess.py  per-vendor LiDAR decode + decimation (host side).
  - pipeline.py the per-frame orchestrator.
  - parallel/   device-mesh sharding of the residual rows (shard_map+psum).
  - io/         dataset formats, synthetic world generator, loaders.
"""

import jax as _jax

# The 18x18 covariance algebra runs in f64 for parity with the
# reference's double-precision solve (laserMapping.cpp:1663-1683); hot
# point/patch batches are explicitly f32. x64 must be enabled before any
# array is created, hence here at package import.
_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: compiles through the axon remote-compile
# relay cost 30-180 s each; cache them across processes.
import os as _os

_cache_dir = _os.environ.get(
    "FASTLIVO_JAX_CACHE", _os.path.expanduser("~/.cache/fastlivo_jax")
)
_jax.config.update("jax_compilation_cache_dir", _cache_dir)
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

__version__ = "0.1.0"


_LAZY = {
    "Pipeline": ("fastlivo_tpu.pipeline", "Pipeline"),
    "Config": ("fastlivo_tpu.config", "Config"),
    "load_config": ("fastlivo_tpu.config", "load_config"),
    "Vio": ("fastlivo_tpu.vio", "Vio"),
    "NavState": ("fastlivo_tpu.state", "NavState"),
    "BlockReplayer": ("fastlivo_tpu.replay", "BlockReplayer"),
    "LivoBlockReplayer": ("fastlivo_tpu.replay", "LivoBlockReplayer"),
    "Server": ("fastlivo_tpu.serve", "Server"),
}


def __getattr__(name):
    """Lazy public API (imports stay cheap; heavy modules load on use):

        from fastlivo_tpu import Pipeline, load_config, Vio
    """
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'fastlivo_tpu' has no attribute {name!r}")


def __dir__():
    # surface the lazy names to dir()/tab-completion
    return sorted(set(globals()) | set(_LAZY))
