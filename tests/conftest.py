"""Test harness: force an 8-virtual-device CPU JAX so the full test suite,
including multi-chip sharding logic, runs on any host (per SURVEY.md §4:
multi-host tests on CPU with --xla_force_host_platform_device_count)."""
import os

# The environment pins JAX_PLATFORMS=axon (the tunneled TPU, with a
# ~5s-per-compile remote-compile relay); tests must override it — unit
# tests run on a virtual 8-device CPU. sitecustomize may already have
# imported jax, so set both the env var and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: first suite run pays the compiles, later
# runs are fast (single-core host).
_cache = Path(__file__).resolve().parents[1] / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
