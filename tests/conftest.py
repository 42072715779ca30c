"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's compile
checks; unit tests validate numerics and sharding on host CPU so they
are hermetic and fast (first TPU compile is 20-40 s).

Note: the environment's sitecustomize imports jax and registers the
TPU PJRT plugin in every interpreter, so env vars alone are not enough
here — we also update jax.config directly (backends are initialized
lazily, so this still takes effect).
"""

import os
import sys

# Set env first for any subprocesses the tests may spawn.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent XLA compilation cache: repeated test sessions (and the
# driver's repeated suite runs) skip recompilation of unchanged
# programs — the suite is compile-dominated on CPU.
#
# The cache key MUST include the host CPU's feature set: XLA:CPU AOT
# results baked for another machine's features (e.g. +prefer-no-scatter)
# load with a warning and then SIGILL mid-suite ("Fatal Python error"
# with no traceback). Keying the directory by the cpuinfo flags hash
# makes a mismatched cache simply cold instead of lethal.
import hashlib

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next((ln for ln in _f if ln.startswith("flags")), "")
except OSError:
    _flags = ""
_cpu_tag = hashlib.sha1(_flags.encode()).hexdigest()[:12]
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".xla_cache", _cpu_tag)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"
