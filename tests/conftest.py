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

# NO persistent XLA compilation cache for the suite. XLA:CPU AOT cache
# entries record the compile machine's feature set including XLA-chosen
# pseudo-features (+prefer-no-scatter/+prefer-no-gather) that never
# match the host-derived feature list at load time; on some hosts a
# loaded entry then SIGILLs mid-suite as a bare "Fatal Python error"
# with no traceback. Keying the cache dir by a cpuinfo-flags hash was
# not sufficient (reproduced on a same-flags host), so the suite
# compiles cold every session — slower on repeats, never lethal.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"
