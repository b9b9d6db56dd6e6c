"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on faked host devices (the driver
dry-run-compiles the real multi-chip path separately); the benchmark runs on
the real TPU chip outside pytest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The hosted TPU plugin ('axon') overrides JAX_PLATFORMS from the
# environment; the config API wins over the plugin.
jax.config.update("jax_platforms", "cpu")

# Drop the axon backend factory entirely: jax's backends() initializes
# every REGISTERED platform, and the tunneled plugin blocks indefinitely
# (not fails) when the tunnel is down — which would hang the whole suite
# at the first device use even on the cpu platform.
try:  # noqa: SIM105
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

# Persistent compilation cache: the suite's wall time is dominated by CPU
# XLA compiles of the bigger models; caching them across sessions cuts
# repeat runs by an order of magnitude.
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()
assert jax.device_count() == 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
