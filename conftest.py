"""Root conftest: force tests onto a virtual 8-device CPU mesh.

Must run before jax is imported anywhere. Real-TPU runs (bench.py,
__graft_entry__.py) are separate entry points and are unaffected.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize.py (axon boot) imports jax at interpreter start, before this
# conftest runs, so the env vars above are read too late. Override via the
# live config instead — backends are not initialized yet at collection time.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
