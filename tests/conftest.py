import os

# Force CPU with a virtual 8-device mesh BEFORE jax initializes: multi-chip sharding
# is exercised on host devices (SURVEY §5: the driver separately dry-runs the
# multi-chip path; real benches run on TPU).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin in this image force-prepends itself to jax_platforms even when
# JAX_PLATFORMS=cpu is set; pin the config explicitly after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
