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

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _restore_region_tunables():
    """Several kernel tests shrink the module-level region-size tunables so
    interpret-mode compiles stay affordable; restore the production values
    after every test so coverage is order-independent."""
    from jaybenne_tpu.ops import pallas_bucketed as pb
    from jaybenne_tpu.ops import pallas_grid as pg

    saved = [
        (m, k, getattr(m, k))
        for m in (pb, pg)
        for k in ("REGION_CELLS_IMC", "REGION_CELLS_DDMC", "TAIL_DIV")
        if hasattr(m, k)
    ]
    yield
    for m, k, v in saved:
        setattr(m, k, v)
