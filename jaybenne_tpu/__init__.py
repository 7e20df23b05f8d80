"""jaybenne_tpu — TPU-native Implicit Monte Carlo thermal photon transport.

A from-scratch JAX/XLA rebuild of the capabilities of lanl/jaybenne (IMC after Fleck &
Cummings 1971, with hybrid Discrete Diffusion Monte Carlo in optically thick cells, on
block-structured optionally statically-refined Cartesian meshes). See SURVEY.md at the
repository root for the reference analysis and the design mapping.
"""

import os as _os

import jax as _jax

# Some TPU platform plugins force-prepend themselves to jax_platforms, silently
# overriding the user's JAX_PLATFORMS environment variable. Re-assert an explicit
# `JAX_PLATFORMS=cpu` so CPU-only runs never touch (or block on) the TPU plugin.
# Only the cpu case is overridden: anything else may legitimately come from the
# plugin itself, and callers that already pinned the config (e.g. a test conftest)
# must not be undone.
_env_platforms = _os.environ.get("JAX_PLATFORMS")
if _env_platforms == "cpu" and _jax.config.jax_platforms != "cpu":
    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - never fatal
        pass

# Persistent XLA compilation cache: each distinct configuration costs a one-time
# ~70-130 s trace+lower on the tunneled TPU (and tens of seconds on CPU CI); caching
# the compiled executables on disk makes every rerun of the same config (regression
# gates, bench reruns, restarted jobs) start in seconds. Opt out / redirect with
# JAYBENNE_CACHE_DIR ("" disables); an explicit user-set jax cache dir wins.
_cache_dir = _os.environ.get(
    "JAYBENNE_CACHE_DIR",
    _os.path.join(_os.path.expanduser("~"), ".cache", "jaybenne_tpu_xla"),
)
if _cache_dir and _jax.config.jax_compilation_cache_dir is None:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - never fatal
        pass

from . import config, driver, io, mesh, particles, state, step  # noqa: F401,E402
from .config import from_deck, from_file  # noqa: F401,E402

__version__ = "0.1.0"
