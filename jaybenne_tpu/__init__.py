"""jaybenne_tpu — TPU-native Implicit Monte Carlo thermal photon transport.

A from-scratch JAX/XLA rebuild of the capabilities of lanl/jaybenne (IMC after Fleck &
Cummings 1971, with hybrid Discrete Diffusion Monte Carlo in optically thick cells, on
block-structured optionally statically-refined Cartesian meshes). See SURVEY.md at the
repository root for the reference analysis and the design mapping.
"""

from . import config, driver, io, mesh, particles, state, step  # noqa: F401
from .config import from_deck, from_file  # noqa: F401

__version__ = "0.1.0"
