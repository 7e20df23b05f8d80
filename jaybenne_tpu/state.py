"""Simulation state pytrees.

The reference's field registry (``jaybenne::Initialize`` field registrations,
``/root/reference/src/jaybenne/jaybenne.cpp:236-260``; mcblock matter fields,
``src/mcblock/mcblock.cpp:67-75``) becomes one flat dataclass of dense arrays:

  * matter (host-adapter) fields: ``rho`` (field.material.density), ``sie``
    (field.material.sie), ``u`` (field.material.internal_energy) — jaybenne reads
    ``rho``/``sie`` and deposits into ``u`` exactly as the compile-time adapter
    prescribes (``src/jaybenne/jaybenne_config.hpp.in:19-30``);
  * radiation fields: ``energy_tally``, ``fleck``, ``energy_delta``, ``source_ew``,
    ``source_num`` (field.jaybenne.*);
  * DDMC face-probability fields as three face-centered arrays
    (``ddmc_px/py/pz`` ~ field.jaybenne.ddmc_face_prob on F1/F2/F3).

Cell arrays are ``[n_blocks, nz, ny, nx]``; face arrays gain one entry along their
axis. The whole state is a pytree, so a radiation step is a pure jitted
``(state, t, dt) -> state`` function.
"""

from __future__ import annotations

import jax.numpy as jnp

from .particles import ParticleLedger, empty_ledger
from .utils.tree import pytree_dataclass


@pytree_dataclass
class Fields:
    rho: jnp.ndarray
    sie: jnp.ndarray
    u: jnp.ndarray
    energy_tally: jnp.ndarray
    fleck: jnp.ndarray
    energy_delta: jnp.ndarray
    source_ew: jnp.ndarray
    source_num: jnp.ndarray
    ddmc_px: jnp.ndarray   # [B, nz, ny, nx+1]
    ddmc_py: jnp.ndarray   # [B, nz, ny+1, nx]
    ddmc_pz: jnp.ndarray   # [B, nz+1, ny, nx]


@pytree_dataclass
class SimState:
    fields: Fields
    particles: ParticleLedger
    t: jnp.ndarray        # scalar simulation time
    cycle: jnp.ndarray    # scalar int cycle counter
    rng_key: jnp.ndarray  # jax PRNG key
    overflow: jnp.ndarray # scalar int: sourced particles dropped due to full ledger


def empty_fields(n_blocks, nz, ny, nx, dtype=jnp.float32) -> Fields:
    c = lambda: jnp.zeros((n_blocks, nz, ny, nx), dtype=dtype)
    return Fields(
        rho=c(), sie=c(), u=c(),
        energy_tally=c(), fleck=c(), energy_delta=c(),
        source_ew=c(), source_num=c(),
        ddmc_px=jnp.zeros((n_blocks, nz, ny, nx + 1), dtype=dtype),
        ddmc_py=jnp.zeros((n_blocks, nz, ny + 1, nx), dtype=dtype),
        ddmc_pz=jnp.zeros((n_blocks, nz + 1, ny, nx), dtype=dtype),
    )


def initial_state(mesh, capacity, seed, dtype=jnp.float32) -> SimState:
    import jax

    return SimState(
        fields=empty_fields(mesh.n_blocks, mesh.nz, mesh.ny, mesh.nx, dtype),
        particles=empty_ledger(capacity, dtype),
        t=jnp.zeros((), dtype=jnp.float64 if dtype == jnp.float64 else jnp.float32),
        cycle=jnp.zeros((), dtype=jnp.int32),
        rng_key=jax.random.PRNGKey(seed),
        overflow=jnp.zeros((), dtype=jnp.int32),
    )
