"""Photon sourcing (thermal initialization and per-step emission).

TPU-native equivalent of ``SourcePhotons<T, SourceType>``
(``/root/reference/src/jaybenne/sourcing.cpp:25-208``). The reference's two-pass
scheme (per-cell counts + team prefix-scan, host ``AddEmptyParticles``, then a
per-cell fill kernel) becomes a fully vectorized candidate grid + rank-ordered
free-slot scatter:

  1. per cell: source energy ``erad`` — thermal ``(4 sb / c) T^4 dV`` or emission
     ``f * emis * dV * dt`` — and a stochastically rounded particle count
     ``n = floor(npc) + Bernoulli(npc - floor(npc))`` with per-particle weight
     ``erad / n`` (``sourcing.cpp:81-105``);
  2. a static candidate grid of shape ``[n_cells, floor(npc)+1]`` holds every
     potential birth; the Bernoulli tail masks the last column;
  3. valid candidates are ranked by prefix sum and scattered into the ledger's dead
     slots (dead-first stable ordering of the alive mask) — overflow beyond capacity
     is counted and dropped (reported via ``SimState.overflow``).

Deviation from the reference: per-cell ``npc`` here is ``num_particles /
total_mesh_cells`` so the whole mesh sources ~``num_particles`` regardless of the
block/rank partition; the reference divides by pack-block-count *and* total blocks
(``sourcing.cpp:68-69``), making the sourced count depend on the MPI layout. Tallied
energies are identical either way (weights are ``erad / n``), only sampling noise
differs.

Emission debits the per-cell ``energy_delta`` by the summed birth weights
(``sourcing.cpp:195-198``); birth times are uniform in the step (stored as
``tau ~ U[0,1)``), thermal births start at ``tau = 0``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import planck, rng


def source_photons(
    fields,
    particles,
    mesh,
    key,
    *,
    source_type: str,
    eos,
    opacity,
    sb: float,
    c: float,
    num_particles: int,
    dt,
    dtype,
):
    """Returns (fields, particles, n_dropped)."""
    assert source_type in ("thermal", "emission")
    B, nz, ny, nx = fields.rho.shape
    n_cells = B * nz * ny * nx

    temp = eos.temperature_from_density_internal_energy(fields.rho, fields.sie)
    dv = mesh.block_volume[:, None, None, None]  # [B,1,1,1]

    if source_type == "thermal":
        erad = (4.0 * sb / c) * temp**4 * dv
    else:
        emis = opacity.emissivity(fields.rho, temp)
        erad = fields.fleck * emis * dv * dt

    npc = float(num_particles) / float(n_cells)
    base = int(npc)
    frac = npc - base
    k_round, k_attr = jax.random.split(key)
    bern = rng.uniform(k_round, erad.shape, dtype) < frac
    n_cell = base + bern.astype(jnp.int32)  # [B,nz,ny,nx]
    ew = jnp.where(n_cell > 0, erad / jnp.maximum(n_cell, 1).astype(dtype), 0.0)
    ew = ew.astype(dtype)

    fields = dataclasses.replace(
        fields,
        source_num=n_cell.astype(dtype),
        source_ew=ew,
        energy_delta=(
            -(n_cell.astype(dtype) * ew)
            if source_type == "emission"
            else jnp.zeros_like(ew)
        ),
    )

    # ---- candidate grid ------------------------------------------------------
    K = base + 1  # static max births per cell
    C = n_cells
    n_flat = n_cell.reshape(C)
    valid = jnp.arange(K, dtype=jnp.int32)[None, :] < n_flat[:, None]  # [C, K]

    # cell decode for each candidate row
    cflat = jnp.arange(C, dtype=jnp.int32)
    i_c = cflat % nx
    j_c = (cflat // nx) % ny
    k_c = (cflat // (nx * ny)) % nz
    b_c = cflat // (nx * ny * nz)

    keys = jax.random.split(k_attr, 6)
    shape = (C, K)
    ux = rng.uniform(keys[0], shape, dtype)
    uy = rng.uniform(keys[1], shape, dtype)
    uz = rng.uniform(keys[2], shape, dtype)
    ndir = rng.isotropic_direction(keys[3], shape, dtype)

    dxv = mesh.block_dx[b_c]  # [C, 3]
    # block-local positions, uniform over the cell (sourcing.cpp:175-177)
    x = (i_c.astype(dtype)[:, None] + ux) * dxv[:, 0:1]
    y = (j_c.astype(dtype)[:, None] + uy) * dxv[:, 1:2]
    z = (k_c.astype(dtype)[:, None] + uz) * dxv[:, 2:3]
    # isotropic velocity; the reference samples (theta, phi) with the polar axis on z
    # (sourcing.cpp:180-185) — identical distribution
    vx = c * ndir[0]
    vy = c * ndir[1]
    vz = c * ndir[2]

    temp_c = temp.reshape(C).astype(dtype)
    energy = planck.sample_planck_energy(keys[4], sb, temp_c[:, None], shape, dtype)
    weight = jnp.broadcast_to(ew.reshape(C)[:, None], shape)
    if source_type == "emission":
        tau = rng.uniform(keys[5], shape, dtype)
    else:
        tau = jnp.zeros(shape, dtype)

    # ---- rank-ordered free-slot scatter -------------------------------------
    cap = particles.capacity
    vflat = valid.reshape(-1)
    rank = jnp.cumsum(vflat.astype(jnp.int32)) - 1  # rank among valid candidates
    # stable sort: dead slots (alive=False) first, in index order
    order = jnp.argsort(particles.alive, stable=True).astype(jnp.int32)
    n_dead = cap - particles.num_alive()
    ok = vflat & (rank < n_dead)
    n_dropped = jnp.sum(vflat) - jnp.sum(ok)
    dest = jnp.where(ok, order[jnp.clip(rank, 0, cap - 1)], cap)  # cap -> dropped

    def put(arr, val):
        return arr.at[dest].set(val.reshape(-1).astype(arr.dtype), mode="drop")

    bK = jnp.broadcast_to(b_c[:, None], shape)
    iK = jnp.broadcast_to(i_c[:, None], shape)
    jK = jnp.broadcast_to(j_c[:, None], shape)
    kK = jnp.broadcast_to(k_c[:, None], shape)
    particles = dataclasses.replace(
        particles,
        x=put(particles.x, x),
        y=put(particles.y, y),
        z=put(particles.z, z),
        vx=put(particles.vx, vx),
        vy=put(particles.vy, vy),
        vz=put(particles.vz, vz),
        tau=put(particles.tau, tau),
        weight=put(particles.weight, weight),
        energy=put(particles.energy, energy),
        block=put(particles.block, bK),
        i=put(particles.i, iK),
        j=put(particles.j, jK),
        k=put(particles.k, kK),
        alive=put(particles.alive, jnp.ones(shape, dtype=bool)),
        absorbed=put(particles.absorbed, jnp.zeros(shape, dtype=bool)),
    )
    return fields, particles, n_dropped
