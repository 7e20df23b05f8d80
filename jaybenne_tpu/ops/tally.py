"""Tallies and fluid feedback — atomic-free segment reductions.

TPU-native equivalents of:

  * ``EvaluateRadiationEnergy`` (``/root/reference/src/jaybenne/jaybenne.cpp:514-564``):
    zero + per-particle ``Kokkos::atomic_add(weight / dV)`` becomes one
    ``segment_sum`` over live particles' flat cell ids;
  * the absorption deposition (``transport.cpp:157-163``): one ``segment_sum`` over
    the ledger's ``absorbed`` mask, applied after the census loop;
  * ``UpdateFluid`` (``jaybenne.cpp:583-615``): ``u += energy_delta / dV``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _particle_cell(particles, mesh):
    return mesh.flat_cell(particles.block, particles.k, particles.j, particles.i)


def evaluate_radiation_energy(fields, particles, mesh, axis_name=None):
    """Radiation energy density per cell from live particle weights. With a sharded
    particle ledger (``axis_name``), the per-shard partial tallies are ``psum``-ed
    into the replicated field."""
    nc = mesh.total_cells
    cell = _particle_cell(particles, mesh)
    dv = mesh.block_volume[particles.block]
    contrib = jnp.where(particles.alive, particles.weight / dv, 0.0)
    tally = jax.ops.segment_sum(contrib, cell, num_segments=nc)
    if axis_name:
        tally = jax.lax.psum(tally, axis_name)
    return dataclasses.replace(
        fields, energy_tally=tally.reshape(fields.energy_tally.shape).astype(fields.energy_tally.dtype)
    )


def accumulate_absorption(fields, particles, mesh, axis_name=None):
    """Add absorbed particle weights into ``energy_delta`` (total energy units)."""
    nc = mesh.total_cells
    cell = _particle_cell(particles, mesh)
    contrib = jnp.where(particles.absorbed, particles.weight, 0.0)
    dep = jax.ops.segment_sum(contrib, cell, num_segments=nc)
    if axis_name:
        dep = jax.lax.psum(dep, axis_name)
    return dataclasses.replace(
        fields,
        energy_delta=fields.energy_delta + dep.reshape(fields.energy_delta.shape).astype(fields.energy_delta.dtype),
    )


def update_fluid(fields, mesh):
    """Apply net radiation-matter energy exchange to the matter internal energy."""
    dv = mesh.block_volume[:, None, None, None]
    u = fields.u + fields.energy_delta / dv
    return dataclasses.replace(fields, u=u, sie=u / fields.rho)
