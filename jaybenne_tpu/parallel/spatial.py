"""Spatial (block-sharded) distribution with particle migration.

The faithful TPU mapping of the reference's MPI decomposition (SURVEY §2d):
blocks are assigned contiguously to shards; particles live on the shard owning their
block; the per-step census loop becomes

    iterate {  local transport to census/exit  ->  all_to_all particle migration  }
    until psum(unfinished) == 0

which is exactly the reference's iterative task list (``jaybenne.cpp:113-131``:
transport -> swarm Send/Receive -> ``TaskQualifier::global_sync`` completion check),
with ``lax.all_to_all`` over ICI in place of per-neighbor MPI buffers and ``psum`` in
place of the allreduce.

Field COEFFICIENT arrays are computed on replicated matter fields and then sliced
per shard, so the hot transport gathers touch only the local ``[B_local]`` slice;
block METADATA (origins, sizes, lookup grid — a few KB) stays replicated, which is
what lets a shard compute the full block transition for an outgoing particle before
shipping it (no post-communication fixup pass). Migration uses fixed-size per-pair
buffers: overflowing particles simply stay in transit and ride the next iteration,
so no particle is ever dropped.

Prefer the particle-sharded strategy (``jaybenne_tpu.parallel.sharding``) unless the
mesh is too large to replicate: it needs no migration at all. This module exists for
(a) capability parity with the reference's decomposition, (b) the huge-mesh regime,
and (c) exercising the multi-chip communication path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import RunConfig
from ..particles import insert_particles
from ..state import SimState
from ..step import StepStats, make_transport_params
from ..ops import fleck as fleck_ops
from ..ops import rng, sourcing, tally
from ..ops import transport as transport_ops
from .sharding import state_specs

# particle fields shipped during migration
_MIGRATE_FIELDS = (
    "x", "y", "z", "vx", "vy", "vz", "tau", "weight", "energy",
    "block", "i", "j", "k", "face",
)

MAX_MIGRATION_ROUNDS = 128


def _pad_blocks(arr, n_pad, fill=0.0):
    if n_pad == 0:
        return arr
    pad_shape = (n_pad,) + arr.shape[1:]
    return jnp.concatenate([arr, jnp.full(pad_shape, fill, dtype=arr.dtype)])


def migrate(p, offset, blocks_per_shard, n_shards, K, axis_name):
    """One round of all_to_all particle migration. Particles flagged in transit
    (block outside the local range) are grouped by destination shard via a stable
    sort, packed into fixed ``[n_shards, K]`` buffers, exchanged, and inserted into
    the receiver's free slots. Returns (particles, n_received_dropped)."""
    cap = p.capacity
    in_transit = p.alive & (
        (p.block < offset) | (p.block >= offset + blocks_per_shard)
    )
    dest = jnp.clip(p.block // blocks_per_shard, 0, n_shards - 1)
    dest = jnp.where(in_transit, dest, n_shards)  # n_shards == "stay"

    order = jnp.argsort(dest, stable=True).astype(jnp.int32)
    sdest = dest[order]
    first = jnp.searchsorted(sdest, jnp.arange(n_shards + 1, dtype=sdest.dtype))
    rank_sorted = jnp.arange(cap, dtype=jnp.int32) - first[jnp.clip(sdest, 0, n_shards)]
    ok_sorted = (sdest < n_shards) & (rank_sorted < K)
    slot_sorted = jnp.where(ok_sorted, sdest * K + rank_sorted, n_shards * K)

    def pack(arr):
        buf = jnp.zeros((n_shards * K,), dtype=arr.dtype)
        return buf.at[slot_sorted].set(arr[order], mode="drop").reshape(n_shards, K)

    buffers = {name: pack(getattr(p, name)) for name in _MIGRATE_FIELDS}
    valid_buf = (
        jnp.zeros((n_shards * K,), dtype=bool)
        .at[slot_sorted]
        .set(in_transit[order], mode="drop")
        .reshape(n_shards, K)
    )

    # mark shipped particles dead locally
    sent = jnp.zeros((cap,), dtype=bool).at[order].set(ok_sorted & (sdest < n_shards))
    p = dataclasses.replace(p, alive=p.alive & ~sent)

    # exchange: out[j] on this shard = what shard j addressed to us
    def xchg(buf):
        return jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0, tiled=False)

    recv = {name: xchg(buf) for name, buf in buffers.items()}
    recv_valid = xchg(valid_buf)

    p, dropped = insert_particles(
        p, {name: arr.reshape(-1) for name, arr in recv.items()}, recv_valid.reshape(-1)
    )
    return p, dropped


def build_spatial_step_core(mesh, cfg: RunConfig, n_shards: int, axis_name="shard"):
    """Per-cycle step body for ``shard_map``: fields replicated, particles sharded by
    owning block, census via migration rounds + psum completion."""
    eos = cfg.mcblock.build_eos()
    opacity = cfg.mcblock.build_opacity()
    scattering = cfg.mcblock.build_scattering()
    consts = opacity.get_runtime_physical_constants()
    jb = cfg.jaybenne
    dtype = jb.dtype
    prm = make_transport_params(cfg, dtype)
    periodic = cfg.mesh.periodic_flags

    B = mesh.n_blocks
    Bl = -(-B // n_shards)  # blocks per shard (last shard may own padding)
    n_pad = n_shards * Bl - B
    ncells = mesh.ncells_per_block

    def owned_cell_mask(shard_idx):
        """[B, 1, 1, 1] mask of blocks owned by this shard."""
        bids = jnp.arange(B)
        own = (bids >= shard_idx * Bl) & (bids < (shard_idx + 1) * Bl)
        return own[:, None, None, None]

    def slice_local(arr4, shard_idx, fill):
        """Take this shard's [Bl, ...] block slice of a replicated [B, ...] array."""
        padded = _pad_blocks(arr4, n_pad, fill)
        return jax.lax.dynamic_slice_in_dim(padded, shard_idx * Bl, Bl, axis=0)

    def step(state, dt):
        f = state.fields
        p = state.particles
        shard = jax.lax.axis_index(axis_name)
        offset = shard * Bl
        key = jax.random.fold_in(state.rng_key, state.cycle)
        key = jax.random.fold_in(key, shard)
        k_src, k_tr = jax.random.split(key)

        # 1. derived fields on the replicated matter state
        f = dataclasses.replace(
            f, fleck=fleck_ops.fleck_factor(f.rho, f.sie, eos, opacity, dt, dtype)
        )
        if jb.use_ddmc:
            temp = eos.temperature_from_density_internal_energy(f.rho, f.sie)
            sig_t = (
                opacity.absorption_coefficient(f.rho, temp, 1.0)
                + scattering.total_scattering_coefficient(f.rho, temp, 1.0)
            )
            sig_t = jnp.broadcast_to(jnp.asarray(sig_t, dtype), f.rho.shape)
            px, py, pz = fleck_ops.ddmc_face_probs(
                mesh, sig_t, jb.tau_ddmc, periodic, dtype
            )
            f = dataclasses.replace(f, ddmc_px=px, ddmc_py=py, ddmc_pz=pz)

        # 2. emission sourcing into OWNED blocks only: each cell is sourced by
        # exactly one shard; psum of the masked per-cell counts reproduces the
        # global count for the weights
        dropped = jnp.zeros((), jnp.int32)
        if jb.do_emission:
            f, p, dropped = sourcing.source_photons(
                f, p, mesh, k_src,
                source_type="emission",
                eos=eos, opacity=opacity,
                sb=consts.sb, c=consts.c,
                num_particles=jb.num_particles,
                dt=dt, dtype=dtype,
                axis_name=axis_name,
                cell_mask=owned_cell_mask(shard),
            )
            dropped = dropped.astype(jnp.int32)
        else:
            f = dataclasses.replace(f, energy_delta=jnp.zeros_like(f.energy_delta))

        # 3. census loop with migration (jaybenne.cpp:113-131)
        coefs_full = transport_ops.precompute_coefs(
            f, mesh, eos, opacity, scattering, jb.use_ddmc, dtype
        )
        sa_l = slice_local(coefs_full.sigma_a.reshape(B, ncells), shard, 0.0).reshape(-1)
        ss_l = slice_local(coefs_full.sigma_s.reshape(B, ncells), shard, 0.0).reshape(-1)
        ff_l = slice_local(coefs_full.fleck.reshape(B, ncells), shard, 1.0).reshape(-1)
        coefs_local = transport_ops.TransportCoefs(
            sigma_a=sa_l,
            sigma_s=ss_l,
            fleck=ff_l,
            packed=jnp.stack([sa_l, ss_l, ff_l], axis=-1),
            px=slice_local(coefs_full.px, shard, 0.0),
            py=slice_local(coefs_full.py, shard, 0.0),
            pz=slice_local(coefs_full.pz, shard, 0.0),
        )
        K = max(64, p.capacity // (2 * n_shards))

        def round_body(carry):
            p, rounds, iters_acc, ev_acc, drop_acc, _ = carry
            p, iters, ev = transport_ops.transport(
                p, coefs_local, mesh, rng.fold(k_tr, rounds), prm, dt,
                block_offset=offset,
            )
            p, mig_dropped = migrate(p, offset, Bl, n_shards, K, axis_name)
            local_unfinished = jnp.sum((p.alive & (p.tau < 1.0)).astype(jnp.int32))
            unfinished = jax.lax.psum(local_unfinished, axis_name)
            return (
                p, rounds + 1, iters_acc + iters, ev_acc + ev,
                drop_acc + mig_dropped.astype(jnp.int32), unfinished,
            )

        def round_cond(carry):
            _, rounds, _, _, _, unfinished = carry
            return (rounds < MAX_MIGRATION_ROUNDS) & (unfinished > 0)

        p, rounds, iters, events, mig_drop, _ = jax.lax.while_loop(
            round_cond,
            round_body,
            (p, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.ones((), jnp.int32)),
        )
        dropped = dropped + mig_drop

        # 4./5. tallies + feedback on replicated fields
        f = tally.accumulate_absorption(f, p, mesh, axis_name)
        f = tally.evaluate_radiation_energy(f, p, mesh, axis_name)
        if jb.do_feedback:
            f = tally.update_fluid(f, mesh)

        p = dataclasses.replace(
            p, absorbed=jnp.zeros_like(p.absorbed), tau=jnp.zeros_like(p.tau)
        )

        new_state = dataclasses.replace(
            state,
            fields=f,
            particles=p,
            t=state.t + dt,
            cycle=state.cycle + 1,
            overflow=state.overflow + jax.lax.psum(dropped, axis_name),
        )
        stats = StepStats(
            iterations=jax.lax.pmax(iters, axis_name),
            events=jax.lax.psum(events, axis_name),
            n_alive=jax.lax.psum(p.num_alive(), axis_name),
            dropped=jax.lax.psum(dropped, axis_name),
        )
        return new_state, stats

    return step


def make_spatial_step(mesh, cfg: RunConfig, dmesh):
    n = dmesh.devices.size
    core = build_spatial_step_core(mesh, cfg, n)

    def run(state, dt):
        specs = state_specs(state)
        stats_spec = StepStats(iterations=P(), events=P(), n_alive=P(), dropped=P())
        fn = jax.shard_map(
            core, mesh=dmesh,
            in_specs=(specs, P()), out_specs=(specs, stats_spec),
            check_vma=False,
        )
        return fn(state, dt)

    return jax.jit(run)


def make_spatial_init(mesh, cfg: RunConfig, dmesh):
    """Sharded thermal init: each shard sources its OWNED blocks' cells."""
    from ..config import InitialRadiation

    n = dmesh.devices.size
    B = mesh.n_blocks
    Bl = -(-B // n)
    eos = cfg.mcblock.build_eos()
    opacity = cfg.mcblock.build_opacity()
    consts = opacity.get_runtime_physical_constants()
    jb = cfg.jaybenne

    def core(state):
        f, p = state.fields, state.particles
        shard = jax.lax.axis_index("shard")
        dropped = jnp.zeros((), jnp.int32)
        if cfg.mcblock.initial_radiation == InitialRadiation.thermal:
            bids = jnp.arange(B)
            own = ((bids >= shard * Bl) & (bids < (shard + 1) * Bl))[:, None, None, None]
            key = jax.random.fold_in(state.rng_key, 0x7FFFFFFF)
            key = jax.random.fold_in(key, shard)
            f, p, dropped = sourcing.source_photons(
                f, p, mesh, key,
                source_type="thermal",
                eos=eos, opacity=opacity,
                sb=consts.sb, c=consts.c,
                num_particles=jb.num_particles,
                dt=0.0, dtype=jb.dtype,
                axis_name="shard",
                cell_mask=own,
            )
            dropped = jnp.asarray(dropped, jnp.int32)
        f = tally.evaluate_radiation_energy(f, p, mesh, "shard")
        return dataclasses.replace(
            state, fields=f, particles=p,
            overflow=state.overflow + jax.lax.psum(dropped, "shard"),
        )

    def run(state):
        specs = state_specs(state)
        fn = jax.shard_map(
            core, mesh=dmesh, in_specs=(specs,), out_specs=specs, check_vma=False
        )
        return fn(state)

    return jax.jit(run)
