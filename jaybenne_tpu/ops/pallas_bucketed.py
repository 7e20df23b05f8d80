"""Bucketed Pallas transport for meshes beyond VMEM residency.

The full-residency kernel (``ops/pallas_transport.py``) keeps every coefficient
table in VMEM, which caps the mesh at O(5k) cells. This module removes that cap
with the classic particle-in-cell locality play, mapped onto the Pallas pipeline:

  1. each census round, particles are bucketed by mesh REGION — a compact
     axis-aligned box of blocks whose coefficient slab fits one VMEM block —
     into a tile-aligned reorder buffer (a stable sort + scatter in plain XLA);
  2. the kernel runs a grid of ``BTILE``-particle tiles; a scalar-prefetched
     per-tile region id drives the BlockSpec index maps, so Pallas DMAs exactly
     the tile's region slab (cell coefficients + DDMC face probs) from HBM,
     double-buffered against compute — consecutive tiles of the same region
     reuse the resident slab without re-fetching;
  3. inside the kernel each tile iterates its particles to census; a particle
     that walks OUT of the tile's region pauses (carried ``paused`` mask) and is
     re-bucketed by the next round. Block geometry, the block-lookup grid, and
     the block->region/slot maps stay fully VMEM-resident (chunked lane tables —
     they are O(blocks), not O(cells)).

This is the reference's own structure — transport until off-block, communicate,
repeat (``jaybenne.cpp:113-131``) — with "communicate" replaced by an on-chip
re-sort. Regions are chosen COMPACT (cubic where possible, built statically from
block centers) so the exit rate scales with surface/volume: for diffusive
problems almost every particle finishes inside its region in round one and the
round count is set by the short tail of boundary-walkers. Tiles are wide
(``BSUB`` sublane groups) to amortize the fixed per-iteration cost of the
census ``while_loop`` over many particles.

Physics is the same event body as the full-residency kernel: IMC
(``ptcl_transport_step``, reference ``transport_utils.hpp:111-160``) plus the
DDMC branch with the face-flag albedo test. Scope: uniform AND refined (SMR)
meshes, IMC and DDMC alike. A DDMC leak into a FINER block needs the
destination's fine-face probabilities (reference ``SampleDDMCBlockFace``,
``sample_ddmc_bface.cpp:81-427``), which may live in another region's slab, so
the kernel records a pending-leak code (±(axis+1), the XLA path's encoding),
PAUSES the particle, and the host applies
``ops/transport.py::_ddmc_subface_resample`` between rounds — the same
post-communication fixup pass the spatial decomposition uses.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BC
from . import pallas_rng as rng
from .pallas_transport import (
    GREP,
    LANES,
    RANGED_GATHER,
    RANGED_MIN_CHUNKS,
    _bf16_hi,
    _bf16_lo,
    _chunk_table,
    _gather,
    _gather_ranged,
    _ranged_plan,
    census_while,
    _face_pair_vectors,
    _n_bchunks,
    _n_tchunks,
    _pack_bf16_pair,
)

BSUB = 16                  # sublane groups per bucketed tile. Trades lane
#   occupancy against fixed per-iteration cost: regions hold ~1e3 particles at
#   production densities, so 8192-lane tiles ran mostly empty; 2048-lane tiles
#   pack ~4x denser and per-iteration cost scales with tile size (same tuning
#   as ops/pallas_grid.py, measured there on v5e).
BTILE = BSUB * LANES       # particles per tile
REGION_CELLS_IMC = 8192    # target cells per region slab (IMC: 1 gathered table)
REGION_CELLS_DDMC = 2048   # smaller for DDMC: 3 cell + 3 face tables per event
MAX_REGION_CHUNKS = 64     # slab gather cost cap (range-selects per table read)
# Block-table budget for THIS kernel (block geometry / lookup / region-map
# chunks, resident in VMEM and scanned on block transitions). The VMEM
# mega-kernel keeps MAX_BLOCK_CHUNKS=4 — it must also hold every CELL table —
# but here cell data is region-sliced, so a wider block budget only adds
# ~3 vector ops per chunk to the transition gathers while keeping meshes of
# up to ~2048 blocks / lookup tiles on the kernel path instead of falling
# back to the ~100x-slower XLA loop.
MAX_BLOCK_CHUNKS_BUCKETED = 16
MAX_BUCKET_ROUNDS = 256    # outer re-bucketing rounds (hang backstop)


def _pack_regions(rid, B):
    """Dense-reindex a raw region id per block into (region_of, slot, lists)."""
    uniq, region_of = np.unique(rid, return_inverse=True)
    R = len(uniq)
    order = np.argsort(region_of, kind="stable")
    sorted_r = region_of[order]
    first = np.searchsorted(sorted_r, np.arange(R))
    ranks = np.arange(B) - first[sorted_r]
    slot = np.empty(B, np.int32)
    slot[order] = ranks.astype(np.int32)
    maxbpr = int(ranks.max()) + 1 if B else 1
    return region_of.astype(np.int32), slot, sorted_r, ranks, order, R, maxbpr


def _build_regions(mesh, target_cells, ids=None):
    """Static region decomposition: partition blocks into compact axis-aligned
    boxes of <= ``target_cells`` cells by bisecting the domain (longest axis
    first, never finer than the block-lookup grid), assigning each block by its
    center. Runs in numpy at trace time — the mesh is static.

    Returns TWO layouts sharing one slab geometry: the base grid and a grid
    shifted by half a region along every split axis. Rounds alternate between
    them so a particle random-walking at a base-grid face (which it would
    re-cross O(sqrt(events)) times, pausing each time) sits deep inside a
    shifted-grid region on the next round and runs to census.

    ``ids``: optional array of block ids to partition (spatial decomposition —
    each shard's owned blocks); region_of/slot entries and perm values are then
    POSITIONS into ``ids`` (pad = len(ids)), which for a contiguous shard range
    are exactly the shard-local block indices.

    Returns ``(region_of[2, B], slot[2, B], perm[2, R, maxbpr], R, maxbpr)``
    with region ids dense per parity (pad perm entries = B)."""
    if ids is None:
        B = mesh.n_blocks
        sel = np.arange(B, dtype=np.int64)
    else:
        sel = np.asarray(ids, dtype=np.int64)
        B = len(sel)
    ncpb = mesh.ncells_per_block
    org = np.asarray(mesh.block_origin, np.float64)[sel]
    bdx = np.asarray(mesh.block_dx, np.float64)[sel]
    ctr = org + 0.5 * bdx * np.array([mesh.nx, mesh.ny, mesh.nz], np.float64)
    x1min, x1max, x2min, x2max, x3min, x3max = mesh.bounds
    lo = np.array([x1min, x2min, x3min], np.float64)
    ext = np.maximum(
        np.array([x1max, x2max, x3max], np.float64) - lo, np.finfo(np.float64).tiny
    )
    ntz, nty, ntx = mesh.tile_shape
    nt = np.array([ntx, nty, ntz], np.int64)
    grid = np.ones(3, np.int64)

    def assign(g, shift=0.0):
        fx = (ctr - lo) / ext * g + shift
        ix = np.clip(fx.astype(np.int64), 0, g)  # shifted grid gets g+1 slots
        return (ix[:, 2] * (g[1] + 1) + ix[:, 1]) * (g[0] + 1) + ix[:, 0]

    def max_cells(rid):
        return int(np.bincount(np.unique(rid, return_inverse=True)[1]).max()) * ncpb

    rid = assign(grid)
    while max_cells(rid) > target_cells:
        cand = [a for a in range(3) if grid[a] < nt[a]]
        if not cand:
            break  # one block per region is the floor; supports() gates K_reg
        a = max(cand, key=lambda a: ext[a] / grid[a])
        grid[a] *= 2
        rid = assign(grid)

    shift = np.where(grid > 1, 0.5, 0.0)
    layouts = [_pack_regions(assign(grid), B), _pack_regions(assign(grid, shift), B)]
    R = max(l[5] for l in layouts)
    maxbpr = max(l[6] for l in layouts)
    region_of = np.stack([l[0] for l in layouts])
    slot = np.stack([l[1] for l in layouts])
    perm = np.full((2, R, maxbpr), B, np.int32)
    for pi, (_, _, sorted_r, ranks, order, _, _) in enumerate(layouts):
        perm[pi, sorted_r, ranks] = order.astype(np.int32)
    return region_of, slot, perm, R, maxbpr


def _region_layout(mesh, use_ddmc=False):
    """(maxbpr, R, K_reg): blocks per region slab, region count, slab chunks."""
    target = max(
        REGION_CELLS_DDMC if use_ddmc else REGION_CELLS_IMC, mesh.ncells_per_block
    )
    _, _, _, R, maxbpr = _build_regions(mesh, target)
    K_reg = -(-(maxbpr * mesh.ncells_per_block) // LANES)
    return maxbpr, R, K_reg


def _parity_tables(build, perm2):
    """Stack a per-parity slab-table builder over the two region layouts."""
    return jnp.stack([build(perm2[0]), build(perm2[1])])




def supports(mesh, prm) -> bool:
    """Bucketed coverage: any mesh whose BLOCK-level tables fit the chunked-lane
    budget; cell tables are unbounded (region-sliced from HBM). SMR+DDMC is
    handled via the pending-leak pause + host subface resample (module doc).
    Every region slab (coefficient pair + DDMC per-cell face pairs) is
    cell-indexed, so K_reg is the only scan bound."""
    maxbpr, R, K_reg = _region_layout(mesh, prm.use_ddmc)
    return (
        K_reg <= MAX_REGION_CHUNKS
        and _n_bchunks(mesh) <= MAX_BLOCK_CHUNKS_BUCKETED
        and _n_tchunks(mesh) <= MAX_BLOCK_CHUNKS_BUCKETED
    )


def _region_tables(vec, perm, per_block, K_reg, dtype):
    """[B * per_block] -> [(R+1) * K_reg * GREP, LANES]: per-region slabs of
    ``maxbpr * per_block`` values (region's blocks gathered via ``perm``) in
    chunked-lane layout, plus one extra ZERO slab for the dead tail tiles."""
    R, maxbpr = perm.shape
    B = vec.shape[0] // per_block
    mat = jnp.concatenate(
        [vec.reshape(B, per_block).astype(dtype), jnp.zeros((1, per_block), dtype)]
    )
    slabs = mat[perm].reshape(R, maxbpr * per_block)
    tabs = jax.vmap(lambda s: _chunk_table(s, dtype, K_reg))(slabs)
    zero = jnp.zeros((1, K_reg * GREP, LANES), dtype)
    return jnp.concatenate([tabs, zero], axis=0).reshape(-1, LANES)


def _bucketed_kernel(
    regions_ref,  # scalar prefetch: i32[grid] region id per tile
    scal_ref,     # SMEM f32[8]: dt, c
    seed_ref,     # SMEM i32[1]
    x_ref, y_ref, z_ref, vx_ref, vy_ref, vz_ref, tau_ref,
    en_ref,                       # particle photon energy — read-only model
    #   input for the non-gray path (per-refresh opacity evaluation); gray
    #   configs pass one constant-index dummy block
    blk_ref, ci_ref, cj_ref, ck_ref, alive_ref, absorbed_ref, face_ref,
    leak_ref,                     # pending coarse->fine DDMC leak code
    pk_ref,                       # region slab (blocked by index_map). Gray:
    #   the derived collision-rate PAIR ea = fleck*sigma_a and es = sigma_s +
    #   (1-fleck)*sigma_a, bf16-packed into one i32 word per cell
    #   (_pack_bf16_pair); every coefficient use derives from the pair
    #   (sigma_t = ea + es) -> ONE gathered table. Non-gray: rho (f32) — the
    #   kernel evaluates the models per refresh at the particle's photon
    #   energy, like the reference (transport.cpp:122-127).
    t2_ref, f3_ref,               # non-gray only: temperature / Fleck slabs
    fpx_ref, fpy_ref, fpz_ref,    # region face-prob slabs, PER-CELL pairs:
    #   word c of axis a holds (P_lower, P_upper) of cell c bf16-packed —
    #   gathered with the same `cell` index as the coefficients (K_reg chunks)
    bdx_ref, bdy_ref, bdz_ref,    # fully resident block geometry (chunked)
    box_ref, boy_ref, boz_ref,
    lut_ref,
    reg_ref, slot_ref,            # block -> region id / slab slot (chunked)
    blv_ref,                      # block refinement level (chunked)
    ox_ref, oy_ref, oz_ref, ovx_ref, ovy_ref, ovz_ref, otau_ref, oen_ref,
    oblk_ref, oci_ref, ocj_ref, ock_ref, oalive_ref, oabsorbed_ref, oface_ref,
    oleak_ref,
    ev_ref, it_ref,
    *,
    prm_static,
    opacity=None,
    scattering=None,
):
    (ndim, nx, ny, nz, max_iters, bcs, bounds, tile_shape, finest,
     has_absorption, interpret, use_ddmc, tau_ddmc, eps_imc, eps_ddmc,
     maxbpr, K_reg, Kf_reg, nb_chunks, nt_chunks, has_smr,
     nongray) = prm_static
    multi_d = ndim >= 2
    three_d = ndim == 3
    dt = scal_ref[0]
    c = scal_ref[1]
    x1min, x1max, x2min, x2max, x3min, x3max = bounds
    ntz, nty, ntx = tile_shape
    tsx = (x1max - x1min) / ntx
    tsy = (x2max - x2min) / nty
    tsz = (x3max - x3min) / ntz
    ncpb = nx * ny * nz

    shape = (BSUB, LANES)
    BIG = jnp.float32(3.0e38)
    tiny = jnp.float32(1.0e-37)
    tr = regions_ref[pl.program_id(0)]

    # paired 16-bit / full 23-bit uniform variates (see ops/pallas_rng.py)
    raw_bits = rng.make_raw_bits(
        shape, seed_ref[0], pl.program_id(0) * BTILE, interpret
    )
    inv_c = jnp.float32(1.0) / c
    inv_cdt = jnp.float32(1.0) / (c * dt)
    inv_dt = jnp.float32(1.0) / dt

    # sigma-refresh cadence (see pallas_grid.SIGMA_REFRESH): the region-slab
    # coefficient scans (K_reg/Kf_reg chunks) run only every R_ref iterations
    # under a scalar cond; lanes whose (block, cell) changed since the last
    # refresh stall until the next one. Block-table gathers (nb_chunks — a
    # handful of chunks) stay per-iteration: crossings need them immediately
    # and they are cheap. 1 disables the machinery (constant-folds away).
    from . import pallas_grid as _pg

    scan_chunks = K_reg + (sum(Kf_reg) if use_ddmc else 0)
    R_ref = _pg.SIGMA_REFRESH if scan_chunks > _pg.SIGMA_SCAN_MIN_CHUNKS else 1
    # carried coefficients between refreshes: gray carries the packed (ea,es)
    # word, non-gray the two f32 rates evaluated at refresh; DDMC adds 3
    # face-pair words
    n_head = 2 if nongray else 1
    n_coef = n_head + (3 if use_ddmc else 0)

    def body(carry):
        (x, y, z, vx, vy, vz, tau, blk, ci, cj, ck, alive, absorbed, face,
         leak) = carry[:15]
        coef_c = carry[15:15 + n_coef]
        stale, paused, it, ev = carry[-4], carry[-3], carry[-2], carry[-1]
        if _pg.FLOOR_ITERS:
            # floor-probe mode (see pallas_grid.FLOOR_ITERS): full carry, no
            # gathers/RNG/physics — this kernel's empty-loop floor
            act = (alive != 0) & (tau < 1.0) & (paused == 0)
            ntau_f = jnp.where(
                act,
                jnp.minimum(tau + jnp.float32(1.0 / _pg.FLOOR_ITERS), 1.0),
                tau,
            )
            return (
                x, y, z, vx, vy, vz, ntau_f, blk, ci, cj, ck, alive,
                absorbed, face, leak,
            ) + tuple(coef_c) + (
                stale, paused, it + 1, ev + act.astype(jnp.int32),
            )
        pool = rng.DrawPool(raw_bits)
        blk_rel = jnp.clip(_gather(slot_ref, blk, nb_chunks), 0, maxbpr - 1)

        dxb = _gather(bdx_ref, blk, nb_chunks)
        dyb = _gather(bdy_ref, blk, nb_chunks)
        dzb = _gather(bdz_ref, blk, nb_chunks)
        # transport scale over transport dims only (matches pallas_grid /
        # ops/transport.py; transverse extents are not transport scales)
        if three_d:
            dmin = jnp.minimum(dxb, jnp.minimum(dyb, dzb))
        elif multi_d:
            dmin = jnp.minimum(dxb, dyb)
        else:
            dmin = dxb
        cell = blk_rel * ncpb + (ck * ny + cj) * nx + ci

        # ranged scans (see pallas_grid): lanes that can still transport this
        # round bound each group's chunk loop; paused/finished lanes outside
        # the range read zeros and never consume them
        ranged = RANGED_GATHER and K_reg >= RANGED_MIN_CHUNKS
        if ranged:
            live = (alive != 0) & (tau < 1.0) & (paused == 0)

        def gather_coefs(_):
            # every value the loop needs is gathered with the same per-cell
            # index. Gray: the bf16-packed (ea, es) PAIR word — 1 scan.
            # Non-gray: (rho, T, fleck) — 3 scans — then the models evaluate
            # at the particle's photon energy and the derived rates ride the
            # carry until the next refresh (energy and cell are both constant
            # between refreshes). DDMC adds 3 (P_lower, P_upper) face words.
            if ranged:
                plan = _ranged_plan(cell, live, K_reg)
                gat = lambda ref, K: _gather_ranged(ref, plan)
            else:
                gat = lambda ref, K: _gather(ref, cell, K)
            if nongray:
                rho_g = gat(pk_ref, K_reg)
                tt_g = gat(t2_ref, K_reg)
                ff = gat(f3_ref, K_reg)
                sa = jnp.broadcast_to(
                    opacity.absorption_coefficient(rho_g, tt_g, energy)
                    .astype(jnp.float32),
                    shape,
                )
                ss = jnp.broadcast_to(
                    scattering.total_scattering_coefficient(rho_g, tt_g, energy)
                    .astype(jnp.float32),
                    shape,
                )
                ea_r = ff * sa
                es_r = ss + (1.0 - ff) * sa
                if use_ddmc:
                    head = (ea_r, es_r)
                else:
                    # non-DDMC consumes only (branch prob, 1/sig_t): derive
                    # them at refresh so the divide leaves the iteration
                    inv_r = 1.0 / (ea_r + es_r + tiny)
                    head = (ea_r * inv_r, inv_r)
            else:
                head = (gat(pk_ref, K_reg),)
            if not use_ddmc:
                return head
            fpx = gat(fpx_ref, Kf_reg[0])
            fpy = (
                gat(fpy_ref, Kf_reg[1])
                if multi_d else jnp.zeros(shape, jnp.int32)
            )
            fpz = (
                gat(fpz_ref, Kf_reg[2])
                if three_d else jnp.zeros(shape, jnp.int32)
            )
            return head + (fpx, fpy, fpz)

        if R_ref == 1:
            coefs = gather_coefs(None)
            stale = jnp.zeros_like(stale)
        else:
            refresh = (it % jnp.int32(R_ref)) == 0
            coefs = jax.lax.cond(
                refresh, gather_coefs, lambda _: tuple(coef_c), None
            )
            stale = jnp.where(refresh, jnp.zeros_like(stale), stale)
        inv_sigt = p_abs = None  # non-DDMC carries these instead of (ea, es)
        if nongray:
            if use_ddmc:
                ea, es = coefs[0], coefs[1]
            else:
                p_abs, inv_sigt = coefs[0], coefs[1]
        elif use_ddmc:
            es = _bf16_lo(coefs[0])
            ea = _bf16_hi(coefs[0]) if has_absorption else jnp.zeros(shape)
        else:
            # gray non-DDMC pair word is (p_abs, 1/sig_t), packed host-side
            inv_sigt = _bf16_lo(coefs[0])
            p_abs = _bf16_hi(coefs[0]) if has_absorption else None
        active = (alive != 0) & (tau < 1.0) & (paused == 0) & (stale == 0)

        fi = ci.astype(jnp.float32)
        fj = cj.astype(jnp.float32)
        fk = ck.astype(jnp.float32)
        xl, xu = fi * dxb, (fi + 1.0) * dxb
        yl, yu = fj * dyb, (fj + 1.0) * dyb
        zl, zu = fk * dzb, (fk + 1.0) * dzb

        if use_ddmc:
            is_ddmc = active & (dmin * (ea + es) > jnp.float32(tau_ddmc))
            act_imc = active & ~is_ddmc
        else:
            is_ddmc = jnp.zeros(shape, bool)
            act_imc = active

        # competing-risks collision sampling: one exponential at the total
        # rate + a branch uniform (identical in distribution to the separate
        # absorption/scattering exponential min; one log cheaper). Non-DDMC
        # paths carry 1/sig_t, turning the divide into a multiply.
        if inv_sigt is not None:
            d_coll = pool.exp23(it) * inv_sigt
        else:
            sig_c = (ea + es) if has_absorption else es
            d_coll = pool.exp23(it) / (sig_c + tiny)
        u_branch = pool.u23(it) if has_absorption else None
        d_end = c * dt * (1.0 - tau)
        d_geom = jnp.minimum(dmin, d_end)

        def face_dist(v, lo, hi, q):
            # one select + one divide: the exit face is hi for v > 0, lo for
            # v < 0, and either signed difference over v is >= 0; v == 0
            # lanes divide by the guard value and are overridden to BIG
            tgt = jnp.where(v > 0, hi, lo)
            d = c * (tgt - q) / jnp.where(v != 0, v, 1.0)
            return jnp.where(v != 0, d, BIG)

        fxd = face_dist(vx, xl, xu, x)
        fyd = face_dist(vy, yl, yu, y) if multi_d else jnp.full(shape, BIG)
        fzd = face_dist(vz, zl, zu, z) if three_d else jnp.full(shape, BIG)

        d_push = jnp.minimum(jnp.minimum(d_geom, fxd), jnp.minimum(fyd, fzd))
        coll = act_imc & (d_coll < d_push)
        if has_absorption:
            if p_abs is not None:
                i_abs = coll & (u_branch < p_abs)
            else:
                i_abs = coll & (u_branch * sig_c < ea)
            i_sc = coll & ~i_abs
        else:
            i_abs = jnp.zeros(shape, bool)
            i_sc = coll
        no_coll = act_imc & ~coll
        cr_x = no_coll & (fxd <= fyd) & (fxd <= fzd) & (fxd <= d_geom)
        cr_y = no_coll & ~cr_x & (fyd <= fzd) & (fyd <= d_geom)
        cr_z = no_coll & ~cr_x & ~cr_y & (fzd <= d_geom)
        i_census = no_coll & ~cr_x & ~cr_y & ~cr_z & (d_end <= dmin)

        d = jnp.where(coll, d_coll, d_push)
        # zero the step for census/dead/paused/stale lanes: every downstream
        # update degenerates to the identity, replacing the per-field
        # end-of-body selects with this single one
        d = jnp.where(active, d, 0.0)
        ntau = jnp.where(i_census, 1.0, tau + d * inv_cdt)
        step = d * inv_c
        nx_ = x + vx * step
        ny_ = y + vy * step if multi_d else y
        nz_ = z + vz * step if three_d else z
        nx_ = jnp.where(cr_x, jnp.where(vx > 0, xu, xl), nx_)
        ny_ = jnp.where(cr_y, jnp.where(vy > 0, yu, yl), ny_)
        nz_ = jnp.where(cr_z, jnp.where(vz > 0, zu, zl), nz_)
        nci = ci + jnp.where(cr_x, jnp.where(vx > 0, 1, -1), 0)
        ncj = cj + jnp.where(cr_y, jnp.where(vy > 0, 1, -1), 0)
        nck = ck + jnp.where(cr_z, jnp.where(vz > 0, 1, -1), 0)

        # 1D: azimuth is unobservable (slab symmetry) — draw the x-projection
        # directly and park the transverse magnitude in vy (|v| = c holds);
        # skips the circle word + cos (see pallas_transport.py)
        mu = 1.0 - 2.0 * pool.u16(it)
        st = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        if multi_d:
            cph, sph = pool.circle(it)  # one transcendental, not cos+sin
            nvx = jnp.where(i_sc, c * st * cph, vx)
            nvy = jnp.where(i_sc, c * st * sph, vy)
            nvz = jnp.where(i_sc, c * mu, vz)
        else:
            nvx = jnp.where(i_sc, c * mu, vx)
            nvy = jnp.where(i_sc, c * st, vy)
            nvz = jnp.where(i_sc, 0.0, vz)

        nalive = jnp.where(i_abs, 0, alive)
        nabsorbed = jnp.where(i_abs, 1, absorbed)
        # only the DDMC at-face albedo test reads the face code — skip when off
        if use_ddmc:
            nface = jnp.where(cr_x, jnp.where(vx > 0, 1, -1), 0).astype(jnp.int32)
            nface = jnp.where(cr_y, jnp.where(vy > 0, 2, -2), nface)
            nface = jnp.where(cr_z, jnp.where(vz > 0, 3, -3), nface)
        else:
            nface = face

        # ================= DDMC branch (face-flag albedo + ptcl_ddmc_step) ====
        if use_ddmc:
            sig_t = ea + es
            sel = [
                is_ddmc & (face == 1),
                is_ddmc & (face == -1),
                is_ddmc & (face == 2),
                is_ddmc & (face == -2),
                is_ddmc & (face == 3),
                is_ddmc & (face == -3),
            ]
            at_face = is_ddmc & (face != 0)

            lam2 = jnp.float32(2.0 * 0.7104)
            P = jnp.zeros(shape)
            for ax, (fdx_, fv) in enumerate(((dxb, vx), (dyb, vy), (dzb, vz))):
                # one divide per axis feeds both face entries
                Pf2 = 2.0 * (2.0 / 3.0) / (sig_t * fdx_ + lam2)
                drift = 1.5 * fv * inv_c
                P = jnp.where(sel[2 * ax], Pf2 * (1.0 + drift), P)
                P = jnp.where(sel[2 * ax + 1], Pf2 * (1.0 - drift), P)
            rejected = at_face & (pool.u23(it) > P)

            amu = jnp.sqrt(pool.u16(it))
            anu = jnp.sqrt(jnp.maximum(1.0 - amu * amu, 0.0))
            if multi_d:
                aph, ash = pool.circle(it)
                a1, a2, a3 = amu, anu * aph, anu * ash
            else:  # 1D: azimuth unobservable
                a1, a2, a3 = amu, anu, jnp.zeros(shape)

            rj_x, rj_y, rj_z = x, y, z
            rj_vx, rj_vy, rj_vz = vx, vy, vz
            rj_si = jnp.zeros(shape, jnp.int32)
            rj_sj = jnp.zeros(shape, jnp.int32)
            rj_sk = jnp.zeros(shape, jnp.int32)
            eps_i = jnp.float32(eps_imc)
            for m, axis, lower in (
                (sel[0], 0, True), (sel[1], 0, False),
                (sel[2], 1, True), (sel[3], 1, False),
                (sel[4], 2, True), (sel[5], 2, False),
            ):
                sgn = jnp.float32(-1.0 if lower else 1.0)
                v1, v2, v3 = c * sgn * a1, c * a2, c * a3
                if axis == 0:
                    rj_vx = jnp.where(m, v1, rj_vx)
                    rj_vy = jnp.where(m, v2, rj_vy)
                    rj_vz = jnp.where(m, v3, rj_vz)
                    rj_x = jnp.where(m, jnp.where(lower, xl - eps_i * dxb, xu + eps_i * dxb), rj_x)
                    rj_si = jnp.where(m, -1 if lower else 1, rj_si)
                elif axis == 1:
                    rj_vy = jnp.where(m, v1, rj_vy)
                    rj_vz = jnp.where(m, v2, rj_vz)
                    rj_vx = jnp.where(m, v3, rj_vx)
                    rj_y = jnp.where(m, jnp.where(lower, yl - eps_i * dyb, yu + eps_i * dyb), rj_y)
                    rj_sj = jnp.where(m, -1 if lower else 1, rj_sj)
                else:
                    rj_vz = jnp.where(m, v1, rj_vz)
                    rj_vx = jnp.where(m, v2, rj_vx)
                    rj_vy = jnp.where(m, v3, rj_vy)
                    rj_z = jnp.where(m, jnp.where(lower, zl - eps_i * dzb, zu + eps_i * dzb), rj_z)
                    rj_sk = jnp.where(m, -1 if lower else 1, rj_sk)

            fp_xl, fp_xu = _bf16_hi(coefs[n_head]), _bf16_lo(coefs[n_head])
            fp_yl, fp_yu = _bf16_hi(coefs[n_head + 1]), _bf16_lo(coefs[n_head + 1])
            fp_zl, fp_zu = _bf16_hi(coefs[n_head + 2]), _bf16_lo(coefs[n_head + 2])

            # one reciprocal per axis feeds both face leak terms
            inv_dxb = 1.0 / dxb
            inv_dyb = 1.0 / dyb if multi_d else inv_dxb
            inv_dzb = 1.0 / dzb if three_d else inv_dxb
            lk = (fp_xl * inv_dxb, fp_xu * inv_dxb, fp_yl * inv_dyb,
                  fp_yu * inv_dyb, fp_zl * inv_dzb, fp_zu * inv_dzb)
            leak_tot = lk[0] + lk[1] + lk[2] + lk[3] + lk[4] + lk[5]
            cdf = ea + leak_tot + tiny
            dt_ev = pool.exp23(it) / (c * cdf)
            dt_rem = dt * (1.0 - tau)
            is_event = dt_ev < dt_rem
            do_step = is_ddmc & ~rejected

            dd_tau = jnp.where(is_event, tau + dt_ev * inv_dt, 1.0)
            xi = cdf * pool.u23(it)
            dd_absorbed = do_step & is_event & (xi < ea)
            xim = xi - ea
            cum = jnp.zeros(shape)
            leak_sel = []
            leak_any = jnp.zeros(shape, bool)
            for l in lk:
                m = do_step & is_event & ~dd_absorbed & ~leak_any & (xim < cum + l)
                leak_sel.append(m)
                leak_any = leak_any | m
                cum = cum + l
            fall = do_step & is_event & ~dd_absorbed & ~leak_any
            if three_d:
                leak_sel[5] = leak_sel[5] | fall
            elif multi_d:
                leak_sel[3] = leak_sel[3] | fall
            else:
                leak_sel[1] = leak_sel[1] | fall

            bmu = jnp.sqrt(pool.u16(it))
            bnu = jnp.sqrt(jnp.maximum(1.0 - bmu * bmu, 0.0))
            if multi_d:
                bph, bsh = pool.circle(it)
                b1, b2, b3 = bmu, bnu * bph, bnu * bsh
            else:  # 1D: azimuth unobservable
                b1, b2, b3 = bmu, bnu, jnp.zeros(shape)

            dd_x, dd_y, dd_z = x, y, z
            dd_vx, dd_vy, dd_vz = vx, vy, vz
            dd_si = jnp.zeros(shape, jnp.int32)
            dd_sj = jnp.zeros(shape, jnp.int32)
            dd_sk = jnp.zeros(shape, jnp.int32)
            dd_leak = jnp.zeros(shape, jnp.int32)  # ±(axis+1), XLA-path encoding
            cx_, cy_, cz_ = xl + 0.5 * dxb, yl + 0.5 * dyb, zl + 0.5 * dzb
            eps_d = jnp.float32(eps_ddmc)
            for m, axis, lower in (
                (leak_sel[0], 0, True), (leak_sel[1], 0, False),
                (leak_sel[2], 1, True), (leak_sel[3], 1, False),
                (leak_sel[4], 2, True), (leak_sel[5], 2, False),
            ):
                out_sgn = jnp.float32(-1.0 if lower else 1.0)
                v1, v2, v3 = c * out_sgn * b1, c * b2, c * b3
                if axis == 0:
                    dd_x = jnp.where(m, jnp.where(lower, xl - eps_d * dxb, xu + eps_d * dxb), dd_x)
                    dd_y = jnp.where(m, cy_, dd_y)
                    dd_z = jnp.where(m, cz_, dd_z)
                    dd_vx = jnp.where(m, v1, dd_vx)
                    dd_vy = jnp.where(m, v2, dd_vy)
                    dd_vz = jnp.where(m, v3, dd_vz)
                    dd_si = jnp.where(m, -1 if lower else 1, dd_si)
                elif axis == 1:
                    dd_y = jnp.where(m, jnp.where(lower, yl - eps_d * dyb, yu + eps_d * dyb), dd_y)
                    dd_z = jnp.where(m, cz_, dd_z)
                    dd_x = jnp.where(m, cx_, dd_x)
                    dd_vy = jnp.where(m, v1, dd_vy)
                    dd_vz = jnp.where(m, v2, dd_vz)
                    dd_vx = jnp.where(m, v3, dd_vx)
                    dd_sj = jnp.where(m, -1 if lower else 1, dd_sj)
                else:
                    dd_z = jnp.where(m, jnp.where(lower, zl - eps_d * dzb, zu + eps_d * dzb), dd_z)
                    dd_x = jnp.where(m, cx_, dd_x)
                    dd_y = jnp.where(m, cy_, dd_y)
                    dd_vz = jnp.where(m, v1, dd_vz)
                    dd_vx = jnp.where(m, v2, dd_vx)
                    dd_vy = jnp.where(m, v3, dd_vy)
                    dd_sk = jnp.where(m, -1 if lower else 1, dd_sk)
                dd_leak = jnp.where(m, (-1 if lower else 1) * (axis + 1), dd_leak)

            dd_census = do_step & ~is_event
            dd_x = jnp.where(dd_census, xl + pool.u16(it) * dxb, dd_x)
            dd_y = jnp.where(dd_census, yl + pool.u16(it) * dyb, dd_y)
            dd_z = jnp.where(dd_census, zl + pool.u16(it) * dzb, dd_z)
            cmu = 1.0 - 2.0 * pool.u16(it)
            cst = jnp.sqrt(jnp.maximum(1.0 - cmu * cmu, 0.0))
            if multi_d:
                cph, csh = pool.circle(it)
                dd_vx = jnp.where(dd_census, c * cst * cph, dd_vx)
                dd_vy = jnp.where(dd_census, c * cst * csh, dd_vy)
                dd_vz = jnp.where(dd_census, c * cmu, dd_vz)
            else:  # 1D: x-projection direct, transverse magnitude in vy
                dd_vx = jnp.where(dd_census, c * cmu, dd_vx)
                dd_vy = jnp.where(dd_census, c * cst, dd_vy)
                dd_vz = jnp.where(dd_census, 0.0, dd_vz)

            dd_x = jnp.where(rejected, rj_x, dd_x)
            dd_y = jnp.where(rejected, rj_y, dd_y)
            dd_z = jnp.where(rejected, rj_z, dd_z)
            dd_vx = jnp.where(rejected, rj_vx, dd_vx)
            dd_vy = jnp.where(rejected, rj_vy, dd_vy)
            dd_vz = jnp.where(rejected, rj_vz, dd_vz)
            dd_si = jnp.where(rejected, rj_si, dd_si)
            dd_sj = jnp.where(rejected, rj_sj, dd_sj)
            dd_sk = jnp.where(rejected, rj_sk, dd_sk)
            dd_tau = jnp.where(rejected, tau, dd_tau)
            dd_leak = jnp.where(rejected, 0, dd_leak)

            nx_ = jnp.where(is_ddmc, dd_x, nx_)
            ny_ = jnp.where(is_ddmc, dd_y, ny_)
            nz_ = jnp.where(is_ddmc, dd_z, nz_)
            nvx = jnp.where(is_ddmc, dd_vx, nvx)
            nvy = jnp.where(is_ddmc, dd_vy, nvy)
            nvz = jnp.where(is_ddmc, dd_vz, nvz)
            ntau = jnp.where(is_ddmc, dd_tau, ntau)
            nci = jnp.where(is_ddmc, ci + dd_si, nci)
            ncj = jnp.where(is_ddmc, cj + dd_sj, ncj)
            nck = jnp.where(is_ddmc, ck + dd_sk, nck)
            nalive = jnp.where(dd_absorbed, 0, nalive)
            nabsorbed = jnp.where(dd_absorbed, 1, nabsorbed)
            nface = jnp.where(is_ddmc, 0, nface)
            nleak = jnp.where(is_ddmc, dd_leak, 0)
        else:
            nleak = jnp.zeros(shape, jnp.int32)

        # ---- block transition / domain BCs ------------------------------
        out_lo_x, out_hi_x = nci < 0, nci >= nx
        out_lo_y, out_hi_y = ncj < 0, ncj >= ny
        out_lo_z, out_hi_z = nck < 0, nck >= nz

        gx = _gather(box_ref, blk, nb_chunks) + nx_
        gy = _gather(boy_ref, blk, nb_chunks) + ny_
        gz = _gather(boz_ref, blk, nb_chunks) + nz_

        def apply_bc(g, v, lo, hi, o_lo, o_hi, bc_lo, bc_hi, al, fc, half):
            L = jnp.float32(hi - lo)
            lo = jnp.float32(lo)
            hi = jnp.float32(hi)
            hit_lo = o_lo & (g <= lo + jnp.float32(half))
            hit_hi = o_hi & (g >= hi - jnp.float32(half))
            if bc_lo == BC.reflecting:
                g = jnp.where(hit_lo, jnp.clip(2.0 * lo - g, lo, hi), g)
                v = jnp.where(hit_lo, -v, v)
                if fc is not None:  # None when DDMC is off (face unread)
                    fc = jnp.where(hit_lo, -fc, fc)
            elif bc_lo == BC.periodic:
                g = jnp.where(hit_lo, jnp.clip(g + L, lo, hi), g)
            else:
                al = jnp.where(hit_lo, 0, al)
            if bc_hi == BC.reflecting:
                g = jnp.where(hit_hi, jnp.clip(2.0 * hi - g, lo, hi), g)
                v = jnp.where(hit_hi, -v, v)
                if fc is not None:
                    fc = jnp.where(hit_hi, -fc, fc)
            elif bc_hi == BC.periodic:
                g = jnp.where(hit_hi, jnp.clip(g - L, lo, hi), g)
            else:
                al = jnp.where(hit_hi, 0, al)
            return g, v, al, fc

        fc_bc = nface if use_ddmc else None
        gx, nvx, nalive, fc_bc = apply_bc(
            gx, nvx, x1min, x1max, out_lo_x, out_hi_x, bcs[0], bcs[1], nalive,
            fc_bc, 0.5 * finest[0],
        )
        if multi_d:
            gy, nvy, nalive, fc_bc = apply_bc(
                gy, nvy, x2min, x2max, out_lo_y, out_hi_y, bcs[2], bcs[3], nalive,
                fc_bc, 0.5 * finest[1],
            )
        if three_d:
            gz, nvz, nalive, fc_bc = apply_bc(
                gz, nvz, x3min, x3max, out_lo_z, out_hi_z, bcs[4], bcs[5], nalive,
                fc_bc, 0.5 * finest[2],
            )
        if use_ddmc:
            nface = fc_bc

        out = (out_lo_x | out_hi_x | out_lo_y | out_hi_y | out_lo_z | out_hi_z) & (
            nalive != 0
        )
        # lookup probe: nudge half a finest cell along the CROSSED face's normal
        # (see pallas_transport.py — a velocity nudge can vanish for grazing
        # crossings and spin the loop at zero distance until the iteration cap)
        sgx = jnp.where(out_hi_x, 1.0, 0.0) - jnp.where(out_lo_x, 1.0, 0.0)
        sgy = jnp.where(out_hi_y, 1.0, 0.0) - jnp.where(out_lo_y, 1.0, 0.0)
        sgz = jnp.where(out_hi_z, 1.0, 0.0) - jnp.where(out_lo_z, 1.0, 0.0)
        px = gx + jnp.where(
            sgx != 0.0, jnp.float32(0.5 * finest[0]) * sgx,
            jnp.float32(0.01 * finest[0]) * (nvx / c))
        py = gy + jnp.where(
            sgy != 0.0, jnp.float32(0.5 * finest[1]) * sgy,
            jnp.float32(0.01 * finest[1]) * (nvy / c)) if multi_d else gy
        pz = gz + jnp.where(
            sgz != 0.0, jnp.float32(0.5 * finest[2]) * sgz,
            jnp.float32(0.01 * finest[2]) * (nvz / c)) if three_d else gz
        tx = jnp.clip(jnp.floor((px - x1min) / tsx).astype(jnp.int32), 0, ntx - 1)
        ty = jnp.clip(jnp.floor((py - x2min) / tsy).astype(jnp.int32), 0, nty - 1)
        tz = jnp.clip(jnp.floor((pz - x3min) / tsz).astype(jnp.int32), 0, ntz - 1)
        b_new = _gather(lut_ref, (tz * nty + ty) * ntx + tx, nt_chunks)
        ndxb = _gather(bdx_ref, b_new, nb_chunks)
        ndyb = _gather(bdy_ref, b_new, nb_chunks)
        ndzb = _gather(bdz_ref, b_new, nb_chunks)
        lx = gx - _gather(box_ref, b_new, nb_chunks)
        ly = gy - _gather(boy_ref, b_new, nb_chunks)
        lz = gz - _gather(boz_ref, b_new, nb_chunks)
        ri = jnp.clip(jnp.floor(lx / ndxb).astype(jnp.int32), 0, nx - 1)
        rj = jnp.clip(jnp.floor(ly / ndyb).astype(jnp.int32), 0, ny - 1)
        rk = jnp.clip(jnp.floor(lz / ndzb).astype(jnp.int32), 0, nz - 1)
        nblk = jnp.where(out, b_new, blk)

        nx_ = jnp.where(out, lx, nx_)
        ny_ = jnp.where(out, ly, ny_)
        nz_ = jnp.where(out, lz, nz_)
        nci = jnp.where(out, ri, jnp.clip(nci, 0, nx - 1))
        ncj = jnp.where(out, rj, jnp.clip(ncj, 0, ny - 1))
        nck = jnp.where(out, rk, jnp.clip(nck, 0, nz - 1))

        # A DDMC leak into a FINER block must choose among the destination's
        # refined subfaces with probability ~ its fine-face probs, which may be
        # in another region's slab: record the pending code and PAUSE — the host
        # resamples between rounds (reference's post-comms SampleDDMCBlockFace).
        if use_ddmc and has_smr and multi_d:
            lvl_old = _gather(blv_ref, blk, nb_chunks)
            lvl_new = _gather(blv_ref, b_new, nb_chunks)
            refine = out & (nalive != 0) & (nleak != 0) & (lvl_new > lvl_old)
            nleak_f = jnp.where(refine, nleak, 0)
        else:
            refine = jnp.zeros(shape, bool)
            nleak_f = jnp.zeros(shape, jnp.int32)

        # pause particles whose new block left the tile's region (re-bucketed by
        # the next outer round — the reference's off-block break, transport.cpp:151)
        # or who carry a pending subface resample; int32 mask: Mosaic can't
        # select between i1 vectors at this tile shape
        npaused = jnp.maximum(
            paused,
            (
                (out & (nalive != 0) & (_gather(reg_ref, nblk, nb_chunks) != tr))
                | refine
            ).astype(jnp.int32),
        )

        # a block/cell change invalidates the carried coefficients until the
        # next refresh iteration (the stalled lane is masked out of `active`)
        if R_ref != 1:
            changed = (
                (nblk != blk) | (nci != ci) | (ncj != cj) | (nck != ck)
            )
            nstale = jnp.where(active & changed, jnp.int32(1), stale)
        else:
            nstale = stale

        # Inactive lanes already pass every field through unchanged (the d=0
        # zeroing above degenerates all updates to the identity, every event/
        # BC/pause mask includes ``active``) — no per-field final select.
        # ``face`` rebuilds from 0 and ``leak`` carries PENDING codes on
        # paused lanes, so those two keep their selects.
        if use_ddmc:
            nface = jnp.where(active, nface, face)
        return (
            nx_, ny_, nz_, nvx, nvy, nvz, ntau,
            nblk, nci, ncj, nck, nalive, nabsorbed, nface,
            jnp.where(active, nleak_f, leak),
        ) + tuple(coefs) + (
            nstale,
            npaused,
            it + 1,
            # per-lane active-iteration counter: one elementwise add per
            # iteration; the cross-lane event total reduces ONCE after the loop
            ev + active.astype(jnp.int32),
        )

    def cond(carry):
        # stale lanes stay in the loop (they reactivate at the next refresh)
        tau, alive = carry[6], carry[11]
        paused, it = carry[-3], carry[-2]
        return (it < max_iters) & jnp.any(
            (alive != 0) & (tau < 1.0) & (paused == 0)
        )

    energy = en_ref[:]  # constant through the census loop (non-gray input)
    blk0 = blk_ref[:]
    paused0 = (_gather(reg_ref, blk0, nb_chunks) != tr).astype(jnp.int32)
    coef0 = tuple(jnp.zeros(shape) for _ in range(n_head)) if nongray else (
        jnp.zeros(shape, jnp.int32),
    )
    coef0 = coef0 + tuple(
        jnp.zeros(shape, jnp.int32) for _ in range(n_coef - n_head)
    )
    init = (
        x_ref[:], y_ref[:], z_ref[:],
        vx_ref[:], vy_ref[:], vz_ref[:], tau_ref[:],
        blk0, ci_ref[:], cj_ref[:], ck_ref[:],
        alive_ref[:], absorbed_ref[:], face_ref[:],
        leak_ref[:],
    ) + coef0 + (
        jnp.zeros(shape, jnp.int32),  # stale (it=0 always refreshes)
        paused0,
        jnp.int32(0), jnp.zeros(shape, jnp.int32),
    )
    out = census_while(cond, body, init)
    (x, y, z, vx, vy, vz, tau, blk, ci, cj, ck, alive, absorbed, face,
     leak) = out[:15]
    it, ev = out[-2], jnp.sum(out[-1])
    ox_ref[:], oy_ref[:], oz_ref[:] = x, y, z
    ovx_ref[:], ovy_ref[:], ovz_ref[:] = vx, vy, vz
    otau_ref[:] = tau
    oen_ref[:] = energy  # unchanged pass-through (rides the row layout)
    oblk_ref[:], oci_ref[:], ocj_ref[:], ock_ref[:] = blk, ci, cj, ck
    oalive_ref[:], oabsorbed_ref[:], oface_ref[:] = alive, absorbed, face
    oleak_ref[:] = leak

    @pl.when(pl.program_id(0) == 0)
    def _init_stats():
        ev_ref[0, 0] = 0
        it_ref[0, 0] = 0

    ev_ref[0, 0] = ev_ref[0, 0] + ev
    it_ref[0, 0] = jnp.maximum(it_ref[0, 0], it)


def _make_bucketed_call(
    mesh, prm, R, maxbpr, K_reg, Kf_reg, cap, interpret,
    nongray=False, opacity=None, scattering=None,
):
    """Build the pallas_call for a bucketed census round (shared between the
    single-shard ``transport_bucketed`` loop and the spatial-decomposition round).
    Returns ``(call, prm_static, bufcap, grid)``; callers pass the region id cap
    ``R`` whose (R+1)-th slab is the zero slab for dead/padding tiles."""
    f32, i32 = jnp.float32, jnp.int32
    Kb = _n_bchunks(mesh)
    Kt = _n_tchunks(mesh)
    bufcap = cap + (R + 1) * BTILE
    bufcap = -(-bufcap // BTILE) * BTILE
    grid = bufcap // BTILE

    prm_static = (
        prm.ndim, mesh.nx, mesh.ny, mesh.nz, prm.max_iters,
        tuple(prm.swarm_bc), tuple(float(b) for b in mesh.bounds),
        mesh.tile_shape, mesh.finest, prm.has_absorption, interpret,
        prm.use_ddmc, prm.tau_ddmc, prm.eps_imc, prm.eps_ddmc,
        maxbpr, K_reg, Kf_reg, Kb, Kt, mesh.max_level > 0,
        nongray,
    )
    kernel = functools.partial(
        _bucketed_kernel, prm_static=prm_static,
        opacity=opacity, scattering=scattering,
    )

    part_spec = pl.BlockSpec(
        (BSUB, LANES), lambda g, rr: (g, 0), memory_space=pltpu.VMEM
    )
    dummy_spec = pl.BlockSpec(
        (BSUB, LANES), lambda g, rr: (0, 0), memory_space=pltpu.VMEM
    )
    en_spec = part_spec if nongray else dummy_spec
    en_rows = bufcap // LANES if nongray else BSUB
    slab = lambda rows: pl.BlockSpec(
        (rows, LANES), lambda g, rr: (jnp.minimum(rr[g], R), 0),
        memory_space=pltpu.VMEM,
    )
    coef_slab = slab(K_reg * GREP) if nongray else slab(GREP)
    resident = lambda Kc: pl.BlockSpec(
        (Kc * GREP, LANES), lambda g, rr: (0, 0), memory_space=pltpu.VMEM
    )
    stat_spec = pl.BlockSpec((1, 1), lambda g, rr: (0, 0), memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        + [part_spec] * 7 + [en_spec] + [part_spec] * 8
        + [slab(K_reg * GREP), coef_slab, coef_slab]
        + [slab(Kf_reg[0] * GREP), slab(Kf_reg[1] * GREP), slab(Kf_reg[2] * GREP)]
        + [resident(Kb)] * 6   # bdx, bdy, bdz, box, boy, boz
        + [resident(Kt)]       # lookup
        + [resident(Kb)] * 3,  # region-of, slot, level
        out_specs=tuple(
            [part_spec] * 7 + [en_spec] + [part_spec] * 8 + [stat_spec] * 2
        ),
    )
    out_shapes = tuple(
        [jax.ShapeDtypeStruct((bufcap // LANES, LANES), f32)] * 7
        + [jax.ShapeDtypeStruct((en_rows, LANES), f32)]
        + [jax.ShapeDtypeStruct((bufcap // LANES, LANES), i32)] * 8
        + [jax.ShapeDtypeStruct((1, 1), i32)] * 2
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={i + 3: i for i in range(16)},
        interpret=interpret,
    )
    return call, bufcap, grid


def _geometry_tables(mesh):
    """Fully VMEM-resident chunked block-geometry tables (shared by both modes)."""
    f32, i32 = jnp.float32, jnp.int32
    Kb = _n_bchunks(mesh)
    Kt = _n_tchunks(mesh)
    return (
        _chunk_table(mesh.block_dx[:, 0], f32, Kb),
        _chunk_table(mesh.block_dx[:, 1], f32, Kb),
        _chunk_table(mesh.block_dx[:, 2], f32, Kb),
        _chunk_table(mesh.block_origin[:, 0], f32, Kb),
        _chunk_table(mesh.block_origin[:, 1], f32, Kb),
        _chunk_table(mesh.block_origin[:, 2], f32, Kb),
        _chunk_table(mesh.lookup.reshape(-1), i32, Kt),
        _chunk_table(mesh.block_level, i32, Kb),
    )


def _subkeys_for(K_reg):
    """Composite-key multiplier for the ranged chunk scans (this module's own
    gate so monkeypatched RANGED_* stay in lockstep with the kernel body)."""
    if RANGED_GATHER and K_reg >= RANGED_MIN_CHUNKS:
        return 1 << (K_reg - 1).bit_length()
    return 1


def _pg_tau_subkey():
    """pallas_grid's remaining-work subkey width (read at call time so test
    monkeypatches of pallas_grid.TAU_SUBKEY apply here too); 1 when off."""
    from . import pallas_grid as _pg

    t = _pg.TAU_SUBKEY
    return t if t > 1 else 1


def _bucket_and_run(p, call, R, bufcap, grid, regb, scal, seed, slab_tables,
                    geom_tables, reg_t, slot_t, nongray=False,
                    subb=None, n_sub=1):
    """One bucketed census round: bucket unfinished particles by ``regb[p.block]``
    into the tile-aligned buffer, run the kernel grid, permute results back to
    ledger order. Returns ``(p, iters, events)`` (per-tile max / summed).
    Non-gray carries the (constant) photon energy as an extra f32 row column
    (the kernel's model input); gray keeps the 15-column layout and binds the
    kernel's energy ref to one constant-index dummy block.
    ``subb``/``n_sub``: per-particle slab-chunk subkey for the composite sort
    (see pallas_grid._bucket_plan) when the kernel runs ranged scans."""
    f32, i32 = jnp.float32, jnp.int32
    cap = p.capacity
    unfinished = p.alive & (p.tau < 1.0)
    if n_sub == 1:
        keyv = jnp.where(unfinished, regb[p.block], R).astype(i32)
    else:
        keyv = jnp.where(
            unfinished, regb[p.block] * n_sub + subb, R * n_sub
        ).astype(i32)

    from .pallas_grid import (
        BUCKET_APPLY, _bucket_plan, _bucket_sort_apply, _pack_rows,
        _permute_pack, _permute_unpack, _unbucket_sort, _unpack_rows,
    )

    FNAMES = ("x", "y", "z", "vx", "vy", "vz", "tau") + (
        ("energy",) if nongray else ()
    )
    nfc = len(FNAMES)
    INAMES = ("block", "i", "j", "k")
    cols = (
        [getattr(p, n).astype(f32) for n in FNAMES]
        + [getattr(p, n) for n in INAMES]
        + [p.alive.astype(i32), p.absorbed.astype(i32), p.face, p.leak]
    )
    ncol = len(cols)
    if BUCKET_APPLY == "sort":
        rows_in, buf_lid, tile_regions, _ = _bucket_sort_apply(
            keyv, _pack_rows(cols, n_fcols=nfc), jnp.arange(cap, dtype=i32),
            R, grid, btile=BTILE, n_sub=n_sub,
        )
    else:
        src_of_slot, tile_regions, dest_of_src = _bucket_plan(
            keyv, R, grid, include_dump=True, want_dest_of_src=True,
            btile=BTILE, n_sub=n_sub,
        )
        rows_in = _permute_pack(cols, src_of_slot)
    bufs = _unpack_rows(
        rows_in, ncol, shape=(bufcap // LANES, LANES), n_fcols=nfc
    )
    if not nongray:
        bufs = bufs[:7] + [jnp.zeros((BSUB, LANES), f32)] + bufs[7:]
    outs = call(tile_regions, scal, seed, *bufs, *slab_tables, *geom_tables[:7],
                reg_t, slot_t, geom_tables[7])
    parts = list(outs[:16])
    ev, it = outs[16], outs[17]
    if not nongray:
        parts = parts[:7] + parts[8:]  # drop the dummy energy output

    buf_cols = [b.reshape(bufcap) for b in parts]
    if BUCKET_APPLY == "sort":
        rows_out = _unbucket_sort(
            _pack_rows(buf_cols, n_fcols=nfc), buf_lid, cap
        )
    else:
        rows_out = _permute_pack(buf_cols, dest_of_src, n_extra_zero_rows=0)
    names = list(FNAMES) + list(INAMES) + ["alive", "absorbed", "face", "leak"]
    back = {
        name: _permute_unpack(rows_out, c, getattr(p, name).dtype)
        for c, name in enumerate(names)
    }
    return dataclasses.replace(p, **back), it[0, 0], ev[0, 0]


def transport_bucketed(particles, coefs, mesh, key, prm, dt, interpret=False):
    """Census transport via region bucketing. Returns (particles, iters, events).

    Outer ``while_loop``: bucket unfinished particles into the tile-aligned
    reorder buffer, run the kernel grid, scatter results back; repeat until every
    live particle reaches census (or the round backstop trips)."""
    p = particles
    cap = p.capacity
    f32, i32 = jnp.float32, jnp.int32
    ncpb = mesh.ncells_per_block

    target = max(
        REGION_CELLS_DDMC if prm.use_ddmc else REGION_CELLS_IMC, ncpb
    )
    region_of_np, slot_np, perm_np, R, maxbpr = _build_regions(mesh, target)
    K_reg = -(-(maxbpr * ncpb) // LANES)
    region_of2 = jnp.asarray(region_of_np)  # [2, B]: base / half-shifted parity
    perm2 = jnp.asarray(perm_np)            # [2, R, maxbpr]
    slot2 = jnp.asarray(slot_np)            # [2, B]: block slot within region
    K_SUB = _subkeys_for(K_reg)
    T_SUB = _pg_tau_subkey() if K_SUB == 1 else 1

    # region-sliced coefficient slabs, built once per step, one per parity
    nongray = coefs.opacity is not None
    if nongray:
        # frequency-dependent models: ship (rho, T, fleck) slabs; the kernel
        # evaluates the models per refresh at the particle's photon energy
        pk_t2 = _parity_tables(
            lambda pm: _region_tables(coefs.packed[:, 0], pm, ncpb, K_reg, f32),
            perm2)
        t2_t2 = _parity_tables(
            lambda pm: _region_tables(coefs.packed[:, 1], pm, ncpb, K_reg, f32),
            perm2)
        f3_t2 = _parity_tables(
            lambda pm: _region_tables(coefs.packed[:, 2], pm, ncpb, K_reg, f32),
            perm2)
    else:
        # gray: ONE bf16-packed derived table covers every in-kernel
        # coefficient use. DDMC needs the rate pair itself (sigma_t = ea + es
        # feeds leak math); the pure-IMC loop consumes only (branch prob,
        # 1/sig_t), so the divide moves here, out of the census iteration.
        ea_vec = coefs.fleck * coefs.sigma_a
        es_vec = coefs.sigma_s + (1.0 - coefs.fleck) * coefs.sigma_a
        if prm.use_ddmc:
            pk_vec = _pack_bf16_pair(ea_vec, es_vec)
        else:
            inv_vec = 1.0 / (ea_vec + es_vec + jnp.float32(1.0e-37))
            pk_vec = _pack_bf16_pair(ea_vec * inv_vec, inv_vec)
        pk_t2 = _parity_tables(
            lambda pm: _region_tables(pk_vec, pm, ncpb, K_reg, i32), perm2)
        t2_t2 = f3_t2 = jnp.zeros((2, (R + 1) * GREP, LANES), f32)
    if prm.use_ddmc:
        # DDMC leak probs as PER-CELL (P_lower, P_upper) packed pairs indexed
        # by the same cell id as the coefficients (block face arrays carry
        # their own +1 face, so no wrap handling is needed here)
        pxp, pyp, pzp = _face_pair_vectors(coefs, mesh.nx, mesh.ny, mesh.nz)
        fpx_t2 = _parity_tables(
            lambda pm: _region_tables(pxp, pm, ncpb, K_reg, i32), perm2)
        fpy_t2 = _parity_tables(
            lambda pm: _region_tables(pyp, pm, ncpb, K_reg, i32), perm2)
        fpz_t2 = _parity_tables(
            lambda pm: _region_tables(pzp, pm, ncpb, K_reg, i32), perm2)
        Kf_reg = (K_reg, K_reg, K_reg)
    else:
        fpx_t2 = jnp.zeros((2, (R + 1) * GREP, LANES), i32)
        fpy_t2 = fpz_t2 = fpx_t2
        Kf_reg = (1, 1, 1)

    geom = _geometry_tables(mesh)
    Kb = _n_bchunks(mesh)
    reg_t2 = jnp.stack([_chunk_table(region_of2[pi], i32, Kb) for pi in (0, 1)])
    slot_t2 = jnp.stack(
        [_chunk_table(jnp.asarray(slot_np[pi]), i32, Kb) for pi in (0, 1)]
    )

    call, bufcap, grid = _make_bucketed_call(
        mesh, prm, R, maxbpr, K_reg, Kf_reg, cap, interpret,
        nongray=nongray, opacity=coefs.opacity, scattering=coefs.scattering,
    )

    scal = jnp.array([dt, prm.c, 0, 0, 0, 0, 0, 0], dtype=f32)
    try:
        kd = jax.random.key_data(key)
    except (TypeError, AttributeError):
        kd = key
    seed0 = kd.reshape(-1)[-1].astype(i32)

    def round_body_t(carry, tables):
        # tables passed explicitly (not closed over) so the eager-diag jit below
        # does not embed the multi-MB slabs as HLO constants (the tunneled
        # remote-compile endpoint rejects oversized request bodies)
        pk_t2, t2_t2, f3_t2, fpx_t2, fpy_t2, fpz_t2 = tables
        p, rounds, it_acc, ev_acc = carry
        # alternate the base / half-shifted region grids: a particle that paused
        # random-walking at one parity's face is interior to the other parity
        parity = rounds & 1
        slabs = (pk_t2[parity], t2_t2[parity], f3_t2[parity],
                 fpx_t2[parity], fpy_t2[parity], fpz_t2[parity])
        # golden-ratio increment 0x9E3779B9 as a signed int32
        seed = (seed0 + rounds * jnp.int32(-1640531527))[None]
        if K_SUB > 1:
            # slab-chunk subkey: block slot (this parity) x cells-per-block
            # + in-block cell, matching the kernel's slab cell index
            subb = jnp.clip(
                (slot2[parity][p.block] * ncpb
                 + (p.k * mesh.ny + p.j) * mesh.nx + p.i) >> 7,
                0, K_SUB - 1,
            )
            n_sub = K_SUB
        elif T_SUB > 1:
            # tau subkey: same-tile lanes carry similar remaining work (see
            # pallas_grid.TAU_SUBKEY)
            subb = jnp.clip(
                (p.tau.astype(jnp.float32) * T_SUB).astype(jnp.int32),
                0, T_SUB - 1,
            )
            n_sub = T_SUB
        else:
            subb = None
            n_sub = 1
        p, it, ev = _bucket_and_run(
            p, call, R, bufcap, grid, region_of2[parity], scal, seed, slabs,
            geom, reg_t2[parity], slot_t2[parity], nongray=nongray,
            subb=subb, n_sub=n_sub,
        )
        if prm.use_ddmc and mesh.max_level > 0 and prm.ndim >= 2:
            # host half of the coarse->fine DDMC leak: subface resample for
            # paused pending-leak particles (reference SampleDDMCBlockFace;
            # same helper the XLA/spatial paths use). Full face-prob arrays are
            # host-resident in this mode, so any destination is resolvable.
            from . import transport as transport_ops

            need = p.alive & (p.leak != 0)
            rkey = jax.random.fold_in(key, 0x5F3759) 
            U = jax.random.uniform(
                jax.random.fold_in(rkey, rounds), (5,) + p.x.shape, f32
            )
            mu = jnp.sqrt(U[3])
            nu = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
            phi = (2.0 * jnp.pi) * U[4]
            draws = (U[0], U[1], U[2], mu, nu * jnp.cos(phi), nu * jnp.sin(phi))
            lx, ly, lz, vx, vy, vz, ii, jj, kk = (
                transport_ops._ddmc_subface_resample(
                    mesh, coefs, prm, draws, need, p.leak, p.block,
                    mesh.block_dx[p.block],
                    p.x, p.y, p.z, p.vx, p.vy, p.vz, p.i, p.j, p.k,
                )
            )
            p = dataclasses.replace(
                p, x=lx, y=ly, z=lz, vx=vx, vy=vy, vz=vz, i=ii, j=jj, k=kk,
                leak=jnp.where(need, 0, p.leak),
            )
        return p, rounds + 1, it_acc + it, ev_acc + ev

    tables = (pk_t2, t2_t2, f3_t2, fpx_t2, fpy_t2, fpz_t2)

    def round_body(carry):
        return round_body_t(carry, tables)

    def round_cond(carry):
        p, rounds, _, _ = carry
        return (rounds < MAX_BUCKET_ROUNDS) & jnp.any(p.alive & (p.tau < 1.0))

    if os.environ.get("JB_DIAG_ROUNDS"):  # DIAG
        import sys as _sys
        import time as _t

        carry = (p, jnp.zeros((), i32), jnp.zeros((), i32), jnp.zeros((), i32))
        rb = jax.jit(round_body_t)
        while int(carry[1]) < MAX_BUCKET_ROUNDS and bool(
            jnp.any(carry[0].alive & (carry[0].tau < 1.0))
        ):
            u = int((carry[0].alive & (carry[0].tau < 1.0)).sum())
            it0 = int(carry[2])
            t0 = _t.perf_counter()
            carry = rb(carry, tables)
            jax.block_until_ready(carry[0].x)
            print(
                f"round {int(carry[1])-1}: unfinished {u} "
                f"iters {int(carry[2])-it0} took {_t.perf_counter()-t0:.3f}s",
                file=_sys.stderr,
            )
        p, rounds, iters, events = carry
        return p, iters, events

    p, rounds, iters, events = jax.lax.while_loop(
        round_cond,
        round_body,
        (p, jnp.zeros((), i32), jnp.zeros((), i32), jnp.zeros((), i32)),
    )
    return p, iters, events


# --------------------------------------------------------------------- spatial
# Kernel-backed census rounds for the spatial (block-sharded) decomposition
# (VERDICT r2 #1). Each shard statically partitions ITS OWNED blocks into
# regions (two parities, as above); the stacked per-shard maps are selected by
# the traced shard index inside shard_map. The kernel itself is unchanged: a
# particle that walks into a block owned by ANOTHER shard sees the pause
# sentinel (region id R+1, matching no tile) and pauses exactly like a local
# region exit — the caller's migration round then ships it (the reference's
# off-rank break + swarm send, transport.cpp:151-155 / jaybenne.cpp:121-123).
# Coefficient slabs are built from the shard's LOCAL field slab only — no
# cross-shard field communication is added by the kernel path.

def _spatial_layout(mesh, n_shards, use_ddmc):
    """Per-shard static region decompositions, stacked. Returns ``None`` when a
    shard would own no blocks (fall back to the XLA loop), else
    ``(reg_buck, reg_kern, slot, perm_loc, R, maxbpr)`` where

      * ``reg_buck[n_shards, 2, B]``: bucketing key per GLOBAL block — dense
        local region id for owned blocks, R (the dead-bucket id) otherwise;
      * ``reg_kern[n_shards, 2, B]``: the kernel's region-of table — same but
        non-owned blocks get R+1, which matches no tile's region, so arrivals
        there PAUSE (the migration trigger);
      * ``slot[n_shards, 2, B]``: slab slot of each owned block in its region;
      * ``perm_loc[n_shards, 2, R, maxbpr]``: slab build permutation in LOCAL
        block indices (global - shard*Bl), pad = Bl (the zero row of the local
        coefficient matrix)."""
    B = mesh.n_blocks
    Bl = -(-B // n_shards)
    target = max(
        REGION_CELLS_DDMC if use_ddmc else REGION_CELLS_IMC, mesh.ncells_per_block
    )
    shards = []
    for s in range(n_shards):
        lo, hi = s * Bl, min((s + 1) * Bl, B)
        if hi <= lo:
            return None
        ids = np.arange(lo, hi, dtype=np.int64)
        shards.append((lo, hi) + _build_regions(mesh, target, ids))
    R = max(sh[5] for sh in shards)
    maxbpr = max(sh[6] for sh in shards)
    reg_buck = np.full((n_shards, 2, B), R, np.int32)
    reg_kern = np.full((n_shards, 2, B), R + 1, np.int32)
    slot_all = np.zeros((n_shards, 2, B), np.int32)
    perm_loc = np.full((n_shards, 2, R, maxbpr), Bl, np.int32)
    for s, (lo, hi, region_of, slot, perm, R_s, maxbpr_s) in enumerate(shards):
        nloc = hi - lo
        for pi in range(2):
            reg_buck[s, pi, lo:hi] = region_of[pi]
            reg_kern[s, pi, lo:hi] = region_of[pi]
            slot_all[s, pi, lo:hi] = slot[pi]
            # perm entries are positions into the shard's contiguous id range,
            # i.e. already local block indices; remap the pad nloc -> Bl
            pm = perm[pi]
            perm_loc[s, pi, :R_s, :maxbpr_s] = np.where(pm >= nloc, Bl, pm)
    return reg_buck, reg_kern, slot_all, perm_loc, R, maxbpr


def supports_spatial(mesh, prm, n_shards) -> bool:
    """Whether the bucketed kernel can run the spatial decomposition's census
    rounds for this mesh/shard count (same chunk budgets as ``supports``)."""
    lay = _spatial_layout(mesh, n_shards, prm.use_ddmc)
    if lay is None:
        return False
    maxbpr = lay[5]
    K_reg = -(-(maxbpr * mesh.ncells_per_block) // LANES)
    return (
        K_reg <= MAX_REGION_CHUNKS
        and _n_bchunks(mesh) <= MAX_BLOCK_CHUNKS_BUCKETED
        and _n_tchunks(mesh) <= MAX_BLOCK_CHUNKS_BUCKETED
    )


def make_spatial_transport(mesh, prm, n_shards, cap, interpret=False,
                           nongray=False, opacity=None, scattering=None):
    """Build the kernel-backed census round for ``parallel.spatial``.

    Returns ``(build_tables, round_fn)``:

      * ``build_tables(coefs_local, shard) -> tables`` — once per step, from the
        shard's LOCAL coefficient slab (length ``Bl * ncells_per_block``);
      * ``round_fn(p, tables, key, rounds) -> (p, iters, events)`` — one
        bucketed kernel round over the shard's local ledger slice. Paused
        particles whose block left the shard are picked up by the caller's
        ``migrate``; pending coarse->fine DDMC leak codes are resolved by the
        caller's subface fixup (the kernel records them and pauses).
    """
    f32, i32 = jnp.float32, jnp.int32
    ncpb = mesh.ncells_per_block
    lay = _spatial_layout(mesh, n_shards, prm.use_ddmc)
    reg_buck_np, reg_kern_np, slot_np, perm_np, R, maxbpr = lay
    K_reg = -(-(maxbpr * ncpb) // LANES)
    Kf_reg = (K_reg, K_reg, K_reg) if prm.use_ddmc else (1, 1, 1)

    reg_buck = jnp.asarray(reg_buck_np)  # [n, 2, B]
    reg_kern = jnp.asarray(reg_kern_np)
    slot_all = jnp.asarray(slot_np)
    perm_all = jnp.asarray(perm_np)      # [n, 2, R, maxbpr]

    geom = _geometry_tables(mesh)
    Kb = _n_bchunks(mesh)
    call, bufcap, grid = _make_bucketed_call(
        mesh, prm, R, maxbpr, K_reg, Kf_reg, cap, interpret,
        nongray=nongray, opacity=opacity, scattering=scattering,
    )

    def build_tables(coefs, shard):
        perm2 = perm_all[shard]  # [2, R, maxbpr] — traced shard index
        if nongray:
            # frequency-dependent models: (rho, T, fleck) slabs from the
            # shard's LOCAL packed matter state; the kernel evaluates the
            # models per refresh at the particle's photon energy
            pk_t2 = _parity_tables(
                lambda pm: _region_tables(
                    coefs.packed[:, 0], pm, ncpb, K_reg, f32), perm2)
            t2_t2 = _parity_tables(
                lambda pm: _region_tables(
                    coefs.packed[:, 1], pm, ncpb, K_reg, f32), perm2)
            f3_t2 = _parity_tables(
                lambda pm: _region_tables(
                    coefs.packed[:, 2], pm, ncpb, K_reg, f32), perm2)
        else:
            ea_vec = coefs.fleck * coefs.sigma_a
            es_vec = coefs.sigma_s + (1.0 - coefs.fleck) * coefs.sigma_a
            if prm.use_ddmc:
                pk_vec = _pack_bf16_pair(ea_vec, es_vec)
            else:
                # pure-IMC pair word is (p_abs, 1/sig_t) — see transport_bucketed
                inv_vec = 1.0 / (ea_vec + es_vec + jnp.float32(1.0e-37))
                pk_vec = _pack_bf16_pair(ea_vec * inv_vec, inv_vec)
            pk_t2 = _parity_tables(
                lambda pm: _region_tables(pk_vec, pm, ncpb, K_reg, i32), perm2)
            t2_t2 = f3_t2 = jnp.zeros((2, (R + 1) * GREP, LANES), f32)
        if prm.use_ddmc:
            pxp, pyp, pzp = _face_pair_vectors(
                coefs, mesh.nx, mesh.ny, mesh.nz
            )
            fpx_t2 = _parity_tables(
                lambda pm: _region_tables(pxp, pm, ncpb, K_reg, i32), perm2)
            fpy_t2 = _parity_tables(
                lambda pm: _region_tables(pyp, pm, ncpb, K_reg, i32), perm2)
            fpz_t2 = _parity_tables(
                lambda pm: _region_tables(pzp, pm, ncpb, K_reg, i32), perm2)
        else:
            fpx_t2 = jnp.zeros((2, (R + 1) * GREP, LANES), i32)
            fpy_t2 = fpz_t2 = fpx_t2
        reg_t2 = jnp.stack(
            [_chunk_table(reg_kern[shard, pi], i32, Kb) for pi in (0, 1)]
        )
        slot_t2 = jnp.stack(
            [_chunk_table(slot_all[shard, pi], i32, Kb) for pi in (0, 1)]
        )
        regb2 = reg_buck[shard]  # [2, B]
        slotb2 = slot_all[shard]  # [2, B]: block slot within its region
        return (pk_t2, t2_t2, f3_t2, fpx_t2, fpy_t2, fpz_t2,
                reg_t2, slot_t2, regb2, slotb2)

    K_SUB = _subkeys_for(K_reg)
    T_SUB = _pg_tau_subkey() if K_SUB == 1 else 1

    def round_fn(p, tables, key, rounds, dt):
        (pk_t2, t2_t2, f3_t2, fpx_t2, fpy_t2, fpz_t2,
         reg_t2, slot_t2, regb2, slotb2) = tables
        parity = rounds & 1
        slabs = (pk_t2[parity], t2_t2[parity], f3_t2[parity],
                 fpx_t2[parity], fpy_t2[parity], fpz_t2[parity])
        try:
            kd = jax.random.key_data(key)
        except (TypeError, AttributeError):
            kd = key
        seed = kd.reshape(-1)[-1].astype(i32)[None]
        scal = jnp.stack(
            [jnp.asarray(dt, f32), jnp.asarray(prm.c, f32)]
            + [jnp.zeros((), f32)] * 6
        )
        if K_SUB > 1:
            subb = jnp.clip(
                (slotb2[parity][p.block] * ncpb
                 + (p.k * mesh.ny + p.j) * mesh.nx + p.i) >> 7,
                0, K_SUB - 1,
            )
            n_sub = K_SUB
        elif T_SUB > 1:
            subb = jnp.clip(
                (p.tau.astype(jnp.float32) * T_SUB).astype(jnp.int32),
                0, T_SUB - 1,
            )
            n_sub = T_SUB
        else:
            subb = None
            n_sub = 1
        return _bucket_and_run(
            p, call, R, bufcap, grid, regb2[parity], scal, seed, slabs,
            geom, reg_t2[parity], slot_t2[parity], nongray=nongray,
            subb=subb, n_sub=n_sub,
        )

    return build_tables, round_fn
