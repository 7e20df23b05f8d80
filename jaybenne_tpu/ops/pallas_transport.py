"""Pallas TPU mega-kernel for the IMC census transport loop.

The XLA event loop (``ops/transport.py``) pays per-iteration HBM traffic for every
particle array and temporary, threefry RNG cost, and dispatch overhead — ~40 ns/event
measured on v5e. This kernel runs the ENTIRE census loop on-chip:

  * the particle tile (pos/vel/tau/cell ids/flags) lives in VMEM for the whole loop;
  * per-cell coefficients, DDMC face probs, block geometry/levels, and the
    block-lookup grid are VMEM tables read with ``tpu.dynamic_gather`` in LANE mode
    (``take_along_axis(..., axis=1)``; Mosaic on v5e supports per-lane gathers
    within a 128-lane row — sublane-mode gather crashes the backend compiler on
    this target). Tables beyond 128 entries are split into 128-entry chunks, each
    stored as a single replicated vreg row-group (GREP sublanes) and range-selected
    at gather time — the op count matches a fully replicated table, at 1/32 the
    VMEM;
  * random numbers come from the hardware PRNG (``pltpu.prng_random_bits``), seeded
    per (tile, step) — the analog of the reference's per-thread ``XorShift64`` pool;
  * each grid tile (SUBLANES*128 particles) iterates to ITS OWN census completion,
    confining divergence costs to a tile;
  * single-block meshes (the production bench shape) skip all block-geometry
    gathers: cell size/origin become scalars and transitions reduce to domain BCs.

Physics is the same algorithm as the XLA path (the branch structure of
``ptcl_transport_step``, reference ``transport_utils.hpp:111-160``; the DDMC branch
of ``transport_ddmc.cpp:28-237`` incl. the in-kernel coarse->fine subface resample
of ``sample_ddmc_bface.cpp``; plus the inline block-transition/BC logic); only the
RNG stream differs, which Monte Carlo tolerances absorb.

Scope: every shipped configuration — IMC and DDMC, uniform and SMR meshes — up to
the chunk-scan caps in ``supports()``; meshes beyond them fall back to the XLA
path (the bucketed region-resident kernel is the planned extension for O(1e5+)
cells).

Measured on v5e (stepdiff, 128 cells, 100k particles): see BENCH.md / bench.py.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BC
from . import pallas_rng as rng

#   JB_SUBLANES overrides for on-hardware sweeps (one process per point)
SUBLANES = int(os.environ.get("JB_SUBLANES", "128"))
#                          tile width swept on v5e (stepdiff headline, events/s):
#   16: 1.88e9, 32: 2.19e9, 64: 2.23e9, 128: 2.21e9, 256: 2.03e9.
#   Narrower tiles confine the census straggler tail (each tile iterates to
#   its own completion); 64 and 128 are within 1% of each other, but Mosaic
#   compiled the 64-wide kernel 3-9x slower across the acceptance matrix
#   (stepdiff 628 s vs 73 s; smr 1240 s wall) so 128 is the default.
LANES = 128
GREP = 8                 # sublane rows per stored table chunk (one f32 vreg)
TILE = SUBLANES * LANES  # particles per grid tile
# Census-loop cond cadence: every while_loop iteration pays a cross-lane
# reduction plus a vector->scalar sync for the "any lane still active?" test.
# COND_EVERY > 1 runs that many body iterations per cond check through an
# inner fori_loop — the body is the identity for inactive lanes (documented at
# each kernel's carry return), so the <= COND_EVERY-1 overshoot iterations per
# tile are harmless (and max_iters overshoots by the same bounded amount).
COND_EVERY = int(os.environ.get("JB_COND_EVERY", "1"))
# JB_FLOOR_ITERS=N: floor-probe mode — no gathers/RNG/physics, every active
# lane runs exactly N iterations (tau += 1/N); measurement only, see the
# matching knob + docstring in pallas_grid.py
FLOOR_ITERS = int(os.environ.get("JB_FLOOR_ITERS", "0"))


def census_while(cond, body, init):
    """``lax.while_loop(cond, body, init)`` with the cond checked every
    COND_EVERY body iterations (see above; 1 = plain while_loop)."""
    if COND_EVERY <= 1:
        return jax.lax.while_loop(cond, body, init)
    chunk = lambda c: jax.lax.fori_loop(
        0, COND_EVERY, lambda _, cc: body(cc), c
    )
    return jax.lax.while_loop(cond, chunk, init)
VMEM_BUDGET = 10 * 1024 * 1024  # soft cap for resident tables + particle tile
# A lane-mode dynamic gather touches one 128-entry chunk per op, so reads from an
# N-entry table scan ceil(N/128) chunks with a range-select each. Beyond this many
# chunks the per-event coefficient fetch dominates the physics body and the
# bucketed transport path (particles sorted by mesh region, region tables DMAd
# per grid step) is the right tool instead.
MAX_CELL_CHUNKS = 40
MAX_BLOCK_CHUNKS = 4


def _n_chunks(mesh) -> int:
    return -(-mesh.total_cells // LANES)


def _n_fchunks(mesh, prm):
    # DDMC face probs are PER-CELL bf16-packed (P_lower, P_upper) pair tables
    # (_face_pair_vectors), so their chunk count is the CELL chunk count
    if not prm.use_ddmc:
        return (1, 1, 1)
    K = _n_chunks(mesh)
    return (K, K, K)


def _n_bchunks(mesh) -> int:
    return -(-mesh.n_blocks // LANES)


def _n_tchunks(mesh) -> int:
    n_tiles = mesh.tile_shape[0] * mesh.tile_shape[1] * mesh.tile_shape[2]
    return -(-n_tiles // LANES)


def supports(mesh, prm) -> bool:
    """Whether the VMEM-resident kernel covers the configuration. All tables (cell
    coefficients, DDMC face probs, block geometry/level, lookup grid) are chunked
    128-entry lane-gather tables, so the limits are the chunk-scan cost caps above
    plus the VMEM budget — uniform AND refined (SMR) meshes, IMC and DDMC alike."""
    K = _n_chunks(mesh)
    Kf = _n_fchunks(mesh, prm)
    if mesh.max_level == 0:
        # uniform forests collapse to ONE synthetic block in-kernel (see
        # transport_pallas): block geometry/lookup tables are never gathered,
        # so the block/tile chunk caps don't bind
        nb = nt = 1
    else:
        nb = _n_bchunks(mesh)
        nt = _n_tchunks(mesh)
    # gray ships ONE bf16-packed (ea, es) cell table, non-gray ships three
    # (rho, T, fleck); budget for the larger case (prm doesn't carry the
    # model kind — the ~2K-chunk over-estimate is noise vs VMEM_BUDGET)
    n_cell_tables = 3
    n_block_tables = 7 + (1 if mesh.max_level > 0 else 0)  # +level for SMR
    table_bytes = (
        (n_cell_tables * K + n_block_tables * nb + nt + sum(Kf))
        * GREP * LANES * 4
    )
    particle_bytes = 15 * SUBLANES * LANES * 4  # 14 carried + read-only energy
    return (
        K <= MAX_CELL_CHUNKS
        and nb <= MAX_BLOCK_CHUNKS
        and nt <= MAX_BLOCK_CHUNKS
        and table_bytes + particle_bytes <= VMEM_BUDGET
    )


def _chunk_table(vec, dtype, n_chunks):
    """[N] -> [n_chunks*GREP, LANES]: 128-entry chunks stacked along sublanes, each
    chunk lane-padded and replicated across GREP (= one vreg of) rows. Gathers
    process the particle tile in GREP-row groups against the same vreg, so wider
    replication would buy nothing and cost 32x the VMEM."""
    n = vec.shape[0]
    pad = n_chunks * LANES - n
    flat = jnp.concatenate([vec.astype(dtype), jnp.zeros((pad,), dtype)])
    chunks = flat.reshape(n_chunks, LANES)
    return jnp.broadcast_to(
        chunks[:, None, :], (n_chunks, GREP, LANES)
    ).reshape(n_chunks * GREP, LANES)


def _gather(tab_ref, idx, n_chunks=1):
    """Gather from a chunked table ref ([n_chunks*GREP, LANES]) with flat indices
    in ``[0, n_chunks*LANES)``: per GREP-row group of the index tile, each
    128-entry chunk is lane-gathered and range-selected. The chunk id / lane
    offset are split once per group (LANES = 128 = 1 << 7), so the scan costs
    3 vector ops per chunk (take_along_axis + eq + select).

    INVARIANT (no defensive clip): every call site's indices are maintained
    in-table-range by construction — cell/block/face/tile ids are clipped at
    every update site in the census loop, dead ledger slots carry zeros, and
    sourcing/migration only write valid ids."""
    groups = []
    for s in range(idx.shape[0] // GREP):
        sl = idx[s * GREP : (s + 1) * GREP, :]
        if n_chunks == 1:
            g = jnp.take_along_axis(tab_ref[0:GREP, :], sl, axis=1)
        else:
            ch = sl >> 7
            rel = sl & (LANES - 1)
            g = jnp.zeros(sl.shape, tab_ref.dtype)
            for k in range(n_chunks):
                part = jnp.take_along_axis(
                    tab_ref[k * GREP : (k + 1) * GREP, :], rel, axis=1
                )
                g = jnp.where(ch == k, part, g)
        groups.append(g)
    return jnp.concatenate(groups, axis=0)


_gather_chunked = _gather  # call-site alias: explicit chunk count


def _gather_window(tab_ref, idx, bases, W, n_chunks):
    """Windowed variant of ``_gather``: each GREP group scans only the
    STATIC-width chunk window ``[bases[s], bases[s] + W)`` of the table —
    same 3-vector-op chunk step, but W unrolled iterations instead of
    ``n_chunks``, with a dynamic (scalar) start offset per group. ``bases``
    are host-computed per-group round-start base chunks (traced i32 scalars,
    pre-clamped to ``[0, n_chunks - W]`` so every slice is in-bounds); lanes
    whose chunk falls outside their group's window read zeros — the kernel
    PAUSES them at refresh before any gathered value is consumed (see the
    window block in ``pallas_grid._grid_kernel``). Unlike the ranged scan
    (dynamic fori_loop BOUNDS — serialized, rejected in BENCH.md) the loop
    here is static and pipelines; only the slice offsets are dynamic."""
    # in-bounds guard against the PASSED table size (not the caller's clamp
    # convention): a table with fewer than W chunks shrinks the window, and
    # bases are re-clamped so every [base, base + W) slice stays inside THIS
    # table — one scalar clip per group, no reliance on Kf_reg == K_reg
    W = min(W, n_chunks)
    groups = []
    for s in range(idx.shape[0] // GREP):
        sl = idx[s * GREP : (s + 1) * GREP, :]
        base = jnp.clip(bases[s], 0, max(n_chunks - W, 0))
        ch = sl >> 7
        rel = sl & (LANES - 1)
        g = jnp.zeros(sl.shape, tab_ref.dtype)
        for k in range(W):
            part = jnp.take_along_axis(
                tab_ref[pl.ds((base + k) * GREP, GREP), :], rel, axis=1
            )
            g = jnp.where(ch == base + k, part, g)
        groups.append(g)
    return jnp.concatenate(groups, axis=0)

# Ranged chunk scans (big-mesh kernels): instead of the static full-table scan,
# each GREP group scans only [min, max] of the chunk ids its LIVE lanes hold,
# with dynamic fori_loop bounds, after a composite (region, chunk) sort key
# lays same-group lanes chunk-adjacent. Exact — no windowing approximation,
# no pause semantics; interpret-mode equivalence is pinned by the
# test_*_ranged_gather tests.
#
# DEFAULT OFF — measured a 2.7x LOSS on the v5e (64^3 bigmesh probe: 4.19e8
# vs 1.12e9 ev/s, Mosaic compile 1102 s vs ~180 s). Two reasons: (a) the
# census round runs ~9k iterations, so groups diffuse across the whole slab
# and the ranges decay to full length anyway; (b) the dynamic-bound loops
# serialize (no unroll/pipelining) and the per-group min/max -> scalar loop
# bounds cost a vector->scalar sync pair per table refresh — the same sync
# the COND_EVERY knob exists to amortize in the census cond. Kept behind
# JB_RANGED_GATHER=1 for configs with short rounds/re-sorts where locality
# survives; the static full scan plus SIGMA_REFRESH stays the production path.
RANGED_GATHER = int(os.environ.get("JB_RANGED_GATHER", "0"))
RANGED_MIN_CHUNKS = 16  # below this the static unrolled scan is cheaper


def _ranged_plan(idx, mask, n_chunks):
    """Per-GREP-group (k_lo, k_hi, ch, rel) chunk bounds over MASKED lanes.

    ``mask`` selects lanes whose gathered value will be READ before the next
    refresh (live, unpaused, pre-census); other lanes get zeros whenever they
    fall outside the scanned range — callers must never consume them. An
    all-masked-out group yields an empty range (k_lo > k_hi) and pure zeros.
    One plan serves every same-indexed table gathered this refresh."""
    plans = []
    for s in range(idx.shape[0] // GREP):
        sl = idx[s * GREP : (s + 1) * GREP, :]
        m = mask[s * GREP : (s + 1) * GREP, :]
        ch = sl >> 7
        rel = sl & (LANES - 1)
        k_lo = jnp.min(jnp.where(m, ch, n_chunks - 1))
        k_hi = jnp.max(jnp.where(m, ch, 0))
        plans.append((k_lo, k_hi, ch, rel))
    return plans


def _gather_ranged(tab_ref, plans):
    """Gather from a chunked table ref through a ``_ranged_plan``: the same
    3-vector-op chunk step as ``_gather`` (dynamic-offset load is folded into
    take_along_axis's operand), but looping only over each group's live chunk
    range. Table chunk count may exceed the plan's (face tables): bounds come
    from the shared cell index, which is in-range for every table."""
    groups = []
    for (k_lo, k_hi, ch, rel) in plans:
        def chunk_body(k, g, ch=ch, rel=rel):
            part = jnp.take_along_axis(
                tab_ref[pl.ds(k * GREP, GREP), :], rel, axis=1
            )
            return jnp.where(ch == k, part, g)

        g = jax.lax.fori_loop(
            k_lo, k_hi + 1, chunk_body, jnp.zeros(rel.shape, tab_ref.dtype)
        )
        groups.append(g)
    return jnp.concatenate(groups, axis=0)


def _pack_bf16_pair(hi, lo):
    """Two f32 arrays -> one i32 array: each value rounded (RNE) to bfloat16
    and packed with ``hi`` in bits 31:16, ``lo`` in bits 15:0. Host-side prep
    for paired-coefficient tables — ONE chunk scan then serves two values,
    halving the dominant in-kernel gather cost. The ~0.4% bf16 quantization of
    a sampling RATE (collision coefficients, DDMC leak probabilities) is a
    relative perturbation far below Monte Carlo noise at production particle
    counts; the analog estimators (absorbed-weight tallies) conserve energy
    exactly for ANY rate values, so only sampling statistics shift."""
    u16, u32 = jnp.uint16, jnp.uint32
    h = jax.lax.bitcast_convert_type(
        hi.astype(jnp.float32).astype(jnp.bfloat16), u16
    ).astype(u32)
    l = jax.lax.bitcast_convert_type(
        lo.astype(jnp.float32).astype(jnp.bfloat16), u16
    ).astype(u32)
    return jax.lax.bitcast_convert_type((h << 16) | l, jnp.int32)


def _bf16_hi(packed):
    """Bits 31:16 of a packed pair as f32 (exact bf16 widening, 2 vector ops)."""
    return jax.lax.bitcast_convert_type(
        packed & jnp.int32(-65536), jnp.float32
    )


def _bf16_lo(packed):
    """Bits 15:0 of a packed pair as f32 (exact bf16 widening, 2 vector ops)."""
    return jax.lax.bitcast_convert_type(packed << 16, jnp.float32)


def _face_pair_vectors(coefs, nx, ny, nz):
    """Per-cell bf16-packed (P_lower, P_upper) DDMC leak-prob pairs per axis,
    flattened to [B * ncells_per_block] i32 vectors in cell order — gathered
    in-kernel with the same cell index as the coefficient pair (cell-sized
    tables replace the face-sized ones: one scan serves both faces of an
    axis, and the per-axis face-index arithmetic disappears). The block count
    is inferred, so this serves global AND shard-local face arrays."""
    px = coefs.px.reshape(-1, nz, ny, nx + 1)
    py = coefs.py.reshape(-1, nz, ny + 1, nx)
    pz = coefs.pz.reshape(-1, nz + 1, ny, nx)
    pxp = _pack_bf16_pair(px[:, :, :, :nx], px[:, :, :, 1:]).reshape(-1)
    pyp = _pack_bf16_pair(py[:, :, :ny, :], py[:, :, 1:, :]).reshape(-1)
    pzp = _pack_bf16_pair(pz[:, :nz, :, :], pz[:, 1:, :, :]).reshape(-1)
    return pxp, pyp, pzp


def _uniform_view(mesh):
    """Synthetic single-block ``MeshGeometry`` covering a uniform (max_level == 0)
    block forest: one block of ``root_grid * block_shape`` cells with the domain
    bounds. Block ids in a uniform forest are row-major in (z, y, x) logical
    location (``build_mesh`` sorts by (level, z, y, x)), so cell tables remap by
    a pure reshape/transpose (``_to_global_cells``) and particle state by an
    affine shift (``transport_pallas``) — the kernel's ``single_block`` path then
    skips EVERY per-iteration block-geometry/lookup gather (~5 chunked gathers:
    cell size, origin x2, lookup probe) and interior block faces stop being
    transitions at all. The reference pays a neighbor-table hop per block
    crossing (``transport.cpp:150``); a uniform TPU mesh needs neither."""
    from ..mesh import MeshGeometry

    b = mesh.bounds
    nrbz, nrby, nrbx = mesh.root_grid
    NX, NY, NZ = nrbx * mesh.nx, nrby * mesh.ny, nrbz * mesh.nz
    f32, i32 = jnp.float32, jnp.int32
    return MeshGeometry(
        ndim=mesh.ndim,
        nx=NX, ny=NY, nz=NZ,
        n_blocks=1,
        max_level=0,
        bounds=b,
        tile_shape=(1, 1, 1),
        root_grid=(1, 1, 1),
        finest=mesh.finest,
        block_origin=jnp.asarray([[b[0], b[2], b[4]]], f32),
        block_dx=jnp.asarray(
            [[(b[1] - b[0]) / NX, (b[3] - b[2]) / NY, (b[5] - b[4]) / NZ]], f32
        ),
        block_level=jnp.zeros((1,), i32),
        lookup=jnp.zeros((1, 1, 1), i32),
    )


def _to_global_cells(vec, mesh):
    """Per-cell vector in block order ([B * nz*ny*nx], i fastest) -> global
    row-major cell order of the uniform synthetic block — a reshape/transpose
    (no gather), valid because uniform block ids are (z, y, x) row-major."""
    nrbz, nrby, nrbx = mesh.root_grid
    return (
        vec.reshape(nrbz, nrby, nrbx, mesh.nz, mesh.ny, mesh.nx)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(-1)
    )


def _transport_kernel(
    scal_ref,   # SMEM f32[8]: dt, c
    seed_ref,   # SMEM i32[1]
    x_ref, y_ref, z_ref, vx_ref, vy_ref, vz_ref, tau_ref,
    blk_ref, ci_ref, cj_ref, ck_ref, alive_ref, absorbed_ref, face_ref,
    en_ref,     # particle photon energy (read-only; per-event model input)
    sa_ref, ss_ref, ff_ref,   # gray: sa carries the bf16-packed derived-rate
    #   PAIR word per cell (ea = fleck*sigma_a, es = sigma_s +
    #   (1-fleck)*sigma_a; _pack_bf16_pair), ss/ff unused;
    #   non-gray (prm ``nongray``): (rho, temp, fleck) f32 tables — the
    #   kernel evaluates the opacity/scattering models per EVENT at the
    #   particle's photon energy, like the reference (transport.cpp:122-127)
    bdx_ref, bdy_ref, bdz_ref,
    box_ref, boy_ref, boz_ref,
    lut_ref, blv_ref,
    fpx_ref, fpy_ref, fpz_ref,  # DDMC leak probs: PER-CELL bf16-packed
    #   (P_lower, P_upper) pair words per axis (_face_pair_vectors)
    ox_ref, oy_ref, oz_ref, ovx_ref, ovy_ref, ovz_ref, otau_ref,
    oblk_ref, oci_ref, ocj_ref, ock_ref, oalive_ref, oabsorbed_ref, oface_ref,
    ev_ref, it_ref,
    *,
    prm_static,
    opacity=None,
    scattering=None,
):
    (ndim, nx, ny, nz, max_iters, bcs, bounds, tile_shape, finest,
     single_block, block_dx0, block_org0, has_absorption, n_chunks,
     interpret, use_ddmc, tau_ddmc, eps_imc, eps_ddmc,
     n_fchunks, nb_chunks, nt_chunks, has_smr, nongray) = prm_static
    multi_d = ndim >= 2
    three_d = ndim == 3
    dt = scal_ref[0]
    c = scal_ref[1]
    x1min, x1max, x2min, x2max, x3min, x3max = bounds
    ntz, nty, ntx = tile_shape
    tsx = (x1max - x1min) / ntx
    tsy = (x2max - x2min) / nty
    tsz = (x3max - x3min) / ntz

    shape = (SUBLANES, LANES)
    BIG = jnp.float32(3.0e38)
    tiny = jnp.float32(1.0e-37)

    # paired 16-bit / full 23-bit uniform variates (see ops/pallas_rng.py)
    raw_bits = rng.make_raw_bits(
        shape, seed_ref[0], pl.program_id(0) * TILE, interpret
    )

    inv_c = jnp.float32(1.0) / c
    inv_cdt = jnp.float32(1.0) / (c * dt)

    def body(carry):
        (x, y, z, vx, vy, vz, tau, blk, ci, cj, ck, alive, absorbed, face,
         it, ev) = carry
        if FLOOR_ITERS:
            # floor-probe mode (see pallas_grid.FLOOR_ITERS): full carry, no
            # gathers/RNG/physics — measures this kernel's empty-loop floor
            act = (alive != 0) & (tau < 1.0)
            ntau_f = jnp.where(
                act,
                jnp.minimum(tau + jnp.float32(1.0 / FLOOR_ITERS), 1.0),
                tau,
            )
            return (
                x, y, z, vx, vy, vz, ntau_f, blk, ci, cj, ck, alive, absorbed,
                face, it + 1, ev + act.astype(jnp.int32),
            )
        pool = rng.DrawPool(raw_bits)
        active = (alive != 0) & (tau < 1.0)

        if single_block:
            dxb = jnp.float32(block_dx0[0])
            dyb = jnp.float32(block_dx0[1])
            dzb = jnp.float32(block_dx0[2])
            dmin = jnp.float32(min(block_dx0[:ndim]))
            if ny == 1 and nz == 1:
                cell = ci
            elif nz == 1:
                cell = cj * nx + ci
            else:
                cell = (ck * ny + cj) * nx + ci
        else:
            dxb = _gather(bdx_ref, blk, nb_chunks)
            dyb = _gather(bdy_ref, blk, nb_chunks) if multi_d else dxb
            dzb = _gather(bdz_ref, blk, nb_chunks) if three_d else dxb
            if three_d:
                dmin = jnp.minimum(dxb, jnp.minimum(dyb, dzb))
            elif multi_d:
                dmin = jnp.minimum(dxb, dyb)
            else:
                dmin = dxb
            if ny == 1 and nz == 1:
                cell = blk * nx + ci
            elif nz == 1:
                cell = (blk * ny + cj) * nx + ci
            else:
                cell = (blk * (nz * ny) + ck * ny + cj) * nx + ci
        # Collision-rate pair (the only per-cell physics the loop needs):
        #   ea = fleck * sigma_a          (effective absorption rate)
        #   es = sigma_s + (1-fleck)*sigma_a  (effective scattering rate)
        # sigma_t = ea + es, so the gray path gathers TWO tables, not three.
        inv_sigt = p_abs = None  # gray non-DDMC carries these instead
        if nongray:
            # frequency-dependent surface: gather (rho, T, fleck) and evaluate
            # the models at the particle's photon energy, per event
            rho_g = _gather_chunked(sa_ref, cell, n_chunks)
            tt_g = _gather_chunked(ss_ref, cell, n_chunks)
            ff = _gather_chunked(ff_ref, cell, n_chunks)
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
            ea = ff * sa
            es = ss + (1.0 - ff) * sa
        elif use_ddmc:
            # gray + DDMC: ONE bf16-packed (ea, es) word per cell — sa_ref
            # holds the pair table, ss_ref is unused (opacity_model = none
            # packs ea = 0; sigma_a == 0 means the Fleck factor is exactly 1
            # and absorption never fires, so the zero half's unpack is skipped)
            pk = _gather_chunked(sa_ref, cell, n_chunks)
            es = _bf16_lo(pk)
            ea = _bf16_hi(pk) if has_absorption else None
        else:
            # gray, no DDMC: the loop only ever consumes the total collision
            # rate (as a DIVISOR of the exponential draw) and the absorption
            # branch probability, so the pair table carries
            # (p_abs = fleck*sigma_a/sig_t, 1/sig_t) directly — no add, no
            # divide, no threshold multiply per iteration. Same bf16
            # rate-quantization class as the (ea, es) pack.
            pk = _gather_chunked(sa_ref, cell, n_chunks)
            inv_sigt = _bf16_lo(pk)
            p_abs = _bf16_hi(pk) if has_absorption else None
        if nongray or use_ddmc:
            sig_t = es if ea is None else ea + es

        fi = ci.astype(jnp.float32)
        xl, xu = fi * dxb, (fi + 1.0) * dxb
        if multi_d:
            fj = cj.astype(jnp.float32)
            yl, yu = fj * dyb, (fj + 1.0) * dyb
        if three_d:
            fk = ck.astype(jnp.float32)
            zl, zu = fk * dzb, (fk + 1.0) * dzb

        if use_ddmc:
            is_ddmc = active & (dmin * sig_t > jnp.float32(tau_ddmc))
            act_imc = active & ~is_ddmc
        else:
            is_ddmc = jnp.zeros(shape, bool)
            act_imc = active

        # Competing-risks collision sampling: min of the absorption and
        # scattering exponentials is one exponential at the total rate; the
        # branch is chosen with probability ea/(ea+es) (transport.cpp draws
        # the two distances separately — identical in distribution, one log
        # and one divide cheaper here). Non-DDMC gray tables carry
        # (p_abs, 1/sig_t) directly, turning the divide into a multiply.
        if inv_sigt is not None:
            d_coll = pool.exp23(it) * inv_sigt
        else:
            d_coll = pool.exp23(it) / (sig_t + tiny)
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
        if multi_d:
            fyd = face_dist(vy, yl, yu, y)
        if three_d:
            fzd = face_dist(vz, zl, zu, z)

        if three_d:
            d_push = jnp.minimum(jnp.minimum(d_geom, fxd), jnp.minimum(fyd, fzd))
        elif multi_d:
            d_push = jnp.minimum(jnp.minimum(d_geom, fxd), fyd)
        else:
            d_push = jnp.minimum(d_geom, fxd)
        coll = act_imc & (d_coll < d_push)
        if has_absorption:
            if p_abs is not None:
                i_abs = coll & (u_branch < p_abs)
            else:
                i_abs = coll & (u_branch * sig_t < ea)
            i_sc = coll & ~i_abs
        else:
            i_abs = jnp.zeros(shape, bool)
            i_sc = coll
        no_coll = act_imc & ~coll
        cr_x = no_coll & (fxd <= d_geom)
        if multi_d:
            cr_x = cr_x & (fxd <= fyd)
            cr_y = no_coll & ~cr_x & (fyd <= d_geom)
        if three_d:
            cr_x = cr_x & (fxd <= fzd)
            cr_y = cr_y & (fyd <= fzd)
            cr_z = no_coll & ~cr_x & ~cr_y & (fzd <= d_geom)
        no_cross = no_coll & ~cr_x
        if multi_d:
            no_cross = no_cross & ~cr_y
        if three_d:
            no_cross = no_cross & ~cr_z
        i_census = no_cross & (d_end <= dmin)

        d = jnp.where(coll, d_coll, d_push)
        # zero the step for lanes at census/dead: every downstream position/
        # tau/index update then degenerates to the identity, which replaces
        # the 13 per-field end-of-body selects with this single one
        d = jnp.where(active, d, 0.0)
        ntau = jnp.where(i_census, 1.0, tau + d * inv_cdt)
        step = d * inv_c
        nx_ = x + vx * step
        ny_ = y + vy * step if multi_d else y
        nz_ = z + vz * step if three_d else z
        nx_ = jnp.where(cr_x, jnp.where(vx > 0, xu, xl), nx_)
        nci = ci + jnp.where(cr_x, jnp.where(vx > 0, 1, -1), 0)
        if multi_d:
            ny_ = jnp.where(cr_y, jnp.where(vy > 0, yu, yl), ny_)
            ncj = cj + jnp.where(cr_y, jnp.where(vy > 0, 1, -1), 0)
        else:
            ncj = cj
        if three_d:
            nz_ = jnp.where(cr_z, jnp.where(vz > 0, zu, zl), nz_)
            nck = ck + jnp.where(cr_z, jnp.where(vz > 0, 1, -1), 0)
        else:
            nck = ck

        # isotropic scatter redraw (scattering.hpp:21-29); the azimuth pair
        # comes from pool.circle — one transcendental instead of cos+sin.
        # 1D: azimuth is unobservable (slab symmetry — transport, tallies and
        # BCs read only vx), so draw the x-projection directly (uniform on
        # [-c, c]) and park the whole transverse magnitude in vy, keeping
        # |v| = c for the debug invariant. Skips the circle word + cos.
        mu = 1.0 - 2.0 * pool.u16(it)
        st = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        if multi_d:
            cph, sph = pool.circle(it)
            nvx = jnp.where(i_sc, c * st * cph, vx)
            nvy = jnp.where(i_sc, c * st * sph, vy)
            nvz = jnp.where(i_sc, c * mu, vz)
        else:
            nvx = jnp.where(i_sc, c * mu, vx)
            nvy = jnp.where(i_sc, c * st, vy)
            nvz = jnp.where(i_sc, 0.0, vz)

        nalive = jnp.where(i_abs, 0, alive)
        nabsorbed = jnp.where(i_abs, 1, absorbed)
        # face-arrival code (see ParticleLedger.face): a crossing pins the
        # particle onto a face of its new cell; any other outcome clears it.
        # Only the DDMC at-face albedo test ever reads it — skip when off.
        if use_ddmc:
            nface = jnp.where(cr_x, jnp.where(vx > 0, 1, -1), 0).astype(jnp.int32)
            if multi_d:
                nface = jnp.where(cr_y, jnp.where(vy > 0, 2, -2), nface)
            if three_d:
                nface = jnp.where(cr_z, jnp.where(vz > 0, 3, -3), nface)
        else:
            nface = face

        # ================= DDMC branch (ptcl_ddmc_albedo / ptcl_ddmc_step) ====
        if use_ddmc:
            ea_dd = jnp.zeros(shape) if ea is None else ea
            # reciprocal cell sizes: one divide per axis feeds the two face
            # leak terms (and the albedo prob shares the per-axis divide too)
            if single_block:
                inv_dxb = jnp.float32(1.0 / block_dx0[0])
                inv_dyb = jnp.float32(1.0 / block_dx0[1])
                inv_dzb = jnp.float32(1.0 / block_dx0[2])
            else:
                inv_dxb = 1.0 / dxb
                inv_dyb = 1.0 / dyb if multi_d else inv_dxb
                inv_dzb = 1.0 / dzb if three_d else inv_dxb
            # at-face detection keys on the IMC-crossing arrival flag; codes are
            # mutually exclusive (see ops/transport.py and ParticleLedger.face)
            # — entry order per axis: (lower-face arrival +code, upper -code)
            sel = [is_ddmc & (face == 1), is_ddmc & (face == -1)]
            if multi_d:
                sel += [is_ddmc & (face == 2), is_ddmc & (face == -2)]
            if three_d:
                sel += [is_ddmc & (face == 3), is_ddmc & (face == -3)]
            at_face = is_ddmc & (face != 0)

            lam2 = jnp.float32(2.0 * 0.7104)
            P = jnp.zeros(shape)
            axis_geoms = [(dxb, vx), (dyb, vy), (dzb, vz)][:ndim]
            for ax, (fdx_, fv) in enumerate(axis_geoms):
                Pf2 = 2.0 * (2.0 / 3.0) / (sig_t * fdx_ + lam2)
                drift = 1.5 * fv * inv_c
                P = jnp.where(sel[2 * ax], Pf2 * (1.0 + drift), P)
                P = jnp.where(sel[2 * ax + 1], Pf2 * (1.0 - drift), P)
            rejected = at_face & (pool.u23(it) > P)

            # hemisphere direction for bounce-back / leak (1D: azimuth
            # unobservable — transverse magnitude rides in the v2 slot)
            amu = jnp.sqrt(pool.u16(it))
            anu = jnp.sqrt(jnp.maximum(1.0 - amu * amu, 0.0))
            if multi_d:
                aph, ash = pool.circle(it)
                a1, a2, a3 = amu, anu * aph, anu * ash
            else:
                a1, a2, a3 = amu, anu, jnp.zeros(shape)

            rj_x, rj_y, rj_z = x, y, z
            rj_vx, rj_vy, rj_vz = vx, vy, vz
            rj_si = jnp.zeros(shape, jnp.int32)
            rj_sj = jnp.zeros(shape, jnp.int32) if multi_d else None
            rj_sk = jnp.zeros(shape, jnp.int32) if three_d else None
            eps_i = jnp.float32(eps_imc)
            face_axes = ((0, True), (0, False), (1, True), (1, False),
                         (2, True), (2, False))[: 2 * ndim]
            for e, (axis, lower) in enumerate(face_axes):
                m = sel[e]
                sgn = jnp.float32(-1.0 if lower else 1.0)  # away from the cell
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

            # in-cell DDMC step: per-cell (P_lower, P_upper) pair gathers —
            # one scan per axis with the SAME cell index as the coefficients
            wx = _gather_chunked(fpx_ref, cell, n_fchunks[0])
            lk = [_bf16_hi(wx) * inv_dxb, _bf16_lo(wx) * inv_dxb]
            if multi_d:
                wy = _gather_chunked(fpy_ref, cell, n_fchunks[1])
                lk += [_bf16_hi(wy) * inv_dyb, _bf16_lo(wy) * inv_dyb]
            if three_d:
                wz = _gather_chunked(fpz_ref, cell, n_fchunks[2])
                lk += [_bf16_hi(wz) * inv_dzb, _bf16_lo(wz) * inv_dzb]

            leak_tot = lk[0] + lk[1]
            for l in lk[2:]:
                leak_tot = leak_tot + l
            cdf = ea_dd + leak_tot + tiny
            dt_ev = pool.exp23(it) / (c * cdf)
            dt_rem = dt * (1.0 - tau)
            is_event = dt_ev < dt_rem
            do_step = is_ddmc & ~rejected

            dd_tau = jnp.where(is_event, tau + dt_ev * (1.0 / dt), 1.0)
            xi = cdf * pool.u23(it)
            dd_absorbed = do_step & is_event & (xi < ea_dd)
            xim = xi - ea_dd
            cum = jnp.zeros(shape)
            leak_sel = []
            leak_any = jnp.zeros(shape, bool)
            for l in lk:
                m = do_step & is_event & ~dd_absorbed & ~leak_any & (xim < cum + l)
                leak_sel.append(m)
                leak_any = leak_any | m
                cum = cum + l
            # numerical fall-through lands on the last active face
            fall = do_step & is_event & ~dd_absorbed & ~leak_any
            leak_sel[-1] = leak_sel[-1] | fall

            bmu = jnp.sqrt(pool.u16(it))
            bnu = jnp.sqrt(jnp.maximum(1.0 - bmu * bmu, 0.0))
            if multi_d:
                bph, bsh = pool.circle(it)
                b1, b2, b3 = bmu, bnu * bph, bnu * bsh
            else:
                b1, b2, b3 = bmu, bnu, jnp.zeros(shape)

            dd_x, dd_y, dd_z = x, y, z
            dd_vx, dd_vy, dd_vz = vx, vy, vz
            dd_si = jnp.zeros(shape, jnp.int32)
            dd_sj = jnp.zeros(shape, jnp.int32) if multi_d else None
            dd_sk = jnp.zeros(shape, jnp.int32) if three_d else None
            dd_leak = jnp.zeros(shape, jnp.int32)  # +-(axis+1) of a leak this event
            cx_ = xl + 0.5 * dxb
            cy_ = yl + 0.5 * dyb if multi_d else None
            cz_ = zl + 0.5 * dzb if three_d else None
            eps_d = jnp.float32(eps_ddmc)
            for e, (axis, lower) in enumerate(face_axes):
                m = leak_sel[e]
                dd_leak = jnp.where(m, (-1 if lower else 1) * (axis + 1), dd_leak)
                out_sgn = jnp.float32(-1.0 if lower else 1.0)
                v1, v2, v3 = c * out_sgn * b1, c * b2, c * b3
                if axis == 0:
                    dd_x = jnp.where(m, jnp.where(lower, xl - eps_d * dxb, xu + eps_d * dxb), dd_x)
                    if multi_d:
                        dd_y = jnp.where(m, cy_, dd_y)
                    if three_d:
                        dd_z = jnp.where(m, cz_, dd_z)
                    dd_vx = jnp.where(m, v1, dd_vx)
                    dd_vy = jnp.where(m, v2, dd_vy)
                    dd_vz = jnp.where(m, v3, dd_vz)
                    dd_si = jnp.where(m, -1 if lower else 1, dd_si)
                elif axis == 1:
                    dd_y = jnp.where(m, jnp.where(lower, yl - eps_d * dyb, yu + eps_d * dyb), dd_y)
                    if three_d:
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

            # census: resample position uniformly in the cell + isotropic direction
            dd_census = do_step & ~is_event
            dd_x = jnp.where(dd_census, xl + pool.u16(it) * dxb, dd_x)
            if multi_d:
                dd_y = jnp.where(dd_census, yl + pool.u16(it) * dyb, dd_y)
            if three_d:
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

            # merge rejected-bounce (no time advance) with step results
            # (1D/2D: the gated updates above never touch transverse y/z, so
            # those merges are identities and are skipped)
            dd_x = jnp.where(rejected, rj_x, dd_x)
            dd_vx = jnp.where(rejected, rj_vx, dd_vx)
            dd_vy = jnp.where(rejected, rj_vy, dd_vy)
            dd_vz = jnp.where(rejected, rj_vz, dd_vz)
            dd_si = jnp.where(rejected, rj_si, dd_si)
            if multi_d:
                dd_y = jnp.where(rejected, rj_y, dd_y)
                dd_sj = jnp.where(rejected, rj_sj, dd_sj)
            if three_d:
                dd_z = jnp.where(rejected, rj_z, dd_z)
                dd_sk = jnp.where(rejected, rj_sk, dd_sk)
            dd_tau = jnp.where(rejected, tau, dd_tau)
            dd_leak = jnp.where(rejected, 0, dd_leak)

            # merge DDMC results over the IMC ones
            nx_ = jnp.where(is_ddmc, dd_x, nx_)
            if multi_d:
                ny_ = jnp.where(is_ddmc, dd_y, ny_)
            if three_d:
                nz_ = jnp.where(is_ddmc, dd_z, nz_)
            nvx = jnp.where(is_ddmc, dd_vx, nvx)
            nvy = jnp.where(is_ddmc, dd_vy, nvy)
            nvz = jnp.where(is_ddmc, dd_vz, nvz)
            ntau = jnp.where(is_ddmc, dd_tau, ntau)
            nci = jnp.where(is_ddmc, ci + dd_si, nci)
            if multi_d:
                ncj = jnp.where(is_ddmc, cj + dd_sj, ncj)
            if three_d:
                nck = jnp.where(is_ddmc, ck + dd_sk, nck)
            nalive = jnp.where(dd_absorbed, 0, nalive)
            nabsorbed = jnp.where(dd_absorbed, 1, nabsorbed)
            # every DDMC outcome leaves the particle off-face
            nface = jnp.where(is_ddmc, 0, nface)
            nleak = jnp.where(is_ddmc, dd_leak, 0)
        else:
            nleak = jnp.zeros(shape, jnp.int32)

        # ---- block transition / domain BCs ------------------------------
        out_lo_x, out_hi_x = nci < 0, nci >= nx
        if multi_d:
            out_lo_y, out_hi_y = ncj < 0, ncj >= ny
        if three_d:
            out_lo_z, out_hi_z = nck < 0, nck >= nz

        # 1D/2D: transverse positions never move (no crossings, no DDMC
        # transverse recenter — see the dim gates above), so the global
        # rebase/BC machinery runs only on transport axes
        if single_block:
            gx = jnp.float32(block_org0[0]) + nx_
            gy = jnp.float32(block_org0[1]) + ny_ if multi_d else None
            gz = jnp.float32(block_org0[2]) + nz_ if three_d else None
        else:
            gx = _gather(box_ref, blk, nb_chunks) + nx_
            gy = _gather(boy_ref, blk, nb_chunks) + ny_ if multi_d else None
            gz = _gather(boz_ref, blk, nb_chunks) + nz_ if three_d else None

        def apply_bc(g, v, lo, hi, o_lo, o_hi, bc_lo, bc_hi, al, fc, half):
            # Half-finest-cell tolerant hit test + domain clip, mirroring
            # ops/transport.py::apply_bc (inexact deck extents round the pinned
            # face position below the bound; exact comparison would livelock).
            # fc is None when DDMC is off (nothing reads the face code then).
            L = jnp.float32(hi - lo)
            lo = jnp.float32(lo)
            hi = jnp.float32(hi)
            hit_lo = o_lo & (g <= lo + jnp.float32(half))
            hit_hi = o_hi & (g >= hi - jnp.float32(half))
            if bc_lo == BC.reflecting:
                g = jnp.where(hit_lo, jnp.clip(2.0 * lo - g, lo, hi), g)
                v = jnp.where(hit_lo, -v, v)
                if fc is not None:
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

        out = out_lo_x | out_hi_x
        if multi_d:
            out = out | out_lo_y | out_hi_y
        if three_d:
            out = out | out_lo_z | out_hi_z
        out = out & (nalive != 0)
        if single_block:
            # transitions are BC-only: rebase the (possibly reflected/wrapped)
            # global position into the single block (cell size is static, so
            # the divides fold to reciprocal multiplies)
            lx = gx - jnp.float32(block_org0[0])
            ri = jnp.clip(
                (lx * jnp.float32(1.0 / block_dx0[0])).astype(jnp.int32),
                0, nx - 1,
            )
            if multi_d:
                ly = gy - jnp.float32(block_org0[1])
                rj = jnp.clip(
                    (ly * jnp.float32(1.0 / block_dx0[1])).astype(jnp.int32),
                    0, ny - 1,
                )
            else:
                ly, rj = ny_, cj
            if three_d:
                lz = gz - jnp.float32(block_org0[2])
                rk = jnp.clip(
                    (lz * jnp.float32(1.0 / block_dx0[2])).astype(jnp.int32),
                    0, nz - 1,
                )
            else:
                lz, rk = nz_, ck
            nblk = blk
        else:
            # lookup probe: nudge half a finest cell along the CROSSED face's
            # normal (known exactly from the out flags). A velocity-based nudge
            # vanishes for grazing crossings and can map the particle back into
            # the block it just left, where the face distance is 0 and crossing
            # always beats scattering — a zero-progress spin to the iteration
            # cap. Non-crossing axes keep the small directional tiebreak.
            sgx = jnp.where(out_hi_x, 1.0, 0.0) - jnp.where(out_lo_x, 1.0, 0.0)
            px = gx + jnp.where(
                sgx != 0.0, jnp.float32(0.5 * finest[0]) * sgx,
                jnp.float32(0.01 * finest[0]) * (nvx * inv_c))
            tx = jnp.clip(jnp.floor((px - x1min) / tsx).astype(jnp.int32), 0, ntx - 1)
            tidx = tx
            if multi_d:
                sgy = jnp.where(out_hi_y, 1.0, 0.0) - jnp.where(out_lo_y, 1.0, 0.0)
                py = gy + jnp.where(
                    sgy != 0.0, jnp.float32(0.5 * finest[1]) * sgy,
                    jnp.float32(0.01 * finest[1]) * (nvy * inv_c))
                ty = jnp.clip(
                    jnp.floor((py - x2min) / tsy).astype(jnp.int32), 0, nty - 1
                )
                tidx = ty * ntx + tx
            if three_d:
                sgz = jnp.where(out_hi_z, 1.0, 0.0) - jnp.where(out_lo_z, 1.0, 0.0)
                pz = gz + jnp.where(
                    sgz != 0.0, jnp.float32(0.5 * finest[2]) * sgz,
                    jnp.float32(0.01 * finest[2]) * (nvz * inv_c))
                tz = jnp.clip(
                    jnp.floor((pz - x3min) / tsz).astype(jnp.int32), 0, ntz - 1
                )
                tidx = (tz * nty + ty) * ntx + tx
            b_new = _gather(lut_ref, tidx, nt_chunks)
            ndxb = _gather(bdx_ref, b_new, nb_chunks)
            lx = gx - _gather(box_ref, b_new, nb_chunks)
            ri = jnp.clip(jnp.floor(lx / ndxb).astype(jnp.int32), 0, nx - 1)
            if multi_d:
                ndyb = _gather(bdy_ref, b_new, nb_chunks)
                ly = gy - _gather(boy_ref, b_new, nb_chunks)
                rj = jnp.clip(jnp.floor(ly / ndyb).astype(jnp.int32), 0, ny - 1)
            else:
                ndyb, ly, rj = None, ny_, cj
            if three_d:
                ndzb = _gather(bdz_ref, b_new, nb_chunks)
                lz = gz - _gather(boz_ref, b_new, nb_chunks)
                rk = jnp.clip(jnp.floor(lz / ndzb).astype(jnp.int32), 0, nz - 1)
            else:
                ndzb, lz, rk = None, nz_, ck
            nblk = jnp.where(out, b_new, blk)

            if use_ddmc and has_smr and multi_d:
                # ---- DDMC coarse->fine subface resample ----------------------
                # In-kernel port of ops/transport.py::_ddmc_subface_resample
                # (reference SampleFace2D/3D, sample_ddmc_bface.cpp:24-78): a DDMC
                # leak into a FINER block landed at the transverse center of the
                # coarse source cell — exactly on the edge (2D) / corner (3D)
                # shared by 2 / 4 fine faces. Choose a fine face with probability
                # proportional to its ddmc_face_prob, re-seat the transverse
                # position uniformly on it, and redraw a hemisphere direction
                # into the block.
                lvl_old = _gather(blv_ref, blk, nb_chunks)
                lvl_new = _gather(blv_ref, b_new, nb_chunks)
                refine = out & (nleak != 0) & (lvl_new > lvl_old)
                lax_axis = jnp.abs(nleak) - 1
                lsgn = jnp.sign(nleak).astype(jnp.float32)
                u_sel = pool.u16(it)
                u_t1 = pool.u16(it)
                u_t2 = pool.u16(it) if three_d else None
                smu = jnp.sqrt(pool.u16(it))
                snu = jnp.sqrt(jnp.maximum(1.0 - smu * smu, 0.0))
                sph, ssh = pool.circle(it)
                a1, a2, a3 = smu, snu * sph, snu * ssh

                dims = (nx, ny, nz)
                locs = [lx, ly, lz]
                idxs = [ri, rj, rk]
                dxs = [ndxb, ndyb, ndzb]
                fprefs = (fpx_ref, fpy_ref, fpz_ref)

                # per-cell pair tables: the entered face is the LOWER face of
                # cell 0 when the particle leaked in +ax (lsgn > 0), else the
                # UPPER face of cell dims[ax]-1
                take_upper = lsgn < 0.0

                def face_prob(ax, kk_, jj_, ii_):
                    flat = ((b_new * nz + kk_) * ny + jj_) * nx + ii_
                    w = _gather(fprefs[ax], flat, n_fchunks[ax])
                    return jnp.where(take_upper, _bf16_lo(w), _bf16_hi(w))

                new_loc = list(locs)
                new_idx = list(idxs)
                new_v = [nvx, nvy, nvz]
                for ax in range(ndim):
                    m_ax = refine & (lax_axis == ax)
                    f_ax = jnp.where(lsgn > 0, 0, dims[ax] - 1).astype(jnp.int32)
                    trans = [t for t in range(ndim) if t != ax]
                    if not trans:
                        continue
                    t1 = trans[0]
                    d1 = dxs[t1]
                    e1 = jnp.clip(
                        jnp.round(locs[t1] / jnp.maximum(d1, tiny)).astype(jnp.int32),
                        1, dims[t1] - 1,
                    )
                    lo1, hi1 = e1 - 1, e1

                    def fidx(c1, c2=None):
                        kji = [None, None, None]
                        kji[ax] = f_ax
                        kji[t1] = c1
                        if len(trans) > 1 and c2 is not None:
                            kji[trans[1]] = c2
                        for d in range(3):
                            if kji[d] is None:
                                kji[d] = jnp.clip(idxs[d], 0, dims[d] - 1)
                        return kji[2], kji[1], kji[0]

                    if len(trans) == 1:
                        k_l, j_l, i_l = fidx(lo1)
                        k_u, j_u, i_u = fidx(hi1)
                        P_l = face_prob(ax, k_l, j_l, i_l)
                        P_u = face_prob(ax, k_u, j_u, i_u)
                        pick_u = u_sel * (P_l + P_u) >= P_l
                        c1 = jnp.where(pick_u, hi1, lo1)
                        new_idx[t1] = jnp.where(m_ax, c1, new_idx[t1])
                        new_loc[t1] = jnp.where(
                            m_ax, (c1.astype(jnp.float32) + u_t1) * d1, new_loc[t1]
                        )
                    else:
                        t2 = trans[1]
                        d2 = dxs[t2]
                        e2 = jnp.clip(
                            jnp.round(locs[t2] / jnp.maximum(d2, tiny)).astype(jnp.int32),
                            1, dims[t2] - 1,
                        )
                        lo2, hi2 = e2 - 1, e2
                        cands = [(lo1, lo2), (hi1, lo2), (lo1, hi2), (hi1, hi2)]
                        Ps = []
                        for c1, c2 in cands:
                            k_, j_, i_ = fidx(c1, c2)
                            Ps.append(face_prob(ax, k_, j_, i_))
                        tot = Ps[0] + Ps[1] + Ps[2] + Ps[3] + tiny
                        xi_ = u_sel * tot
                        cum = jnp.zeros(shape)
                        sel1 = jnp.zeros(shape, jnp.int32)
                        sel2 = jnp.zeros(shape, jnp.int32)
                        chosen = jnp.zeros(shape, bool)
                        for (c1, c2), P in zip(cands, Ps):
                            hitc = ~chosen & (xi_ < cum + P)
                            sel1 = jnp.where(hitc, c1, sel1)
                            sel2 = jnp.where(hitc, c2, sel2)
                            chosen = chosen | hitc
                            cum = cum + P
                        sel1 = jnp.where(chosen, sel1, hi1)
                        sel2 = jnp.where(chosen, sel2, hi2)
                        new_idx[t1] = jnp.where(m_ax, sel1, new_idx[t1])
                        new_idx[t2] = jnp.where(m_ax, sel2, new_idx[t2])
                        new_loc[t1] = jnp.where(
                            m_ax, (sel1.astype(jnp.float32) + u_t1) * d1, new_loc[t1]
                        )
                        new_loc[t2] = jnp.where(
                            m_ax, (sel2.astype(jnp.float32) + u_t2) * d2, new_loc[t2]
                        )

                    # hemisphere direction into the block (cyclic permutation as
                    # in sample_face_iso_dir call sites)
                    v_ax = c * lsgn * a1
                    v_n1 = c * a2
                    v_n2 = c * a3
                    perm = {0: (0, 1, 2), 1: (1, 2, 0), 2: (2, 0, 1)}[ax]
                    vals = [None, None, None]
                    vals[perm[0]] = v_ax
                    vals[perm[1]] = v_n1
                    vals[perm[2]] = v_n2
                    for d in range(3):
                        new_v[d] = jnp.where(m_ax, vals[d], new_v[d])

                lx, ly, lz = new_loc
                ri, rj, rk = new_idx
                nvx, nvy, nvz = new_v

        nx_ = jnp.where(out, lx, nx_)
        nci = jnp.where(out, ri, jnp.clip(nci, 0, nx - 1))
        if multi_d:
            ny_ = jnp.where(out, ly, ny_)
            ncj = jnp.where(out, rj, jnp.clip(ncj, 0, ny - 1))
        if three_d:
            nz_ = jnp.where(out, lz, nz_)
            nck = jnp.where(out, rk, jnp.clip(nck, 0, nz - 1))

        # Inactive lanes already pass every field through unchanged (the d=0
        # zeroing above degenerates all updates to the identity, and every
        # event/BC mask includes ``active``) — no per-field final select.
        # ``face`` is the one exception: its IMC chain rebuilds from 0.
        if use_ddmc:
            nface = jnp.where(active, nface, face)
        return (
            nx_, ny_, nz_, nvx, nvy, nvz, ntau,
            nblk, nci, ncj, nck, nalive, nabsorbed, nface,
            it + 1,
            # per-lane active-iteration counter: one elementwise add per
            # iteration; the cross-lane event total reduces ONCE after the loop
            ev + active.astype(jnp.int32),
        )

    def cond(carry):
        tau, alive, it = carry[6], carry[11], carry[14]
        return (it < max_iters) & jnp.any((alive != 0) & (tau < 1.0))

    energy = en_ref[:]  # constant through the census loop
    init = (
        x_ref[:], y_ref[:], z_ref[:],
        vx_ref[:], vy_ref[:], vz_ref[:], tau_ref[:],
        blk_ref[:], ci_ref[:], cj_ref[:], ck_ref[:],
        alive_ref[:], absorbed_ref[:], face_ref[:],
        jnp.int32(0), jnp.zeros(shape, jnp.int32),
    )
    (x, y, z, vx, vy, vz, tau, blk, ci, cj, ck, alive, absorbed, face, it, ev) = (
        census_while(cond, body, init)
    )
    ev = jnp.sum(ev)
    ox_ref[:], oy_ref[:], oz_ref[:] = x, y, z
    ovx_ref[:], ovy_ref[:], ovz_ref[:] = vx, vy, vz
    otau_ref[:] = tau
    oblk_ref[:], oci_ref[:], ocj_ref[:], ock_ref[:] = blk, ci, cj, ck
    oalive_ref[:], oabsorbed_ref[:], oface_ref[:] = alive, absorbed, face

    # grid steps run sequentially on a TensorCore: accumulate stats in-place
    @pl.when(pl.program_id(0) == 0)
    def _init_stats():
        ev_ref[0, 0] = 0
        it_ref[0, 0] = 0

    ev_ref[0, 0] = ev_ref[0, 0] + ev
    it_ref[0, 0] = jnp.maximum(it_ref[0, 0], it)


def transport_pallas(particles, coefs, mesh, key, prm, dt, interpret=False):
    """Drop-in replacement for ``transport_ops.transport`` on supported configs.

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU-testable).
    Returns (particles, iterations, events)."""
    p = particles
    cap = p.capacity
    assert cap % TILE == 0, f"ledger capacity {cap} not a multiple of {TILE}"
    grid = cap // TILE

    def shape2(arr, dtype=None):
        a = arr if dtype is None else arr.astype(dtype)
        return a.reshape(grid * SUBLANES, LANES)

    f32 = jnp.float32
    i32 = jnp.int32
    mesh_b = mesh  # the block forest the ledger/coefs live on
    uniform = mesh.n_blocks > 1 and mesh.max_level == 0
    if uniform:
        # Uniform forest -> ONE synthetic block (see _uniform_view): shift the
        # ledger's block-local state to global-in-domain (O(n) elementwise, no
        # gathers — block decomposition is affine for a uniform root grid).
        # f32 shift round-trip error is <= nrb * extent * 2^-24, orders below
        # the eps_imc/eps_ddmc face offsets.
        nrbz, nrby, nrbx = mesh_b.root_grid
        bnds = mesh_b.bounds
        Dx = f32((bnds[1] - bnds[0]) / nrbx)
        Dy = f32((bnds[3] - bnds[2]) / nrby)
        Dz = f32((bnds[5] - bnds[4]) / nrbz)
        bx = p.block % nrbx
        by = (p.block // nrbx) % nrby
        bz = p.block // (nrbx * nrby)
        p = dataclasses.replace(
            p,
            x=p.x + bx.astype(f32) * Dx,
            y=p.y + by.astype(f32) * Dy,
            z=p.z + bz.astype(f32) * Dz,
            i=p.i + bx * mesh_b.nx,
            j=p.j + by * mesh_b.ny,
            k=p.k + bz * mesh_b.nz,
            block=jnp.zeros_like(p.block),
        )
        mesh = _uniform_view(mesh_b)
        remap = functools.partial(_to_global_cells, mesh=mesh_b)
    else:
        remap = lambda v: v  # noqa: E731
    K = _n_chunks(mesh)
    Kb = _n_bchunks(mesh)
    Kt = _n_tchunks(mesh)
    nongray = coefs.opacity is not None
    if nongray:
        # per-event model evaluation: ship (rho, temp, fleck) instead of
        # precomputed coefficients (coefs.packed columns, see TransportCoefs)
        sa_t = _chunk_table(remap(coefs.packed[:, 0]), f32, K)
        ss_t = _chunk_table(remap(coefs.packed[:, 1]), f32, K)
        ff_t = _chunk_table(remap(coefs.packed[:, 2]), f32, K)
    else:
        # gray path: the kernel only ever needs the derived collision-rate
        # pair (ea = fleck*sigma_a, es = sigma_s + (1-fleck)*sigma_a;
        # sigma_t = ea + es), bf16-packed into ONE chunked table per event
        # (sa_ref carries the pair word; ss_ref is never read). Without DDMC
        # the loop consumes only sig_t-as-divisor and the absorption branch
        # probability, so the pair is (p_abs = ea/sig_t, 1/sig_t) instead —
        # the divides move here, out of the census loop.
        ea_vec = (
            coefs.fleck * coefs.sigma_a if prm.has_absorption
            else jnp.zeros_like(coefs.sigma_s)
        )
        es_vec = (
            coefs.sigma_s + (1.0 - coefs.fleck) * coefs.sigma_a
            if prm.has_absorption else coefs.sigma_s
        )
        if prm.use_ddmc:
            pair_vec = _pack_bf16_pair(ea_vec, es_vec)
        else:
            inv_vec = 1.0 / (ea_vec + es_vec + jnp.float32(1.0e-37))
            pair_vec = _pack_bf16_pair(ea_vec * inv_vec, inv_vec)
        sa_t = _chunk_table(remap(pair_vec), i32, K)
        ss_t = jnp.zeros((GREP, LANES), f32)  # never read in the kernel
        ff_t = jnp.zeros((GREP, LANES), f32)  # never read in the kernel
    Kf = _n_fchunks(mesh, prm)
    if prm.use_ddmc:
        # per-cell bf16-packed (P_lower, P_upper) pairs per axis (cell-sized
        # tables gathered with the same cell index as the coefficients; built
        # on the BLOCK forest's face arrays, then remapped like cell tables)
        pxp, pyp, pzp = _face_pair_vectors(coefs, mesh_b.nx, mesh_b.ny, mesh_b.nz)
        fpx_t = _chunk_table(remap(pxp), i32, Kf[0])
        fpy_t = _chunk_table(remap(pyp), i32, Kf[1])
        fpz_t = _chunk_table(remap(pzp), i32, Kf[2])
    else:
        fpx_t = fpy_t = fpz_t = jnp.zeros((GREP, LANES), i32)
    bdx_t = _chunk_table(mesh.block_dx[:, 0], f32, Kb)
    bdy_t = _chunk_table(mesh.block_dx[:, 1], f32, Kb)
    bdz_t = _chunk_table(mesh.block_dx[:, 2], f32, Kb)
    box_t = _chunk_table(mesh.block_origin[:, 0], f32, Kb)
    boy_t = _chunk_table(mesh.block_origin[:, 1], f32, Kb)
    boz_t = _chunk_table(mesh.block_origin[:, 2], f32, Kb)
    lut_t = _chunk_table(mesh.lookup.reshape(-1), i32, Kt)
    blv_t = _chunk_table(mesh.block_level, i32, Kb)

    single_block = mesh.n_blocks == 1
    # static single-block geometry comes from the mesh build (host numpy values)
    if single_block:
        bounds = mesh.bounds
        block_dx0 = (
            (bounds[1] - bounds[0]) / mesh.nx,
            (bounds[3] - bounds[2]) / mesh.ny,
            (bounds[5] - bounds[4]) / mesh.nz,
        )
        block_org0 = (bounds[0], bounds[2], bounds[4])
    else:
        block_dx0 = block_org0 = (0.0, 0.0, 0.0)

    prm_static = (
        prm.ndim, mesh.nx, mesh.ny, mesh.nz, prm.max_iters,
        tuple(prm.swarm_bc), tuple(float(b) for b in mesh.bounds),
        mesh.tile_shape, mesh.finest, single_block, block_dx0, block_org0,
        prm.has_absorption, K, interpret,
        prm.use_ddmc, prm.tau_ddmc, prm.eps_imc, prm.eps_ddmc,
        Kf, Kb, Kt, mesh.max_level > 0, nongray,
    )

    scal = jnp.array([dt, prm.c, 0, 0, 0, 0, 0, 0], dtype=f32)
    try:
        kd = jax.random.key_data(key)
    except (TypeError, AttributeError):
        kd = key
    seed = kd.reshape(-1)[-1].astype(i32)[None]

    kernel = functools.partial(
        _transport_kernel, prm_static=prm_static,
        opacity=coefs.opacity, scattering=coefs.scattering,
    )
    part_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    def full_spec(arr):
        return pl.BlockSpec(arr.shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)

    inputs = [
        shape2(p.x, f32), shape2(p.y, f32), shape2(p.z, f32),
        shape2(p.vx, f32), shape2(p.vy, f32), shape2(p.vz, f32),
        shape2(p.tau, f32),
        shape2(p.block), shape2(p.i), shape2(p.j), shape2(p.k),
        shape2(p.alive, i32), shape2(p.absorbed, i32), shape2(p.face),
        shape2(p.energy, f32),
    ]
    tables = [
        sa_t, ss_t, ff_t, bdx_t, bdy_t, bdz_t, box_t, boy_t, boz_t, lut_t, blv_t,
        fpx_t, fpy_t, fpz_t,
    ]

    out_shapes = (
        [jax.ShapeDtypeStruct((grid * SUBLANES, LANES), f32)] * 7
        + [jax.ShapeDtypeStruct((grid * SUBLANES, LANES), i32)] * 7
        + [jax.ShapeDtypeStruct((1, 1), i32)] * 2
    )
    out_specs = [part_spec] * 14 + [stat_spec] * 2

    results = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        + [part_spec] * 15
        + [full_spec(t) for t in tables],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        input_output_aliases={i + 2: i for i in range(14)},
        interpret=interpret,
    )(scal, seed, *inputs, *tables)

    (x, y, z, vx, vy, vz, tau, blk, ci, cj, ck, alive, absorbed, face, ev, it) = results
    flat = lambda a: a.reshape(cap)
    if uniform:
        # global-in-domain -> block-local: the kernel keeps (ci, cj, ck) inside
        # the synthetic block, so integer division recovers the owning block
        bx = ci // mesh_b.nx
        by = cj // mesh_b.ny
        bz = ck // mesh_b.nz
        blk = (bz * nrby + by) * nrbx + bx
        ci = ci - bx * mesh_b.nx
        cj = cj - by * mesh_b.ny
        ck = ck - bz * mesh_b.nz
        x = x - bx.astype(f32) * Dx
        y = y - by.astype(f32) * Dy
        z = z - bz.astype(f32) * Dz
    p = dataclasses.replace(
        p,
        x=flat(x).astype(p.x.dtype), y=flat(y).astype(p.y.dtype), z=flat(z).astype(p.z.dtype),
        vx=flat(vx).astype(p.vx.dtype), vy=flat(vy).astype(p.vy.dtype), vz=flat(vz).astype(p.vz.dtype),
        tau=flat(tau).astype(p.tau.dtype),
        block=flat(blk), i=flat(ci), j=flat(cj), k=flat(ck),
        alive=flat(alive).astype(bool), absorbed=flat(absorbed).astype(bool),
        face=flat(face),
    )
    return p, it[0, 0], ev[0, 0]
