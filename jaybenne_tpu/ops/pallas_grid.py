"""Uniform-mesh bucketed Pallas transport with global cell tracking.

For single-level (uniform) meshes the block forest is pure bookkeeping: the mesh
IS one global Cartesian grid. This kernel drops every per-block table the
region-bucketed kernel (``ops/pallas_bucketed.py``) carries — block geometry,
origin, lookup-grid and block->region maps — by tracking particles with GLOBAL
integer cell indices ``(gi, gj, gk)`` and global positions:

  * cell faces are ``x1min + gi * dx`` with a STATIC cell size — no geometry
    gathers at all;
  * block transitions do not exist; a crossing is ``gi += 1``;
  * domain boundaries are exact integer tests (``gi < 0``, ``gi >= NX``) — no
    float face-tolerance machinery;
  * the only in-kernel gather left is ONE bf16-packed coefficient slab:
    word = pack(ea = fleck*sigma_a, es = sigma_s + (1-fleck)*sigma_a), 3
    vector ops per 128-entry chunk (sigma_t = ea + es covers every other
    coefficient use; DDMC adds 3 per-cell packed face-pair slabs).

Census bucketing works as in ``pallas_bucketed``: particles are sorted by
CORE region (an axis-aligned box of cells), a scalar-prefetched per-tile region
id drives the slab BlockSpecs, and a particle that pauses is re-bucketed next
round. The slab stores the core plus a HALO of ``HALO`` cells, and a particle
pauses only on leaving the halo box — so every re-bucket hands every particle
at least HALO cells of margin in every split axis, far beyond the per-step rms
walk of a diffusive particle, and the straggler tail dies in a couple of
rounds. (Phase-shifted region grids without a halo were tried first and
measured insufficient: a pauser resumes sitting ON the previous grid's face
and corner-walkers can find a pausing face in every phase — a ~0.9/round
straggler survival tail.)

Physics is the same event body as the other kernels: IMC
(``ptcl_transport_step``, reference ``transport_utils.hpp:111-160``) and the
DDMC branch with the face-flag albedo test (``transport_utils.hpp:163-397``).
Scope: uniform meshes only (SMR big meshes go to ``pallas_bucketed``; SMR that
fits VMEM goes to the full-residency kernel).
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
    GREP, LANES, RANGED_GATHER, RANGED_MIN_CHUNKS, _bf16_hi, _bf16_lo,
    _chunk_table, _gather, _gather_ranged, _gather_window, _pack_bf16_pair,
    _ranged_plan, census_while,
)

BSUB = 32                  # sublane groups per tile (4096-lane tiles).
#   r3 v5e sweep at 64^3 (200k particles): the kernel cost is dominated by
#   FIXED per-tile-iteration overhead x occupied tiles, and host bucketing by
#   tile padding waste (~BTILE/2 per occupied region), so FEWER regions with
#   BIGGER tiles wins despite longer chunk scans: (REGION 16384, BSUB 32)
#   0.589 s/step vs (8192, 16) 0.712 under equal load. 4-cell region cores
#   (REGION 2048 on 64^3) cause pause storms — keep cores >= 8 cells.
BTILE = BSUB * LANES
# target cells per region slab (IMC: 1 gathered table); JB_* env overrides
# exist for on-hardware sweeps only — committed defaults are the tuned values.
REGION_CELLS_IMC = int(os.environ.get("JB_REGION_CELLS_IMC", "16384"))
REGION_CELLS_DDMC = int(os.environ.get("JB_REGION_CELLS_DDMC", "2048"))
# smaller for DDMC: 4 packed cell tables per refresh (coefficient pair + 3
# per-cell face pairs) vs 1 for IMC
MAX_REGION_CHUNKS = 128    # slab gather cost cap (3 vector ops per chunk scanned)
MAX_BUCKET_ROUNDS = int(os.environ.get("JB_MAX_BUCKET_ROUNDS", "256"))
#   outer re-bucketing rounds (hang backstop); the env override exists for
#   JB_SKIP_KERNEL host-cost A/Bs at the production round count
TAIL_DIV = 4               # tail-round buffer = bufcap/TAIL_DIV (tile-aligned):
#   rounds >= 1 gather only still-unfinished rows (typically 10-25% after
#   round 0) into this smaller buffer; overflow waits for the next round.

# Coefficient-refresh cadence inside the kernel loop. The per-iteration cost
# at big-region sizes is DOMINATED by the chunked slab lookup (K_reg ~ 108
# chunks at 16384-cell regions x 3 vector ops per chunk; ONE bf16-packed
# (ea, es) table since the pair packing, vs ~3x fewer ops of event physics),
# but a particle's sigma only changes when its CELL changes — every ~tau_cell
# events in the diffusive regime. So the
# gathers run under a scalar lax.cond only on iterations where
# it % SIGMA_REFRESH == 0; lanes whose cell changed since the last refresh
# STALL (masked inactive, ~p_cross*R/2 extra iterations ~ 25%) until the next
# one. Disabled (cadence 1) when the scan is at most SIGMA_SCAN_MIN_CHUNKS
# chunks — there the stall costs more than the scan.
# Cadence swept on v5e at 64^3/200k (tst/bigmesh_bench.py, one process per
# point): 2 -> 9.27e8 ev/s, 4 -> 9.76e8, 8 -> 9.29e8, 16 -> 7.69e8. The
# stall penalty grows faster than the scan amortization past ~4; 4 ships.
SIGMA_REFRESH = int(os.environ.get("JB_SIGMA_REFRESH", "4"))
SIGMA_SCAN_MIN_CHUNKS = 8

# JB_FLOOR_ITERS=N: floor-probe mode (measurement only, never production).
# The census body keeps the production carry width and loop/cond structure but
# does NO slab gathers, NO RNG, and NO physics — each active lane just advances
# tau by 1/N, so every particle runs exactly ~N iterations and the census
# converges in one bucketing round. elapsed/iters then measures the EMPTY-LOOP
# floor of this kernel (the per-iteration cost that remains after all
# removable work), the same methodology as the mega-kernel's 13-carry floor
# probe in BENCH.md "Where the time goes".
FLOOR_ITERS = int(os.environ.get("JB_FLOOR_ITERS", "0"))


def _grid_dims(mesh):
    ntz, nty, ntx = mesh.tile_shape
    return ntx * mesh.nx, nty * mesh.ny, ntz * mesh.nz  # (NX, NY, NZ)


HALO = 4  # slab halo in cells beyond the core region box (along split axes)

# Bucketing-permutation backend: "radix" = LSD counting sort via one-hot
# cumsums, "lax" = jnp.argsort. Measured on v5e (64^3 stepdiff, 200k
# particles, production step): lax 1.035 s/step vs radix 1.14 s/step — the
# bitonic sort wins here, so it is the default; the radix path stays for
# hardware where the balance differs.
BUCKET_SORT = "lax"


def _stable_order(keyv, n_keys):
    """Stable ascending argsort of int32 keys in [0, n_keys): the permutation
    `order` with keyv[order] sorted and ties in original order.

    LSD radix-32 counting sort: each pass ranks elements within their digit via
    a one-hot inclusive cumsum (vector ops only), then composes the pass
    permutation. ceil(log32(n_keys)) passes; each costs one (n, 32) cumsum, one
    take_along_axis, one int scatter and two gathers — all bandwidth-bound,
    versus the O(log^2 n) compare-exchange depth of the bitonic sort behind
    jnp.argsort on TPU."""
    if BUCKET_SORT == "lax":
        return jnp.argsort(keyv, stable=True).astype(jnp.int32)
    i32 = jnp.int32
    n = keyv.shape[0]
    passes = max(1, -(-max(n_keys - 1, 1).bit_length() // 5))
    keys = keyv.astype(i32)
    perm = jnp.arange(n, dtype=i32)
    iota = jnp.arange(n, dtype=i32)
    lanes = jnp.arange(32, dtype=i32)[None, :]
    for p_ in range(passes):
        digit = (keys >> (5 * p_)) & 31
        oh = (digit[:, None] == lanes).astype(i32)
        ohc = jnp.cumsum(oh, axis=0)
        rank = jnp.take_along_axis(ohc, digit[:, None], axis=1)[:, 0] - 1
        counts = ohc[-1]
        offs = jnp.concatenate([jnp.zeros((1,), i32), jnp.cumsum(counts)[:-1]])
        pos = offs[digit] + rank
        inv = jnp.zeros((n,), i32).at[pos].set(iota)
        keys = keys[inv]
        perm = perm[inv]
    return perm


def _bucket_plan(keyv, n_regions, n_tiles, include_dump=True,
                 want_dest_of_src=True, btile=None, n_sub=1,
                 want_bases=False):
    """Gather-only bucketing plan over i32 keys in [0, n_regions * n_sub];
    key == ``n_regions * n_sub`` is the dump segment for finished/dead rows.

    ``n_sub`` (power of 2) is a WITHIN-region subkey multiplier: callers pass
    ``region * n_sub + sub`` so rows land cell-sorted inside each region
    (feeds the kernels' ranged chunk scans); the region-level layout (tile
    assignment, padding, offsets) is bit-identical to the ``n_sub=1`` plan.

    One stable ``lax.sort_key_val`` carries the permutation alongside the
    sorted keys (no post-sort key gather); per-region counts come from
    ``searchsorted`` diffs (no segment_sum scatter-add); and ``src_of_slot``
    is built by GATHERING from the sorted order through per-tile broadcast
    tables (no destination-sized scatter). Measured on v5e at ~0.9M rows this
    replaces ~25 ms of scatter-adds and key gathers per bucketing round with
    ~4 ms of sort+gather (argsort 1.2 ms vs segment_sum 8.3 ms alone).

    Returns ``(src_of_slot, tile_regions, dest_of_src)``:
      - ``src_of_slot`` (n_tiles*BTILE,): source row feeding each buffer slot,
        sentinel ``n`` (= len(keyv)) for empty slots. Regions are laid out in
        key order, each padded to a BTILE multiple; rows past the last tile
        simply get no slot (tail rounds: overflow waits for a later round).
      - ``tile_regions`` (n_tiles,): region of each tile (dump for padding).
      - ``dest_of_src`` (n,): slot of each source row (only meaningful when
        every row got a slot, i.e. full-buffer rounds), or None.
    """
    i32 = jnp.int32
    if btile is None:
        btile = BTILE
    assert n_sub & (n_sub - 1) == 0, n_sub  # decode by shift
    sub_shift = n_sub.bit_length() - 1
    n = keyv.shape[0]
    iota = jnp.arange(n, dtype=i32)
    ks, order = jax.lax.sort_key_val(keyv, iota, is_stable=True)
    first = jnp.searchsorted(
        ks, jnp.arange(n_regions + 1, dtype=ks.dtype) * n_sub
    ).astype(i32)
    counts = jnp.concatenate([first[1:], jnp.full((1,), n, i32)]) - first
    if not include_dump:
        counts = counts.at[n_regions].set(0)
    padded = -(-counts // btile) * btile
    pend = jnp.cumsum(padded)
    offs = pend - padded
    tile_starts = jnp.arange(n_tiles, dtype=i32) * btile
    tile_regions = jnp.minimum(
        jnp.searchsorted(pend, tile_starts, side="right").astype(i32),
        n_regions,
    )
    # per-slot (region, offset, count, first) via tiny per-tile gathers
    # broadcast across the tile — regions are BTILE-aligned by construction
    rank = (
        tile_starts[:, None] - offs[tile_regions][:, None]
        + jnp.arange(btile, dtype=i32)[None, :]
    )
    valid = (rank >= 0) & (rank < counts[tile_regions][:, None])
    src_idx = jnp.clip(first[tile_regions][:, None] + rank, 0, n - 1)
    src_of_slot = jnp.where(
        valid.reshape(-1), jnp.take(order, src_idx.reshape(-1)), n
    )
    dest_of_src = None
    if want_dest_of_src:
        # dest_sorted[j] = j + (padding inserted before region ks[j])
        dest_sorted = iota + jnp.take(offs - first, ks >> sub_shift)
        dest_of_src = jnp.zeros((n,), i32).at[order].set(dest_sorted)
    if not want_bases:
        return src_of_slot, tile_regions, dest_of_src
    # per-GREP-group FIRST (minimum) chunk id, for the windowed-scan path:
    # group g of a tile starts at sorted rank (group_start - region_offset)
    # within its region's key segment; the key there is the group's smallest
    # composite key (stable ascending sort), whose sub part IS the chunk id.
    # Groups holding no real rows (pure padding / dump) get base 0.
    G = btile // (GREP * LANES)
    g_start = (
        tile_starts[:, None]
        + jnp.arange(G, dtype=i32)[None, :] * (GREP * LANES)
    ).reshape(-1)
    reg_g = jnp.repeat(tile_regions, G)
    rank0 = g_start - jnp.take(offs, reg_g)
    valid = (
        (reg_g < n_regions)
        & (rank0 >= 0)
        & (rank0 < jnp.take(counts, reg_g))
    )
    key0 = jnp.take(ks, jnp.clip(jnp.take(first, reg_g) + rank0, 0, n - 1))
    bases = jnp.where(valid, key0 % n_sub, 0).astype(i32)
    return src_of_slot, tile_regions, dest_of_src, bases


def _bucket_sort_apply(keyv, rows, lid, n_regions, n_tiles, btile=None,
                       n_sub=1):
    """Sort-based bucketing: place ``rows`` ((n, C) i32) into a region-bucketed,
    ``btile``-aligned buffer of ``n_tiles * btile`` rows with ONE stable
    multi-payload sort, instead of building an index plan and row-gathering
    through it. TPU sorts are oblivious (fixed ~3 ms at ~1M rows regardless of
    key distribution) while the arbitrary-index row gather they replace costs
    15-21 ms — measured in-jit on the v5e, same process.

    Key construction (``n_sub=1``): real row of region r -> key 2r; pad row
    for region r -> key 2r+1 (sorts AFTER the reals of its region, BEFORE
    region r+1); the dump segment (key 2*n_regions / +1) collects finished
    rows and leftover pads at the end. Region layout (offsets, btile-rounded
    padding, stable original order within a region) is bit-identical to
    ``_bucket_plan``'s. With ``n_sub > 1`` (see ``_bucket_plan``) keyv is the
    composite ``region * n_sub + sub``: reals double to ``2*keyv``, region
    r's pads take ``2*(r+1)*n_sub - 1`` (after every real of r), and the
    region layout is unchanged — only within-region order becomes sub-sorted.

    ``lid`` ((n,) i32) rides as an extra payload — the caller's row-id map
    (pads get sentinel ``n``) — so the inverse permutation needs no scatter:
    restoring is one more sort keyed on the returned ``buf_lid``.

    Returns ``(buf_rows, buf_lid, tile_regions, buf_keys)`` — ``buf_keys``
    is the sorted DOUBLED key per buffer slot (real rows even: ``2*keyv``;
    pads odd), which the windowed-scan path decodes for per-group base
    chunks.
    """
    i32 = jnp.int32
    if btile is None:
        btile = BTILE
    n, C = rows.shape
    out = n_tiles * btile
    npads = out - n
    # worst-case per-region padding is btile-1 rows; the buffer is provisioned
    # for it (bufcap = cap + (R_pad+1)*BTILE rounded up)
    assert npads >= n_regions * (btile - 1), (npads, n_regions, btile)
    assert n_sub & (n_sub - 1) == 0, n_sub
    ks = jnp.sort(keyv)
    first = jnp.searchsorted(
        ks, jnp.arange(n_regions + 1, dtype=ks.dtype) * n_sub
    ).astype(i32)
    counts = jnp.concatenate([first[1:], jnp.full((1,), n, i32)]) - first
    padded = -(-counts // btile) * btile
    pend = jnp.cumsum(padded)
    tile_starts = jnp.arange(n_tiles, dtype=i32) * btile
    tile_regions = jnp.minimum(
        jnp.searchsorted(pend, tile_starts, side="right").astype(i32),
        n_regions,
    )
    padneed = (padded - counts)[:n_regions]  # in [0, btile-1] per region
    dump_pad = jnp.int32(2 * n_regions * n_sub + 1)
    grid = jnp.where(
        jnp.arange(btile - 1, dtype=i32)[None, :] < padneed[:, None],
        (2 * (jnp.arange(n_regions, dtype=i32) + 1) * n_sub - 1)[:, None],
        dump_pad,
    ).reshape(-1)
    pad_keys = jnp.concatenate(
        [grid, jnp.full((npads - grid.shape[0],), dump_pad, i32)]
    )
    zpad = jnp.zeros((npads,), rows.dtype)
    ops = (
        [jnp.concatenate([2 * keyv, pad_keys])]
        + [jnp.concatenate([rows[:, c], zpad]) for c in range(C)]
        + [jnp.concatenate([lid, jnp.full((npads,), n, i32)])]
    )
    outs = jax.lax.sort(ops, num_keys=1, is_stable=True)
    return jnp.stack(outs[1:1 + C], axis=1), outs[1 + C], tile_regions, outs[0]


def _unbucket_sort(buf_rows, buf_lid, n):
    """Inverse of ``_bucket_sort_apply``: rows back in original (ledger) order
    via one stable sort on the carried row ids (pads, id ``n``, sort last)."""
    outs = jax.lax.sort(
        [buf_lid] + [buf_rows[:, c] for c in range(buf_rows.shape[1])],
        num_keys=1, is_stable=True,
    )
    return jnp.stack(outs[1:], axis=1)[:n]


# Bucketing application backend: "sort" (default, see _bucket_sort_apply) or
# "gather" (the _bucket_plan index-plan + row-gather path) for on-hardware A/Bs.
BUCKET_APPLY = os.environ.get("JB_BUCKET_APPLY", "sort")


# Windowed slab scans: each GREP group scans a STATIC-width chunk window
# around its host-computed round-start base instead of the whole slab (see
# _gather_window / the window block in _grid_kernel). Requires the composite
# (region, chunk) bucketing key so group lanes start chunk-adjacent. 0 = off
# (full static scan). Only engages when the slab has >= 2*W chunks.
#
# DEFAULT OFF — measured a LOSS on the v5e 64^3 probe (r4): W=48 -> 8.9e8
# ev/s (19.0k summed iters), W=32 -> 3.4e8 (67.8k iters) vs 1.39e9 (9.4k)
# for the full scan. The diffusive within-ROUND cell walk spans ~+-5 z-cells
# ~ +-22 slab chunks (one z-crossing jumps the flat index by sdx*sdy/128 ~
# 4.5 chunks), so any window much smaller than the slab pays escape-pause
# re-bucket rounds (~15 ms each) faster than the 2.7x scan saving — the same
# conclusion as the ranged-scan rejection above: the per-round reachable set
# IS the region+halo slab under this (x,y,z)-flattened layout. A revisit
# needs a locality-preserving in-slab cell order (Morton) so the reachable
# set maps to a bounded chunk range — noted in BENCH.md "Known headroom".
WINDOW_CHUNKS = int(os.environ.get("JB_WINDOW_CHUNKS", "0"))


def _window_for(K_reg):
    W = WINDOW_CHUNKS
    return W if (W > 0 and K_reg >= 2 * W) else 0


# Remaining-work (tau) bucketing subkey: within each region, particles are
# sub-sorted by tau so same-tile lanes carry SIMILAR remaining work. A tile
# iterates to the MAX lane iteration count while early finishers idle —
# census particles start at tau = birth/dt ~ U[0,1) (sourcing draws birth
# times uniformly over the step) and pausers resume at arbitrary tau, so an
# unsorted tile's max remaining work is ~2x its mean and the whole tile pays
# the difference as idle lane-iterations. Power of 2; 0/1 disables. Mutually
# exclusive with the chunk-composite subkey (windowed/ranged scans need
# chunk-adjacency; tau ordering would break their group bases).
TAU_SUBKEY = int(os.environ.get("JB_TAU_SUBKEY", "16"))


def _subkeys_for(K_reg):
    """Composite-key multiplier (power of 2) covering a slab's chunk ids, or 1
    when the kernel will use the static full scan. MUST stay in lockstep with
    the kernel-side ranged-gather/window gates: their win comes from the
    bucketing sort laying same-group lanes chunk-adjacent."""
    if RANGED_GATHER and K_reg >= RANGED_MIN_CHUNKS:
        return 1 << (K_reg - 1).bit_length()
    if _window_for(K_reg):
        return 1 << (K_reg - 1).bit_length()
    return 1


def _grid_layout(mesh, use_ddmc=False):
    """Static region-grid layout for a uniform mesh.

    Regions are CORE boxes (the bucketing key) surrounded by a HALO: the slab
    stores core+halo coefficients and a particle pauses only on leaving the
    halo box. Re-bucketing therefore hands every particle >= HALO cells of
    margin in every split axis — far beyond the per-step rms walk of a
    diffusive particle — so the straggler tail dies in a couple of rounds.
    (Phase-shifted region grids were tried instead and measured insufficient:
    a corner-walker can sit near faces of several phases at once.)

    Returns (rn, ng, halo, K_reg, Kf_reg): core dims in cells (rx,ry,rz),
    region-grid dims (NGX,NGY,NGZ), per-axis halo, and slab chunk counts."""
    return _grid_layout_dims(
        _grid_dims(mesh), np.asarray(mesh.block_dx, np.float64)[0], use_ddmc
    )


def _grid_layout_dims(dims, dxc, use_ddmc=False):
    """Region layout over an explicit (NX, NY, NZ) cell box (the spatial
    decomposition partitions each shard's LOCAL z-slab independently)."""
    NX, NY, NZ = dims
    target = max(REGION_CELLS_DDMC if use_ddmc else REGION_CELLS_IMC, LANES)
    ng = np.ones(3, np.int64)
    N = np.array([NX, NY, NZ], np.int64)
    rn = N.copy()

    def slab_dims(rn, ng):
        h = np.where(ng > 1, np.minimum(HALO, rn), 0)
        return rn + 2 * h, h

    sd, h = slab_dims(rn, ng)
    while int(sd.prod()) > target:
        cand = [a for a in range(3) if rn[a] > 1]
        if not cand:
            break
        a = max(cand, key=lambda a: rn[a] * dxc[a])  # keep regions compact
        ng[a] *= 2
        rn[a] = -(-N[a] // ng[a])
        sd, h = slab_dims(rn, ng)
    K_reg = -(-int(sd.prod()) // LANES)
    Kf = (
        -(-int((sd[0] + 1) * sd[1] * sd[2]) // LANES),
        -(-int(sd[0] * (sd[1] + 1) * sd[2]) // LANES),
        -(-int(sd[0] * sd[1] * (sd[2] + 1)) // LANES),
    )
    return (
        (int(rn[0]), int(rn[1]), int(rn[2])),
        (int(ng[0]), int(ng[1]), int(ng[2])),
        (int(h[0]), int(h[1]), int(h[2])),
        K_reg,
        Kf,
    )


def supports(mesh, prm) -> bool:
    """Any SINGLE-LEVEL mesh whose region slab fits the chunk-scan budget —
    the global cell count is unbounded (regions are sliced from HBM). Every
    in-kernel table (coefficient pair + DDMC per-cell face pairs) is
    cell-indexed, so K_reg is the only scan bound."""
    if mesh.max_level > 0:
        return False
    _, _, _, K_reg, _ = _grid_layout(mesh, prm.use_ddmc)
    return K_reg <= MAX_REGION_CHUNKS


def _to_global(mesh, blocks_arr):
    """[B, nz, ny, nx] block-structured cell array -> [NZ, NY, NX] global grid
    (block order resolved through the lookup grid)."""
    ntz, nty, ntx = mesh.tile_shape
    nz, ny, nx = mesh.nz, mesh.ny, mesh.nx
    a = blocks_arr[mesh.lookup.reshape(-1)]
    a = a.reshape(ntz, nty, ntx, nz, ny, nx).transpose(0, 3, 1, 4, 2, 5)
    return a.reshape(ntz * nz, nty * ny, ntx * nx)


def _faces_to_global(mesh, farr, axis):
    """Block-structured face array -> global face array (shared faces overlap
    consistently on a uniform mesh). axis: 0=x ([...,nx+1]), 1=y, 2=z."""
    ntz, nty, ntx = mesh.tile_shape
    nz, ny, nx = mesh.nz, mesh.ny, mesh.nx
    if axis == 0:
        base = _to_global(mesh, farr[:, :, :, :nx])
        lastb = mesh.lookup[:, :, ntx - 1].reshape(-1)
        last = farr[lastb, :, :, nx].reshape(ntz, nty, nz, ny)
        last = last.transpose(0, 2, 1, 3).reshape(ntz * nz, nty * ny, 1)
        return jnp.concatenate([base, last], axis=2)
    if axis == 1:
        base = _to_global(mesh, farr[:, :, :ny, :])
        lastb = mesh.lookup[:, nty - 1, :].reshape(-1)
        last = farr[lastb, :, ny, :].reshape(ntz, ntx, nz, nx)
        last = last.transpose(0, 2, 1, 3).reshape(ntz * nz, 1, ntx * nx)
        return jnp.concatenate([base, last], axis=1)
    base = _to_global(mesh, farr[:, :nz, :, :])
    lastb = mesh.lookup[ntz - 1, :, :].reshape(-1)
    last = farr[lastb, nz, :, :].reshape(nty, ntx, ny, nx)
    last = last.transpose(0, 2, 1, 3).reshape(1, nty * ny, ntx * nx)
    return jnp.concatenate([base, last], axis=0)


# Packed-row layout shared by the grid and bucketed census buffers: the first
# _N_FCOLS columns are f32 bitcast into i32 lanes (x y z vx vy vz tau), every
# later column is raw i32 (cells/flags). _pack_rows/_unpack_rows are the ONLY
# encoders of that convention — add a column in one place, not three.
_N_FCOLS = 7


def _pack_rows(cols, n_fcols=None):
    """Columns (f32 bitcast, others astype i32; any shape, flattened) ->
    one (n, C) i32 row matrix. Trace-time-asserts the layout convention
    (exactly the first ``n_fcols`` — default ``_N_FCOLS`` — columns are f32)
    so a mis-typed column fails loudly instead of round-tripping through
    _unpack_rows as bit garbage."""
    i32 = jnp.int32
    nf = _N_FCOLS if n_fcols is None else n_fcols
    for c_i, c in enumerate(cols):
        want_f32 = c_i < nf
        assert (c.dtype == jnp.float32) == want_f32, (
            f"_pack_rows column {c_i} has dtype {c.dtype}; the packed-row "
            f"layout requires {'f32' if want_f32 else 'integer'} here"
        )
    packed = []
    for c in cols:
        flat = c.reshape(-1)
        if flat.dtype == jnp.float32:
            packed.append(jax.lax.bitcast_convert_type(flat, i32))
        else:
            packed.append(flat.astype(i32))
    return jnp.stack(packed, axis=1)


def _unpack_rows(rows, n_cols, shape=None, n_fcols=None):
    """(n, C) i32 row matrix -> list of C columns (first ``n_fcols`` — default
    ``_N_FCOLS`` — bitcast back to f32), each reshaped to ``shape`` when
    given."""
    nf = _N_FCOLS if n_fcols is None else n_fcols
    cols = []
    for c in range(n_cols):
        v = rows[:, c]
        if c < nf:
            v = jax.lax.bitcast_convert_type(v, jnp.float32)
        cols.append(v.reshape(shape) if shape is not None else v)
    return cols


def _permute_pack(cols, idx, n_extra_zero_rows=1):
    """Move many same-length 1D arrays through one permutation with a single
    ROW gather: bitcast/widen every column to i32, stack to an (n, C) matrix,
    append zero rows (out-of-range sentinel indices read them), and gather rows
    by ``idx``. One 4C-byte contiguous row per index instead of C separate
    4-byte strided gathers — measured 4.4x faster on v5e (114 -> 26 ms for
    C=13, n~0.7M). Returns the (len(idx), C) i32 matrix."""
    i32 = jnp.int32
    packed = []
    for c in cols:
        if c.dtype == jnp.float32:
            packed.append(jax.lax.bitcast_convert_type(c, i32))
        else:
            packed.append(c.astype(i32))
    mat = jnp.stack(packed, axis=1)
    if n_extra_zero_rows:
        mat = jnp.concatenate(
            [mat, jnp.zeros((n_extra_zero_rows, mat.shape[1]), i32)]
        )
    return mat[idx]


def _permute_unpack(rows, col, dtype):
    """Column ``col`` of a ``_permute_pack`` result, bitcast back to dtype."""
    v = rows[:, col]
    if dtype == jnp.float32:
        return jax.lax.bitcast_convert_type(v, dtype)
    return v.astype(dtype)


def _pack_cols(cols, idx, n_extra_zero_rows=1):
    """Dtype-preserving variant of ``_permute_pack``: 64-bit columns (f64/i64,
    possible under ``jaybenne/precision = f64``) are bitcast to TWO i32 lanes
    instead of truncated by ``astype(int32)``. Returns ``(rows, offsets)``
    where input column ``c`` starts at lane ``offsets[c]`` of the row matrix;
    unpack with ``_unpack_col(rows, offsets[c], cols[c].dtype)``."""
    i32 = jnp.int32
    packed = []
    offsets = []
    for c in cols:
        offsets.append(len(packed))
        if np.dtype(c.dtype).itemsize == 8:
            two = jax.lax.bitcast_convert_type(c, i32)  # [n, 2]
            packed.append(two[:, 0])
            packed.append(two[:, 1])
        elif c.dtype == jnp.float32:
            packed.append(jax.lax.bitcast_convert_type(c, i32))
        else:
            packed.append(c.astype(i32))
    mat = jnp.stack(packed, axis=1)
    if n_extra_zero_rows:
        mat = jnp.concatenate(
            [mat, jnp.zeros((n_extra_zero_rows, mat.shape[1]), i32)]
        )
    return mat[idx], tuple(offsets)


def _unpack_col(rows, off, dtype):
    """Inverse of ``_pack_cols`` for the column starting at lane ``off``."""
    if np.dtype(dtype).itemsize == 8:
        return jax.lax.bitcast_convert_type(rows[:, off : off + 2], dtype)
    v = rows[:, off]
    if dtype == jnp.float32:
        return jax.lax.bitcast_convert_type(v, dtype)
    return v.astype(dtype)


def _slab_tables(
    glob, rshape, rn, ng, halo, K, dtype, periodic=(False, False, False),
    wrap=None,
):
    """Slice a global [GZ, GY, GX] array into per-region slabs in chunked-lane
    layout: [(R_pad+1) * K * GREP, LANES]. Regions form the regular grid
    ``ng`` of ``rn``-cell cores with per-axis ``halo``; the slab per-axis
    index sets are SEPARABLE, so the extraction is three axis-aligned takes
    with trace-time-constant indices (contiguous-slice gathers at HBM
    bandwidth) instead of one flat arbitrary-index gather (~26 ns/element on
    v5e — 13 ms/table at 64^3, measured). Out-of-domain halo entries WRAP on
    periodic axes (the kernel runs unwrapped coordinates there) and are 0 on
    physical axes. ``wrap`` overrides the wrap period per (x, y, z) axis — face
    arrays wrap modulo the CELL count (face N is face 0), not the array size."""
    GZ, GY, GX = glob.shape
    wx, wy, wz = wrap if wrap is not None else (GX, GY, GZ)
    rz, ry, rx = rshape
    (rnx, rny, rnz), (NGX, NGY, NGZ), (hx, hy, hz) = rn, ng, halo

    def axis_idx(NG, rnd, h, rdim, G, w, per):
        base = (
            np.arange(NG)[:, None] * rnd - h + np.arange(rdim)[None, :]
        ).reshape(-1)
        oob = (base < 0) | (base >= G)
        if per:
            idx = np.where(oob, np.mod(base, w), base)
            ok = np.ones_like(base, bool)
        else:
            idx = np.clip(base, 0, G - 1)
            ok = ~oob
        return jnp.asarray(idx, jnp.int32), jnp.asarray(ok)

    ix, okx = axis_idx(NGX, rnx, hx, rx, GX, wx, periodic[0])
    iy, oky = axis_idx(NGY, rny, hy, ry, GY, wy, periodic[1])
    iz, okz = axis_idx(NGZ, rnz, hz, rz, GZ, wz, periodic[2])
    a = jnp.take(glob, iz, axis=0)
    a = jnp.take(a, iy, axis=1)
    a = jnp.take(a, ix, axis=2)
    mask = okz[:, None, None] & oky[None, :, None] & okx[None, None, :]
    vals = jnp.where(mask, a, 0).astype(dtype)
    vals = vals.reshape(NGZ, rz, NGY, ry, NGX, rx).transpose(0, 2, 4, 1, 3, 5)
    slabs = vals.reshape(NGZ * NGY * NGX, rz * ry * rx)
    tabs = jax.vmap(lambda s: _chunk_table(s, dtype, K))(slabs)
    zero = jnp.zeros((1, K * GREP, LANES), dtype)
    return jnp.concatenate([tabs, zero], axis=0).reshape(-1, LANES)


def _slab_tables_gather(
    glob, rshape, origins, K, dtype, periodic=(False, False, False), wrap=None
):
    """Flat-gather reference implementation of ``_slab_tables`` (kept as the
    correctness oracle for tests: the separable build must match it bitwise
    for regular-grid origins)."""
    GZ, GY, GX = glob.shape
    wx, wy, wz = wrap if wrap is not None else (GX, GY, GZ)
    rz, ry, rx = rshape
    oz = origins[:, 2][:, None, None, None]
    oy = origins[:, 1][:, None, None, None]
    ox = origins[:, 0][:, None, None, None]
    dz = jnp.arange(rz)[None, :, None, None]
    dy = jnp.arange(ry)[None, None, :, None]
    dx = jnp.arange(rx)[None, None, None, :]
    gz_, gy_, gx_ = oz + dz, oy + dy, ox + dx
    ok = jnp.full(jnp.broadcast_shapes(gz_.shape, gy_.shape, gx_.shape), True)
    if periodic[2]:
        gz_ = jnp.where((gz_ < 0) | (gz_ >= GZ), jnp.mod(gz_, wz), gz_)
    else:
        ok = ok & (gz_ >= 0) & (gz_ < GZ)
    if periodic[1]:
        gy_ = jnp.where((gy_ < 0) | (gy_ >= GY), jnp.mod(gy_, wy), gy_)
    else:
        ok = ok & (gy_ >= 0) & (gy_ < GY)
    if periodic[0]:
        gx_ = jnp.where((gx_ < 0) | (gx_ >= GX), jnp.mod(gx_, wx), gx_)
    else:
        ok = ok & (gx_ >= 0) & (gx_ < GX)
    flat = (
        jnp.clip(gz_, 0, GZ - 1) * GY + jnp.clip(gy_, 0, GY - 1)
    ) * GX + jnp.clip(gx_, 0, GX - 1)
    vals = jnp.where(ok, glob.reshape(-1)[flat], 0).astype(dtype)
    R_pad = origins.shape[0]
    slabs = vals.reshape(R_pad, rz * ry * rx)
    tabs = jax.vmap(lambda s: _chunk_table(s, dtype, K))(slabs)
    zero = jnp.zeros((1, K * GREP, LANES), dtype)
    return jnp.concatenate([tabs, zero], axis=0).reshape(-1, LANES)


def _grid_kernel(
    regions_ref,  # scalar prefetch: i32[grid] region id per tile
    scal_ref,     # SMEM f32[8]: dt, c
    intr_ref,     # SMEM i32[8]: seed (slots 1-7 reserved)
    x_ref, y_ref, z_ref, vx_ref, vy_ref, vz_ref, tau_ref,
    en_ref,                       # particle photon energy — read-only model
    #   input for the non-gray path (per-event opacity evaluation); gray
    #   configs pass one constant-index dummy block
    gi_ref, gj_ref, gk_ref, alive_ref, absorbed_ref, face_ref,
    pk_ref,                       # region slab (blocked by index_map). Gray:
    #   the derived collision-rate PAIR ea = fleck*sigma_a (effective
    #   absorption) and es = sigma_s + (1-fleck)*sigma_a (effective
    #   scattering), bf16-packed into one i32 word per cell (_pack_bf16_pair).
    #   Every in-kernel coefficient use derives from the pair
    #   (sigma_t = ea + es), so the per-refresh chunk-scan cost is ONE table.
    #   Non-gray: rho (f32) — the kernel evaluates the opacity/scattering
    #   models per refresh at the particle's photon energy, like the
    #   reference (transport.cpp:122-127).
    t2_ref, f3_ref,               # non-gray only: temperature / Fleck slabs
    fpx_ref, fpy_ref, fpz_ref,    # region face-prob slabs, PER-CELL pairs:
    #   word c of axis a holds (P_lower_face, P_upper_face) of cell c bf16-
    #   packed — one scan with the same `cell` index serves both faces, and
    #   the tables are cell-sized (K_reg chunks), not face-sized.
    ox_ref, oy_ref, oz_ref, ovx_ref, ovy_ref, ovz_ref, otau_ref, oen_ref,
    ogi_ref, ogj_ref, ogk_ref, oalive_ref, oabsorbed_ref, oface_ref,
    ev_ref, it_ref,
    *,
    prm_static,
    opacity=None,
    scattering=None,
):
    (ndim, NX, NY, NZ, rnx, rny, rnz, hx, hy, hz, NGX, NGY, cell_dx,
     max_iters, bcs, bounds, has_absorption, interpret, use_ddmc, tau_ddmc,
     eps_imc, eps_ddmc, K_reg, Kf_reg, wrap_axes, z_split, KZ,
     nongray, W_win) = prm_static
    sdx, sdy, sdz = rnx + 2 * hx, rny + 2 * hy, rnz + 2 * hz  # slab dims
    multi_d = ndim >= 2
    three_d = ndim == 3
    dt = scal_ref[0]
    c = scal_ref[1]
    x1min, x1max, x2min, x2max, x3min, x3max = bounds
    dxc = jnp.float32(cell_dx[0])
    dyc = jnp.float32(cell_dx[1])
    dzc = jnp.float32(cell_dx[2])
    dmin = jnp.float32(min(cell_dx[:ndim]))

    shape = (BSUB, LANES)
    BIG = jnp.float32(3.0e38)
    tiny = jnp.float32(1.0e-37)
    # spatial (z-slab sharded) mode: the region grid lives in SHARD-LOCAL z
    # (z0 = shard * KZ, traced); particles keep GLOBAL gk for face/BC math
    z0 = intr_ref[1]
    # W_win > 0: windowed slab scans — the prefetch array is [grid, 1 + G]
    # (region, then the per-GREP-group window base chunks); else [grid]
    if W_win:
        tr = regions_ref[pl.program_id(0), 0]
        grp_base = [
            regions_ref[pl.program_id(0), 1 + s] for s in range(BSUB // GREP)
        ]
    else:
        tr = regions_ref[pl.program_id(0)]
        grp_base = None
    rcx = tr % NGX
    rcy = (tr // NGX) % NGY
    rcz = tr // (NGX * NGY)
    box = rcx * rnx - hx  # slab cell-box origin (may be negative at edges)
    boy = rcy * rny - hy
    boz = rcz * rnz - hz  # LOCAL z (== global when unsharded: z0 = 0)

    # paired 16-bit / full 23-bit uniform variates (see ops/pallas_rng.py)
    raw_bits = rng.make_raw_bits(
        shape, intr_ref[0], pl.program_id(0) * BTILE, interpret
    )

    def in_region(gi, gj, gk):
        # residency is the HALO box: bucketed by core, paused on leaving core+halo
        gkl = gk - z0
        li, lj, lk = gi - box, gj - boy, gkl - boz
        ok = (
            (li >= 0) & (li < sdx) & (lj >= 0) & (lj < sdy)
            & (lk >= 0) & (lk < sdz)
        )
        if z_split:
            # the z halo never crosses a shard boundary (remote coefficients
            # are not resident); leaving the shard's z range pauses -> migrate
            ok = ok & (gkl >= 0) & (gkl < KZ)
        return ok

    # sigma-refresh cadence: 1 disables the machinery (constant-folds away)
    scan_chunks = K_reg + (sum(Kf_reg) if use_ddmc else 0)
    R_ref = SIGMA_REFRESH if scan_chunks > SIGMA_SCAN_MIN_CHUNKS else 1
    # carried coefficients between refreshes: gray carries the packed (ea,es)
    # word, non-gray carries the two f32 rates evaluated at refresh; DDMC
    # adds 3 face-pair words
    n_head = 2 if nongray else 1
    n_coef = n_head + (3 if use_ddmc else 0)

    inv_c = jnp.float32(1.0) / c
    inv_cdt = jnp.float32(1.0) / (c * dt)
    inv_dt = jnp.float32(1.0) / dt
    # static cell sizes: divisions become multiplies by the host reciprocal
    rdxc = jnp.float32(1.0 / cell_dx[0])
    rdyc = jnp.float32(1.0 / cell_dx[1])
    rdzc = jnp.float32(1.0 / cell_dx[2])

    def body(carry):
        (x, y, z, vx, vy, vz, tau, gi, gj, gk, alive, absorbed, face) = \
            carry[:13]
        coef_c = carry[13:13 + n_coef]
        stale, paused, it, ev = carry[-4], carry[-3], carry[-2], carry[-1]
        if FLOOR_ITERS:
            act = (alive != 0) & (tau < 1.0) & (paused == 0)
            ntau = jnp.where(
                act,
                jnp.minimum(tau + jnp.float32(1.0 / FLOOR_ITERS), 1.0),
                tau,
            )
            return (
                x, y, z, vx, vy, vz, ntau, gi, gj, gk, alive, absorbed, face,
            ) + tuple(coef_c) + (
                stale, paused, it + 1, ev + act.astype(jnp.int32),
            )
        pool = rng.DrawPool(raw_bits)

        li, lj, lk = gi - box, gj - boy, (gk - z0) - boz
        cell = (lk * sdy + lj) * sdx + li

        # windowed slab scans (W_win > 0): each GREP group scans only the
        # static-width chunk window [base, base + W_win) around its
        # host-computed round-start base — the bucketing sort lays group
        # lanes chunk-adjacent (composite key), and in the diffusive regime a
        # lane drifts only a few z-cells per STEP, so escapes are rare. A
        # live lane outside its window PAUSES at its refresh (before any
        # gather result is consumed; between refreshes it is stale/idle
        # anyway) and rides the next bucketing round, which re-sorts escapees
        # into fresh groups with bases that cover them — so every round makes
        # progress and the existing tail machinery absorbs the traffic.
        if W_win:
            ch_all = cell >> 7  # LANES = 128 = 1 << 7
            in_win_g = []
            for s in range(BSUB // GREP):
                chs = ch_all[s * GREP : (s + 1) * GREP, :]
                in_win_g.append(
                    (chs >= grp_base[s]) & (chs < grp_base[s] + W_win)
                )
            in_win = jnp.concatenate(in_win_g, axis=0)
            live_w = (alive != 0) & (tau < 1.0) & (paused == 0)
            esc = live_w & ~in_win
            if R_ref == 1:
                paused = jnp.maximum(paused, esc.astype(jnp.int32))
            else:
                # scalar & vector-i1 AND (Mosaic cannot select between i1
                # vectors at this tile shape — same workaround as `npaused`)
                refresh_w = (it % jnp.int32(R_ref)) == 0
                paused = jnp.maximum(paused, (esc & refresh_w).astype(jnp.int32))

        # ranged scans: lanes that can still transport this round (paused and
        # finished lanes may fall outside the scanned range and read zeros —
        # they never consume coefficients before the round returns)
        ranged = RANGED_GATHER and K_reg >= RANGED_MIN_CHUNKS
        if ranged:
            live = (alive != 0) & (tau < 1.0) & (paused == 0)

        def gather_coefs(_):
            # every value the loop needs is gathered with the same per-cell
            # index. Gray: the bf16-packed (ea, es) PAIR word — 1 scan.
            # Non-gray: (rho, T, fleck) — 3 scans — then the models evaluate
            # at the particle's photon energy and the derived (ea, es) rates
            # ride the carry until the next refresh (a particle's energy and
            # cell are both constant between refreshes, so the rates are
            # exactly as fresh as the gray path's). DDMC adds 3 per-axis
            # (P_lower, P_upper) face-pair words.
            if W_win:
                gat = lambda ref, K: _gather_window(
                    ref, cell, grp_base, W_win, K
                )
            elif ranged:
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
            # gray non-DDMC pair word is (p_abs, 1/sig_t) — see transport_grid
            inv_sigt = _bf16_lo(coefs[0])
            p_abs = _bf16_hi(coefs[0]) if has_absorption else None
        active = (alive != 0) & (tau < 1.0) & (paused == 0) & (stale == 0)

        fi = gi.astype(jnp.float32)
        fj = gj.astype(jnp.float32)
        fk = gk.astype(jnp.float32)
        xl, xu = x1min + fi * dxc, x1min + (fi + 1.0) * dxc
        yl, yu = x2min + fj * dyc, x2min + (fj + 1.0) * dyc
        zl, zu = x3min + fk * dzc, x3min + (fk + 1.0) * dzc

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
        ngi = gi + jnp.where(cr_x, jnp.where(vx > 0, 1, -1), 0)
        ngj = gj + jnp.where(cr_y, jnp.where(vy > 0, 1, -1), 0)
        ngk = gk + jnp.where(cr_z, jnp.where(vz > 0, 1, -1), 0)

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
            for ax, (fdx_, fv) in enumerate(((dxc, vx), (dyc, vy), (dzc, vz))):
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
                    rj_x = jnp.where(m, jnp.where(lower, xl - eps_i * dxc, xu + eps_i * dxc), rj_x)
                    rj_si = jnp.where(m, -1 if lower else 1, rj_si)
                elif axis == 1:
                    rj_vy = jnp.where(m, v1, rj_vy)
                    rj_vz = jnp.where(m, v2, rj_vz)
                    rj_vx = jnp.where(m, v3, rj_vx)
                    rj_y = jnp.where(m, jnp.where(lower, yl - eps_i * dyc, yu + eps_i * dyc), rj_y)
                    rj_sj = jnp.where(m, -1 if lower else 1, rj_sj)
                else:
                    rj_vz = jnp.where(m, v1, rj_vz)
                    rj_vx = jnp.where(m, v2, rj_vx)
                    rj_vy = jnp.where(m, v3, rj_vy)
                    rj_z = jnp.where(m, jnp.where(lower, zl - eps_i * dzc, zu + eps_i * dzc), rj_z)
                    rj_sk = jnp.where(m, -1 if lower else 1, rj_sk)

            fp_xl, fp_xu = _bf16_hi(coefs[n_head]), _bf16_lo(coefs[n_head])
            fp_yl, fp_yu = _bf16_hi(coefs[n_head + 1]), _bf16_lo(coefs[n_head + 1])
            fp_zl, fp_zu = _bf16_hi(coefs[n_head + 2]), _bf16_lo(coefs[n_head + 2])

            lk_ = (fp_xl * rdxc, fp_xu * rdxc, fp_yl * rdyc, fp_yu * rdyc,
                   fp_zl * rdzc, fp_zu * rdzc)
            leak_tot = lk_[0] + lk_[1] + lk_[2] + lk_[3] + lk_[4] + lk_[5]
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
            for l in lk_:
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
            cx_, cy_, cz_ = xl + 0.5 * dxc, yl + 0.5 * dyc, zl + 0.5 * dzc
            eps_d = jnp.float32(eps_ddmc)
            for m, axis, lower in (
                (leak_sel[0], 0, True), (leak_sel[1], 0, False),
                (leak_sel[2], 1, True), (leak_sel[3], 1, False),
                (leak_sel[4], 2, True), (leak_sel[5], 2, False),
            ):
                out_sgn = jnp.float32(-1.0 if lower else 1.0)
                v1, v2, v3 = c * out_sgn * b1, c * b2, c * b3
                if axis == 0:
                    dd_x = jnp.where(m, jnp.where(lower, xl - eps_d * dxc, xu + eps_d * dxc), dd_x)
                    dd_y = jnp.where(m, cy_, dd_y)
                    dd_z = jnp.where(m, cz_, dd_z)
                    dd_vx = jnp.where(m, v1, dd_vx)
                    dd_vy = jnp.where(m, v2, dd_vy)
                    dd_vz = jnp.where(m, v3, dd_vz)
                    dd_si = jnp.where(m, -1 if lower else 1, dd_si)
                elif axis == 1:
                    dd_y = jnp.where(m, jnp.where(lower, yl - eps_d * dyc, yu + eps_d * dyc), dd_y)
                    dd_z = jnp.where(m, cz_, dd_z)
                    dd_x = jnp.where(m, cx_, dd_x)
                    dd_vy = jnp.where(m, v1, dd_vy)
                    dd_vz = jnp.where(m, v2, dd_vz)
                    dd_vx = jnp.where(m, v3, dd_vx)
                    dd_sj = jnp.where(m, -1 if lower else 1, dd_sj)
                else:
                    dd_z = jnp.where(m, jnp.where(lower, zl - eps_d * dzc, zu + eps_d * dzc), dd_z)
                    dd_x = jnp.where(m, cx_, dd_x)
                    dd_y = jnp.where(m, cy_, dd_y)
                    dd_vz = jnp.where(m, v1, dd_vz)
                    dd_vx = jnp.where(m, v2, dd_vx)
                    dd_vy = jnp.where(m, v3, dd_vy)
                    dd_sk = jnp.where(m, -1 if lower else 1, dd_sk)

            dd_census = do_step & ~is_event
            dd_x = jnp.where(dd_census, xl + pool.u16(it) * dxc, dd_x)
            dd_y = jnp.where(dd_census, yl + pool.u16(it) * dyc, dd_y)
            dd_z = jnp.where(dd_census, zl + pool.u16(it) * dzc, dd_z)
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

            nx_ = jnp.where(is_ddmc, dd_x, nx_)
            ny_ = jnp.where(is_ddmc, dd_y, ny_)
            nz_ = jnp.where(is_ddmc, dd_z, nz_)
            nvx = jnp.where(is_ddmc, dd_vx, nvx)
            nvy = jnp.where(is_ddmc, dd_vy, nvy)
            nvz = jnp.where(is_ddmc, dd_vz, nvz)
            ntau = jnp.where(is_ddmc, dd_tau, ntau)
            ngi = jnp.where(is_ddmc, gi + dd_si, ngi)
            ngj = jnp.where(is_ddmc, gj + dd_sj, ngj)
            ngk = jnp.where(is_ddmc, gk + dd_sk, ngk)
            nalive = jnp.where(dd_absorbed, 0, nalive)
            nabsorbed = jnp.where(dd_absorbed, 1, nabsorbed)
            nface = jnp.where(is_ddmc, 0, nface)

        # ---- domain BCs: exact integer tests, no float face tolerance.
        # Periodic axes are a NO-OP here: the kernel runs UNWRAPPED coordinates
        # (the slab halo wraps, so the periodic seam is interior to the slab) and
        # the host re-wraps cells/positions after the round. A wrapped index
        # would jump the particle out of any halo and turn the periodic face
        # into an unshiftable pause line (measured: ~0.92/round straggler tail).
        def apply_bc(g, v, ci, N, lo, hi, bc_lo, bc_hi, al, fc, wrap):
            L = jnp.float32(hi - lo)
            lo = jnp.float32(lo)
            hi = jnp.float32(hi)
            hit_lo = ci < 0
            hit_hi = ci >= N
            if wrap:
                # unsplit periodic axis: the slab spans the whole axis, so wrap
                # in-kernel (a seam-crosser would otherwise leave the halo box
                # and pause EVERY round — measured ~0.93/round straggler
                # survival on a single-region periodic mesh). Crossings move
                # one cell per event, so out-of-range is exactly -1 / N.
                g = jnp.where(hit_lo, g + L, jnp.where(hit_hi, g - L, g))
                ci = jnp.where(hit_lo, ci + N, jnp.where(hit_hi, ci - N, ci))
                return g, v, ci, al, fc
            if bc_lo == BC.reflecting:
                g = jnp.where(hit_lo, jnp.clip(2.0 * lo - g, lo, hi), g)
                v = jnp.where(hit_lo, -v, v)
                if fc is not None:  # None when DDMC is off (face unread)
                    fc = jnp.where(hit_lo, -fc, fc)
                ci = jnp.where(hit_lo, 0, ci)
            elif bc_lo != BC.periodic:  # outflow: dead; clamp for safe gathers
                al = jnp.where(hit_lo, 0, al)
                ci = jnp.where(hit_lo, 0, ci)
            if bc_hi == BC.reflecting:
                g = jnp.where(hit_hi, jnp.clip(2.0 * hi - g, lo, hi), g)
                v = jnp.where(hit_hi, -v, v)
                if fc is not None:
                    fc = jnp.where(hit_hi, -fc, fc)
                ci = jnp.where(hit_hi, N - 1, ci)
            elif bc_hi != BC.periodic:
                al = jnp.where(hit_hi, 0, al)
                ci = jnp.where(hit_hi, N - 1, ci)
            return g, v, ci, al, fc

        fc_bc = nface if use_ddmc else None
        nx_, nvx, ngi, nalive, fc_bc = apply_bc(
            nx_, nvx, ngi, NX, x1min, x1max, bcs[0], bcs[1], nalive, fc_bc,
            wrap_axes[0],
        )
        if multi_d:
            ny_, nvy, ngj, nalive, fc_bc = apply_bc(
                ny_, nvy, ngj, NY, x2min, x2max, bcs[2], bcs[3], nalive, fc_bc,
                wrap_axes[1],
            )
        else:
            ngj = jnp.clip(ngj, 0, NY - 1)
        if three_d:
            nz_, nvz, ngk, nalive, fc_bc = apply_bc(
                nz_, nvz, ngk, NZ, x3min, x3max, bcs[4], bcs[5], nalive, fc_bc,
                wrap_axes[2],
            )
        else:
            ngk = jnp.clip(ngk, 0, NZ - 1)
        if use_ddmc:
            nface = fc_bc

        # pause when the particle's cell leaves the tile's region box (the
        # reference's off-block break, transport.cpp:151); int32 mask (Mosaic
        # can't select between i1 vectors at this tile shape)
        npaused = jnp.maximum(
            paused,
            ((nalive != 0) & ~in_region(ngi, ngj, ngk)).astype(jnp.int32),
        )

        # a cell change invalidates the carried coefficients until the next
        # refresh iteration (the stalled lane is masked out of `active`)
        if R_ref != 1:
            changed = (ngi != gi) | (ngj != gj) | (ngk != gk)
            nstale = jnp.where(active & changed, jnp.int32(1), stale)
        else:
            nstale = stale

        # Inactive lanes already pass every field through unchanged (the d=0
        # zeroing above degenerates all updates to the identity, every event/
        # BC/pause mask includes ``active``) — no per-field final select.
        # ``face`` is the exception: its IMC chain rebuilds from 0.
        if use_ddmc:
            nface = jnp.where(active, nface, face)
        return (
            nx_, ny_, nz_, nvx, nvy, nvz, ntau,
            ngi, ngj, ngk, nalive, nabsorbed, nface,
        ) + tuple(coefs) + (
            nstale,
            npaused,
            it + 1,
            # per-lane active-iteration counter: one elementwise add per
            # iteration; the cross-lane event total reduces ONCE after the loop
            ev + active.astype(jnp.int32),
        )

    def cond(carry):
        tau, alive = carry[6], carry[10]
        paused, it = carry[-3], carry[-2]
        return (it < max_iters) & jnp.any(
            (alive != 0) & (tau < 1.0) & (paused == 0)
        )

    energy = en_ref[:]  # constant through the census loop (non-gray input)
    gi0, gj0, gk0 = gi_ref[:], gj_ref[:], gk_ref[:]
    paused0 = (~in_region(gi0, gj0, gk0)).astype(jnp.int32)
    coef0 = tuple(jnp.zeros(shape) for _ in range(n_head)) if nongray else (
        jnp.zeros(shape, jnp.int32),
    )
    coef0 = coef0 + tuple(
        jnp.zeros(shape, jnp.int32) for _ in range(n_coef - n_head)
    )
    init = (
        x_ref[:], y_ref[:], z_ref[:],
        vx_ref[:], vy_ref[:], vz_ref[:], tau_ref[:],
        gi0, gj0, gk0,
        alive_ref[:], absorbed_ref[:], face_ref[:],
    ) + coef0 + (
        jnp.zeros(shape, jnp.int32),  # stale (it=0 always refreshes)
        paused0,
        jnp.int32(0), jnp.zeros(shape, jnp.int32),
    )
    out = census_while(cond, body, init)
    (x, y, z, vx, vy, vz, tau, gi, gj, gk, alive, absorbed, face) = out[:13]
    it, ev = out[-2], jnp.sum(out[-1])
    ox_ref[:], oy_ref[:], oz_ref[:] = x, y, z
    ovx_ref[:], ovy_ref[:], ovz_ref[:] = vx, vy, vz
    otau_ref[:] = tau
    oen_ref[:] = energy  # unchanged pass-through (rides the row layout)
    ogi_ref[:], ogj_ref[:], ogk_ref[:] = gi, gj, gk
    oalive_ref[:], oabsorbed_ref[:], oface_ref[:] = alive, absorbed, face

    @pl.when(pl.program_id(0) == 0)
    def _init_stats():
        ev_ref[0, 0] = 0
        it_ref[0, 0] = 0

    ev_ref[0, 0] = ev_ref[0, 0] + ev
    it_ref[0, 0] = jnp.maximum(it_ref[0, 0], it)


def transport_grid(particles, coefs, mesh, key, prm, dt, interpret=False):
    """Census transport on a uniform mesh via phase-shifted region bucketing.
    Returns (particles, iters, events)."""
    p = particles
    cap = p.capacity
    f32, i32 = jnp.float32, jnp.int32
    NX, NY, NZ = _grid_dims(mesh)
    rn, ng, halo, K_reg, Kf_reg = _grid_layout(mesh, prm.use_ddmc)
    rnx, rny, rnz = rn
    hx, hy, hz = halo
    sdx, sdy, sdz = rnx + 2 * hx, rny + 2 * hy, rnz + 2 * hz
    NGX, NGY, NGZ = ng
    R_pad = NGX * NGY * NGZ

    def glob_cells(vec):
        return _to_global(mesh, vec.reshape(mesh.n_blocks, mesh.nz, mesh.ny, mesh.nx))

    per = (
        prm.swarm_bc[0] == BC.periodic,
        prm.swarm_bc[2] == BC.periodic,
        prm.swarm_bc[4] == BC.periodic,
    )
    rsh = (sdz, sdy, sdx)
    lay = dict(rn=rn, ng=ng, halo=halo)
    nongray = coefs.opacity is not None
    # diagnostic knobs (JB_SKIP_KERNEL companions): zero the slab tables /
    # skip the final ledger-order restore, to isolate those pieces' cost on
    # the PRODUCTION step path. Results are physically wrong — timing only.
    _skip_slabs = bool(os.environ.get("JB_SKIP_SLABS"))
    _skip_restore = bool(os.environ.get("JB_SKIP_RESTORE"))
    if _skip_slabs:
        zt_i = jnp.zeros(((R_pad + 1) * K_reg * GREP, LANES), jnp.int32)
        zt_f = jax.lax.bitcast_convert_type(zt_i, jnp.float32)
    if nongray:
        # frequency-dependent models: ship (rho, T, fleck) slabs; the kernel
        # evaluates the models per refresh at the particle's photon energy
        pk_t = _slab_tables(
            glob_cells(coefs.packed[:, 0]), rsh, K=K_reg, dtype=f32,
            periodic=per, **lay)
        t2_t = _slab_tables(
            glob_cells(coefs.packed[:, 1]), rsh, K=K_reg, dtype=f32,
            periodic=per, **lay)
        f3_t = _slab_tables(
            glob_cells(coefs.packed[:, 2]), rsh, K=K_reg, dtype=f32,
            periodic=per, **lay)
    else:
        # gray: ONE bf16-packed derived table covers every in-kernel
        # coefficient use. DDMC needs the rate pair itself (sigma_t = ea + es
        # feeds leak math); the pure-IMC loop consumes only (branch prob,
        # 1/sig_t), so the divide moves here, out of the census iteration.
        ea_g = glob_cells(coefs.fleck * coefs.sigma_a)
        es_g = glob_cells(coefs.sigma_s + (1.0 - coefs.fleck) * coefs.sigma_a)
        if prm.use_ddmc:
            pair_g = _pack_bf16_pair(ea_g, es_g)
        else:
            inv_g = 1.0 / (ea_g + es_g + jnp.float32(1.0e-37))
            pair_g = _pack_bf16_pair(ea_g * inv_g, inv_g)
        pk_t = zt_i if _skip_slabs else _slab_tables(
            pair_g, rsh, K=K_reg, dtype=i32, periodic=per, **lay)
        t2_t = f3_t = jnp.zeros(((R_pad + 1) * GREP, LANES), f32)
    if prm.use_ddmc:
        # DDMC leak probs as PER-CELL (P_lower, P_upper) packed pairs: the
        # kernel reads them with the same cell index as the coefficients —
        # cell-sized tables (K_reg chunks, not face-sized Kf) and one scan per
        # axis instead of two. Upper faces on a periodic axis wrap to face 0
        # (the old face-indexed tables' wrap=(NX,NY,NZ) semantics).
        def cell_pairs(farr, axis, n_ax, wrap_ax):
            lower = jax.lax.slice_in_dim(farr, 0, n_ax, axis=2 - axis)
            upper = (
                jnp.roll(lower, -1, axis=2 - axis) if wrap_ax
                else jax.lax.slice_in_dim(farr, 1, n_ax + 1, axis=2 - axis)
            )
            return _pack_bf16_pair(lower, upper)

        fpx_t = _slab_tables(
            cell_pairs(_faces_to_global(mesh, coefs.px, 0), 0, NX, per[0]),
            rsh, K=K_reg, dtype=i32, periodic=per, **lay)
        fpy_t = _slab_tables(
            cell_pairs(_faces_to_global(mesh, coefs.py, 1), 1, NY, per[1]),
            rsh, K=K_reg, dtype=i32, periodic=per, **lay)
        fpz_t = _slab_tables(
            cell_pairs(_faces_to_global(mesh, coefs.pz, 2), 2, NZ, per[2]),
            rsh, K=K_reg, dtype=i32, periodic=per, **lay)
        Kf_reg = (K_reg, K_reg, K_reg)
    else:
        fpx_t = jnp.zeros(((R_pad + 1) * GREP, LANES), i32)
        fpy_t = fpz_t = fpx_t
        Kf_reg = (1, 1, 1)

    # ledger <-> global cells; static block coords via origins. The block id
    # is pure tile arithmetic (uniform meshes are lexicographic).
    bdx0 = np.asarray(mesh.block_dx, np.float64)[0]
    x1min_, x1max_, x2min_, x2max_, x3min_, x3max_ = mesh.bounds
    ntz, nty, ntx = mesh.tile_shape
    nxb, nyb, nzb = mesh.nx, mesh.ny, mesh.nz
    # Uniform lexicographic mesh: block origin is AFFINE in the tile index
    # (origin = domain_min + t * block_physical_size). Computing it as a
    # vector FMA replaces SIX capacity-sized arbitrary-index origin gathers
    # per step (~38 ms of the 64^3/663k-capacity step — the dominant
    # non-round host fixed cost, BENCH.md round-4 session 4) with ~free
    # elementwise ops. Within <=2 ulp of the stored `mesh.block_origin`
    # (which is f32(gmin + t*size_f64)); the kernel's face/BC math reads only
    # global cells + domain bounds (never block origins), and entry/exit use
    # the SAME formula, so the rebase is exactly self-consistent.
    bsx_c = jnp.float32(float(bdx0[0]) * nxb)
    bsy_c = jnp.float32(float(bdx0[1]) * nyb)
    bsz_c = jnp.float32(float(bdx0[2]) * nzb)
    x1min_f = jnp.float32(x1min_)
    x2min_f = jnp.float32(x2min_)
    x3min_f = jnp.float32(x3min_)

    def org_of(tx, ty, tz):
        return (
            x1min_f + tx.astype(f32) * bsx_c,
            x2min_f + ty.astype(f32) * bsy_c,
            x3min_f + tz.astype(f32) * bsz_c,
        )

    bufcap = cap + (R_pad + 1) * BTILE
    bufcap = -(-bufcap // BTILE) * BTILE
    grid = bufcap // BTILE

    # unsplit periodic axes wrap IN-KERNEL (slab spans the axis; see apply_bc)
    wrap_axes = (
        per[0] and NGX == 1,
        per[1] and NGY == 1,
        per[2] and NGZ == 1,
    )
    # windowed slab scans: sort backend only (bases decode from sorted keys)
    W_win = _window_for(K_reg) if BUCKET_APPLY == "sort" else 0
    G_grp = BSUB // GREP

    def clamp_bases(b):
        # margin below the group minimum (drift is two-sided), clamped so
        # every [base, base+W) window slice stays inside the slab table
        return jnp.clip(b - W_win // 4, 0, max(K_reg - W_win, 0))

    prm_static = (
        prm.ndim, NX, NY, NZ, rnx, rny, rnz, hx, hy, hz, NGX, NGY,
        tuple(float(v) for v in bdx0),
        prm.max_iters, tuple(prm.swarm_bc),
        tuple(float(b) for b in mesh.bounds),
        prm.has_absorption, interpret, prm.use_ddmc, prm.tau_ddmc,
        prm.eps_imc, prm.eps_ddmc, K_reg, Kf_reg, wrap_axes,
        False, NZ,  # z_split, KZ (the spatial factory shards z)
        nongray, W_win,
    )
    kernel = functools.partial(
        _grid_kernel, prm_static=prm_static,
        opacity=coefs.opacity, scattering=coefs.scattering,
    )

    scal = jnp.array([dt, prm.c, 0, 0, 0, 0, 0, 0], dtype=f32)
    try:
        kd = jax.random.key_data(key)
    except (TypeError, AttributeError):
        kd = key
    seed0 = kd.reshape(-1)[-1].astype(i32)

    # Row layout: non-gray carries the (constant) photon energy as an extra
    # f32 column right after tau — the kernel evaluates the models at it per
    # refresh. Gray keeps the 13-column layout (no bandwidth cost) and the
    # kernel's energy ref binds to one constant-index dummy block.
    NFC = 8 if nongray else 7   # leading f32 columns (x y z vx vy vz tau [en])
    NCOL = NFC + 6              # + gi gj gk alive absorbed face
    IGI, IGJ, IGK = NFC, NFC + 1, NFC + 2
    IAL = NFC + 3

    part_spec = pl.BlockSpec(
        (BSUB, LANES), lambda g, rr: (g, 0), memory_space=pltpu.VMEM
    )
    dummy_spec = pl.BlockSpec(
        (BSUB, LANES), lambda g, rr: (0, 0), memory_space=pltpu.VMEM
    )
    en_spec = part_spec if nongray else dummy_spec
    if W_win:
        # prefetch is [grid, 1 + G]: (region, per-group window bases)
        slab = lambda rows: pl.BlockSpec(
            (rows, LANES), lambda g, rr: (jnp.minimum(rr[g, 0], R_pad), 0),
            memory_space=pltpu.VMEM,
        )
    else:
        slab = lambda rows: pl.BlockSpec(
            (rows, LANES), lambda g, rr: (jnp.minimum(rr[g], R_pad), 0),
            memory_space=pltpu.VMEM,
        )
    coef_slab = slab(K_reg * GREP) if nongray else slab(GREP)
    stat_spec = pl.BlockSpec((1, 1), lambda g, rr: (0, 0), memory_space=pltpu.SMEM)

    def mk_call(g):
        buf_rows = g * BTILE // LANES
        en_rows = buf_rows if nongray else BSUB
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ]
            + [part_spec] * 7 + [en_spec] + [part_spec] * 6
            + [slab(K_reg * GREP), coef_slab, coef_slab]
            + [slab(Kf_reg[0] * GREP), slab(Kf_reg[1] * GREP),
               slab(Kf_reg[2] * GREP)],
            out_specs=tuple(
                [part_spec] * 7 + [en_spec] + [part_spec] * 6
                + [stat_spec] * 2
            ),
        )
        shapes = tuple(
            [jax.ShapeDtypeStruct((buf_rows, LANES), f32)] * 7
            + [jax.ShapeDtypeStruct((en_rows, LANES), f32)]
            + [jax.ShapeDtypeStruct((buf_rows, LANES), i32)] * 6
            + [jax.ShapeDtypeStruct((1, 1), i32)] * 2
        )
        return pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=shapes,
            input_output_aliases={i + 3: i for i in range(14)},
            interpret=interpret,
        )

    call = mk_call(grid)
    # tail rounds run over a quarter-size buffer: after round 0 only
    # region-crossers remain unfinished (typically 10-25% of particles), so
    # packing them densely shrinks both the per-round permutation gathers and
    # the kernel grid (sparse tiles each replay their stragglers' full
    # iteration tails — dense tiles don't).
    tail_bufcap = min(bufcap, max(BTILE, (bufcap // TAIL_DIV) // BTILE * BTILE))
    tail_grid = tail_bufcap // BTILE
    tail_call = mk_call(tail_grid) if tail_grid < grid else call

    # ---- census rounds over the bucketed buffer --------------------------
    # Round 0 buckets the whole ledger into the tile-aligned buffer (one row
    # gather) and runs the full kernel grid; the loop carry is that buffer as
    # a packed (bufcap, 13) i32 row matrix. Later rounds gather ONLY the
    # still-unfinished rows into the small tail buffer, run the tail grid,
    # and scatter the rows back in place — finished particles never move
    # again, and the ledger-order restore is a single row gather through
    # round 0's slot map after the loop. Coordinates on periodic axes stay
    # unwrapped inside the buffer (the kernel unwraps across seam slabs);
    # tail re-bucketing wraps cells transiently for region keying and
    # re-wraps the rows it hands to the kernel.

    def region_of(gi, gj, gk):
        return (gk // rnz * NGY + gj // rny) * NGX + gi // rnx

    # composite bucketing key: region * K_SUB + slab-chunk, so same-tile lanes
    # land chunk-sorted and the kernel's ranged scans start tight (K_SUB = 1
    # degrades to the plain region key). On the default (full-scan) path the
    # subkey is the TAU bucket instead: same-tile lanes carry similar
    # remaining work, so the per-tile max iteration count — which every lane
    # pays — tracks the tile mean instead of the region-wide max.
    K_SUB = _subkeys_for(K_reg)
    T_SUB = TAU_SUBKEY if (K_SUB == 1 and TAU_SUBKEY > 1) else 1
    assert T_SUB & (T_SUB - 1) == 0, T_SUB
    N_SUB = K_SUB * T_SUB

    def key_of(unfinished, gi, gj, gk, tau):
        r = region_of(gi, gj, gk)
        if K_SUB > 1:
            li = gi - gi // rnx * rnx + hx
            lj = gj - gj // rny * rny + hy
            lk = gk - gk // rnz * rnz + hz
            sub = ((lk * sdy + lj) * sdx + li) >> 7
            return jnp.where(
                unfinished, r * K_SUB + sub, R_pad * K_SUB
            ).astype(i32)
        if T_SUB > 1:
            sub = jnp.clip((tau * T_SUB).astype(i32), 0, T_SUB - 1)
            return jnp.where(
                unfinished, r * T_SUB + sub, R_pad * T_SUB
            ).astype(i32)
        return jnp.where(unfinished, r, R_pad).astype(i32)

    def bucket(keyv):
        src_of_slot, tile_regions, dest_of_src = _bucket_plan(
            keyv, R_pad, grid, include_dump=True, want_dest_of_src=True,
            n_sub=N_SUB,
        )
        return src_of_slot, dest_of_src, tile_regions

    _skip_kernel = bool(os.environ.get("JB_SKIP_KERNEL"))

    def bucket_tail(keyv):
        """Bucket unfinished buffer slots into the tail buffer: the first
        ``tail_bufcap`` unfinished rows in region-sorted order get slots
        (overflow stays paused in place for the next round). Returns
        (slot_src, pref): the buffer row feeding each tail slot (``bufcap``
        = empty) and the kernel's scalar-prefetch array — per-tile regions,
        plus per-group window bases when the windowed scan is on."""
        if W_win:
            slot_src, tile_regions, _, bases = _bucket_plan(
                keyv, R_pad, tail_grid, include_dump=False,
                want_dest_of_src=False, n_sub=N_SUB, want_bases=True,
            )
            pref = jnp.concatenate(
                [tile_regions[:, None],
                 clamp_bases(bases).reshape(tail_grid, G_grp)],
                axis=1,
            )
            return slot_src, pref
        slot_src, tile_regions, _ = _bucket_plan(
            keyv, R_pad, tail_grid, include_dump=False,
            want_dest_of_src=False, n_sub=N_SUB,
        )
        return slot_src, tile_regions

    def rewrap_cols(cols_):
        """Re-wrap kernel-unwrapped coordinates on periodic axes (NCOL
        columns; positions f32, cells i32)."""
        cols_ = list(cols_)
        if per[0]:
            w = cols_[IGI] // NX
            cols_[IGI] = cols_[IGI] - w * NX
            cols_[0] = cols_[0] - w.astype(f32) * jnp.float32(x1max_ - x1min_)
        if per[1]:
            w = cols_[IGJ] // NY
            cols_[IGJ] = cols_[IGJ] - w * NY
            cols_[1] = cols_[1] - w.astype(f32) * jnp.float32(x2max_ - x2min_)
        if per[2]:
            w = cols_[IGK] // NZ
            cols_[IGK] = cols_[IGK] - w * NZ
            cols_[2] = cols_[2] - w.astype(f32) * jnp.float32(x3max_ - x3min_)
        return cols_

    def rows_to_cols(rows):
        return _unpack_rows(rows, NCOL, n_fcols=NFC)

    def cols_to_rows(cols_):
        return _pack_rows(cols_, n_fcols=NFC)

    zero_en = jnp.zeros((BSUB, LANES), f32)  # gray: constant-index dummy

    def rows_to_bufs(rows, n):
        cols_ = _unpack_rows(rows, NCOL, shape=(n // LANES, LANES), n_fcols=NFC)
        if nongray:
            return cols_
        return cols_[:7] + [zero_en] + cols_[7:]

    def outs_to_rows(outs, n):
        del n
        cols_ = list(outs[:14])
        if not nongray:
            cols_ = cols_[:7] + cols_[8:]  # drop the dummy energy output
        return _pack_rows(cols_, n_fcols=NFC)

    def run_kernel(callee, tile_regions, rounds, bufs, tabs):
        # golden-ratio increment 0x9E3779B9 as a signed int32
        seed = seed0 + rounds * jnp.int32(-1640531527)
        z0 = jnp.int32(0)
        intr = jnp.stack([seed, z0, z0, z0, z0, z0, z0, z0])
        # JB_SKIP_KERNEL (diagnostic, trace-time): pass buffers through
        # unchanged — isolates the host-side bucketing cost of a round
        if _skip_kernel:
            return tuple(bufs) + (
                jnp.zeros((1, 1), i32), jnp.zeros((1, 1), i32)
            )
        return callee(tile_regions, scal, intr, *bufs, *tabs)

    def buf_unfinished(Bm):
        tau = jax.lax.bitcast_convert_type(Bm[:, 6], f32)
        return (Bm[:, IAL] != 0) & (tau < 1.0)

    def full_round(Bm, tabs):
        """Round 0: bucket the whole ledger (rows [:cap] of Bm) into the
        tile-aligned buffer, run the full kernel grid. Returns the buffer
        row matrix and the slot->ledger map (or ledger->slot under the
        gather backend) for the final restore."""
        M = Bm[:cap]
        tau = jax.lax.bitcast_convert_type(M[:, 6], f32)
        unfinished = (M[:, IAL] != 0) & (tau < 1.0)
        keyv = key_of(unfinished, M[:, IGI], M[:, IGJ], M[:, IGK], tau)
        if BUCKET_APPLY == "sort":
            rows_in, restore, tile_regions, buf_keys = _bucket_sort_apply(
                keyv, M, jnp.arange(cap, dtype=i32), R_pad, grid, n_sub=N_SUB
            )
            pref = tile_regions
            if W_win:
                # group base = sub part of the group's FIRST (minimum) sorted
                # key; pure-pad/dump groups (odd or dump keys) get base 0
                k2 = buf_keys.reshape(-1, GREP * LANES)[:, 0]
                real = ((k2 & 1) == 0) & ((k2 >> 1) < R_pad * K_SUB)
                bases = clamp_bases(
                    jnp.where(real, (k2 >> 1) % K_SUB, 0).astype(i32)
                )
                pref = jnp.concatenate(
                    [tile_regions[:, None], bases.reshape(grid, G_grp)],
                    axis=1,
                )
        else:
            src_of_slot, restore, tile_regions = bucket(keyv)
            pref = tile_regions
            rows_in = jnp.concatenate(
                [M, jnp.zeros((1, NCOL), i32)]
            )[src_of_slot]
        outs = run_kernel(
            call, pref, jnp.int32(0), rows_to_bufs(rows_in, bufcap),
            tabs,
        )
        return (
            outs_to_rows(outs, bufcap), restore,
            outs[15][0, 0], outs[14][0, 0],
        )

    def tail_round(Bm, rounds, tabs):
        """Rounds >= 1: gather only still-unfinished rows into the tail
        buffer, run the tail grid, scatter the rows back in place. Buffer
        coordinates stay unwrapped between rounds; region keying wraps
        transiently and the rows handed to the kernel are re-wrapped."""
        unfinished = buf_unfinished(Bm)
        gi, gj, gk = Bm[:, IGI], Bm[:, IGJ], Bm[:, IGK]
        if per[0]:
            gi = gi - gi // NX * NX
        if per[1]:
            gj = gj - gj // NY * NY
        if per[2]:
            gk = gk - gk // NZ * NZ
        keyv = key_of(
            unfinished, gi, gj, gk,
            jax.lax.bitcast_convert_type(Bm[:, 6], f32),
        )
        slot_src, tile_regions = bucket_tail(keyv)
        rows = jnp.concatenate([Bm, jnp.zeros((1, NCOL), i32)])[slot_src]
        if per[0] or per[1] or per[2]:
            rows = cols_to_rows(rewrap_cols(rows_to_cols(rows)))
        outs = run_kernel(
            tail_call, tile_regions, rounds, rows_to_bufs(rows, tail_bufcap),
            tabs,
        )
        rows_out = outs_to_rows(outs, tail_bufcap)
        Bm_new = (
            jnp.concatenate([Bm, jnp.zeros((1, NCOL), i32)])
            .at[slot_src].set(rows_out)
        )[:bufcap]
        return Bm_new, outs[15][0, 0], outs[14][0, 0]

    # ledger -> global-cell cols (once per step; tile ids AND origins are
    # arithmetic — no per-particle gathers at all)
    b = p.block
    tx = b % ntx
    ty = (b // ntx) % nty
    tz = b // (ntx * nty)
    ox_b, oy_b, oz_b = org_of(tx, ty, tz)
    en_col = (p.energy.astype(f32),) if nongray else ()
    cols = (
        p.x + ox_b, p.y + oy_b, p.z + oz_b,
        p.vx, p.vy, p.vz, p.tau.astype(f32),
    ) + en_col + (
        tx * nxb + p.i, ty * nyb + p.j, tz * nzb + p.k,
        p.alive.astype(i32), p.absorbed.astype(i32), p.face,
    )

    M0 = cols_to_rows(cols)
    Bm0 = jnp.concatenate([M0, jnp.zeros((bufcap - cap, NCOL), i32)])

    def loop_body(carry, tabs):
        # tables ride as ARGUMENTS (not closure constants) so the diag path's
        # fresh jax.jit keeps the multi-MB slabs out of the compile payload
        # (the tunneled remote-compile endpoint rejects oversized requests)
        Bm, dest_of_src, rounds, it_acc, ev_acc = carry

        def do_full(Bm_dos):
            Bm, _ = Bm_dos
            return full_round(Bm, tabs)

        def do_tail(Bm_dos):
            Bm, dos = Bm_dos
            Bm, it, ev = tail_round(Bm, rounds, tabs)
            return Bm, dos, it, ev

        Bm, dest_of_src, it, ev = jax.lax.cond(
            rounds == 0, do_full, do_tail, (Bm, dest_of_src)
        )
        return Bm, dest_of_src, rounds + 1, it_acc + it, ev_acc + ev

    def loop_cond(carry):
        Bm, _, rounds, _, _ = carry
        return (rounds < MAX_BUCKET_ROUNDS) & jnp.any(buf_unfinished(Bm))

    if BUCKET_APPLY == "sort":
        # slot -> ledger id (pads: cap); identity before the loop runs
        restore0 = jnp.concatenate(
            [jnp.arange(cap, dtype=i32), jnp.full((bufcap - cap,), cap, i32)]
        )
    else:
        restore0 = jnp.arange(cap, dtype=i32)  # ledger -> slot
    carry0 = (
        Bm0, restore0, jnp.zeros((), i32),
        jnp.zeros((), i32), jnp.zeros((), i32),
    )
    tabs = (pk_t, t2_t, f3_t, fpx_t, fpy_t, fpz_t)
    if os.environ.get("JB_DIAG_ROUNDS"):  # eager per-round diagnostics
        import sys as _sys
        import time as _t

        rb = jax.jit(loop_body)  # tables as args: small compile payload
        carry = carry0
        while int(carry[2]) < MAX_BUCKET_ROUNDS and bool(
            jnp.any(buf_unfinished(carry[0]))
        ):
            u = int(buf_unfinished(carry[0]).sum())
            t0 = _t.perf_counter()
            nxt = rb(carry, tabs)
            jax.block_until_ready(nxt[0])
            cold = _t.perf_counter() - t0
            hot = ""
            if os.environ.get("JB_DIAG_ROUNDS") == "2":
                # re-run the SAME round on the same inputs: hot (post-compile)
                # time, tunnel-synced by fetching a scalar (block_until_ready
                # does not sync on the tunnel)
                t0 = _t.perf_counter()
                again = rb(carry, tabs)
                float(again[0][0, 0])
                hot = f" hot {_t.perf_counter() - t0:.3f}s"
            carry = nxt
            print(
                f"round {int(carry[2])-1}: unfinished {u} "
                f"took {cold:.3f}s{hot}",
                file=_sys.stderr,
            )
    else:
        carry = jax.lax.while_loop(
            loop_cond, lambda c: loop_body(c, tabs), carry0
        )
    Bm, restore, rounds, iters, events = carry

    # buffer -> ledger order (tail rounds scatter in place, so round 0's map
    # stays valid), then a final periodic re-wrap (buffer coordinates stay
    # unwrapped between rounds). Sort backend: one stable sort on the carried
    # slot->ledger ids; gather backend: one row gather through the
    # ledger->slot map. If the loop never ran both are the identity.
    if _skip_restore:  # diagnostic: buffer order, timing only
        cols = rewrap_cols(rows_to_cols(Bm[:cap]))
    elif BUCKET_APPLY == "sort":
        cols = rewrap_cols(rows_to_cols(_unbucket_sort(Bm, restore, cap)))
    else:
        cols = rewrap_cols(rows_to_cols(Bm[restore]))

    # global-cell cols -> ledger (tile ids AND origins arithmetic)
    gi_n, gj_n, gk_n = cols[IGI], cols[IGJ], cols[IGK]
    txn = jnp.clip(gi_n // nxb, 0, ntx - 1)
    tyn = jnp.clip(gj_n // nyb, 0, nty - 1)
    tzn = jnp.clip(gk_n // nzb, 0, ntz - 1)
    tb = (tzn * nty + tyn) * ntx + txn
    ox_n, oy_n, oz_n = org_of(txn, tyn, tzn)
    back = {
        "block": tb,
        "i": gi_n - txn * nxb,
        "j": gj_n - tyn * nyb,
        "k": gk_n - tzn * nzb,
        "x": cols[0] - ox_n,
        "y": cols[1] - oy_n,
        "z": cols[2] - oz_n,
        "vx": cols[3], "vy": cols[4], "vz": cols[5], "tau": cols[6],
        "alive": cols[IAL].astype(jnp.bool_),
        "absorbed": cols[IAL + 1].astype(jnp.bool_),
        "face": cols[IAL + 2],
    }
    p = dataclasses.replace(
        p, **{k: v.astype(getattr(p, k).dtype) for k, v in back.items()}
    )
    return p, iters, events



# --------------------------------------------------------------------- spatial
# Kernel-backed census rounds for the spatial decomposition on UNIFORM meshes.
# Shards own contiguous block ranges; on a uniform mesh (lexicographic block
# order) a whole number of z tile-planes per shard makes ownership a global
# z-slab of cells, so the grid kernel's halo-slab design carries over: regions
# partition each shard's LOCAL [NX, NY, KZ] box, slabs halo-wrap in x/y
# (periodic seams interior, the straggler-tail fix) and CLIP at shard z
# boundaries (remote coefficients are not resident — leaving the shard's z
# range pauses the particle, which the caller's migration round then ships).
# DDMC face tables are not built here (spatial + DDMC + uniform uses the
# bucketed-kernel or XLA path); the bench regime this exists for is the huge
# uniform IMC mesh.


def supports_spatial(mesh, prm, n_shards) -> bool:
    if mesh.max_level > 0 or prm.use_ddmc:
        return False
    ntz, nty, ntx = mesh.tile_shape
    B = mesh.n_blocks
    if B % n_shards or (B // n_shards) % (ntx * nty):
        return False  # shard ownership must be whole z tile-planes
    if not np.array_equal(
        np.asarray(mesh.lookup).reshape(-1), np.arange(B, dtype=np.int64)
    ):
        return False  # uniform meshes are lexicographic by construction
    NX, NY, _ = _grid_dims(mesh)
    KZ = (B // n_shards) // (ntx * nty) * mesh.nz
    dxc = np.asarray(mesh.block_dx, np.float64)[0]
    _, _, _, K_reg, Kf = _grid_layout_dims((NX, NY, KZ), dxc, False)
    return K_reg <= MAX_REGION_CHUNKS


def make_spatial_grid(mesh, prm, n_shards, cap, interpret=False,
                      nongray=False, opacity=None, scattering=None):
    """(build_tables, round_fn) with the same contract as
    ``pallas_bucketed.make_spatial_transport``: per-step slab tables from the
    shard's LOCAL coefficients, one kernel bucket-round per migration round."""
    f32, i32 = jnp.float32, jnp.int32
    NX, NY, NZ = _grid_dims(mesh)
    ntz, nty, ntx = mesh.tile_shape
    nxb, nyb, nzb = mesh.nx, mesh.ny, mesh.nz
    B = mesh.n_blocks
    Bl = B // n_shards
    P = Bl // (ntx * nty)  # z tile-planes per shard
    KZ = P * nzb
    z_split = n_shards > 1
    bdx0 = np.asarray(mesh.block_dx, np.float64)[0]
    rn, ng, halo, K_reg, Kf_reg = _grid_layout_dims(
        (NX, NY, KZ), bdx0, False
    )
    rnx, rny, rnz = rn
    NGX, NGY, NGZ = ng
    hx, hy, hz = halo
    sdx, sdy, sdz = rnx + 2 * hx, rny + 2 * hy, rnz + 2 * hz
    R_pad = NGX * NGY * NGZ
    K_SUB = _subkeys_for(K_reg)
    T_SUB = TAU_SUBKEY if (K_SUB == 1 and TAU_SUBKEY > 1) else 1
    N_SUB = K_SUB * T_SUB

    per_bc = (
        prm.swarm_bc[0] == BC.periodic,
        prm.swarm_bc[2] == BC.periodic,
        prm.swarm_bc[4] == BC.periodic,
    )
    # slab-table wrap flags: z never wraps across shards
    per_tab = (per_bc[0], per_bc[1], per_bc[2] and not z_split)
    wrap_axes = (
        per_bc[0] and NGX == 1,
        per_bc[1] and NGY == 1,
        per_bc[2] and not z_split and NGZ == 1,
    )
    x1min, x1max, x2min, x2max, x3min, x3max = mesh.bounds
    # arithmetic block origins — same rationale and formula as transport_grid
    # (block ids are GLOBAL in the sharded ledger, so the global tile index
    # feeds the same affine map; z0 shard offsets only ever touch CELLS)
    bsx_c = jnp.float32(float(bdx0[0]) * nxb)
    bsy_c = jnp.float32(float(bdx0[1]) * nyb)
    bsz_c = jnp.float32(float(bdx0[2]) * nzb)
    x1min_f = jnp.float32(x1min)
    x2min_f = jnp.float32(x2min)
    x3min_f = jnp.float32(x3min)

    def org_of(tx, ty, tz):
        return (
            x1min_f + tx.astype(f32) * bsx_c,
            x2min_f + ty.astype(f32) * bsy_c,
            x3min_f + tz.astype(f32) * bsz_c,
        )

    bufcap = cap + (R_pad + 1) * BTILE
    bufcap = -(-bufcap // BTILE) * BTILE
    grid = bufcap // BTILE

    prm_static = (
        prm.ndim, NX, NY, NZ, rnx, rny, rnz, hx, hy, hz, NGX, NGY,
        tuple(float(v) for v in bdx0),
        prm.max_iters, tuple(prm.swarm_bc),
        tuple(float(b) for b in mesh.bounds),
        prm.has_absorption, interpret, False, prm.tau_ddmc,
        prm.eps_imc, prm.eps_ddmc, K_reg, (1, 1, 1), wrap_axes,
        z_split, KZ,
        nongray, 0,  # windowed scans: particle-path transport_grid only
    )
    kernel = functools.partial(
        _grid_kernel, prm_static=prm_static,
        opacity=opacity, scattering=scattering,
    )

    part_spec = pl.BlockSpec(
        (BSUB, LANES), lambda g, rr: (g, 0), memory_space=pltpu.VMEM
    )
    dummy_spec = pl.BlockSpec(
        (BSUB, LANES), lambda g, rr: (0, 0), memory_space=pltpu.VMEM
    )
    slab = lambda rows: pl.BlockSpec(
        (rows, LANES), lambda g, rr: (jnp.minimum(rr[g], R_pad), 0),
        memory_space=pltpu.VMEM,
    )
    stat_spec = pl.BlockSpec((1, 1), lambda g, rr: (0, 0), memory_space=pltpu.SMEM)
    en_spec = part_spec if nongray else dummy_spec
    en_rows = bufcap // LANES if nongray else BSUB
    coef_slab = slab(K_reg * GREP) if nongray else slab(GREP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        + [part_spec] * 7 + [en_spec] + [part_spec] * 6
        + [slab(K_reg * GREP), coef_slab, coef_slab]
        + [slab(GREP)] * 3,
        out_specs=tuple(
            [part_spec] * 7 + [en_spec] + [part_spec] * 6
            + [stat_spec] * 2
        ),
    )
    out_shapes = tuple(
        [jax.ShapeDtypeStruct((bufcap // LANES, LANES), f32)] * 7
        + [jax.ShapeDtypeStruct((en_rows, LANES), f32)]
        + [jax.ShapeDtypeStruct((bufcap // LANES, LANES), i32)] * 6
        + [jax.ShapeDtypeStruct((1, 1), i32)] * 2
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={i + 3: i for i in range(14)},
        interpret=interpret,
    )

    def _local_glob(vec):
        """[Bl * ncpb] shard-local cell vector -> [KZ, NY, NX] local z-slab
        (pure reshape — uniform-mesh block order is lexicographic)."""
        a = vec.reshape(P, nty, ntx, nzb, nyb, nxb)
        return a.transpose(0, 3, 1, 4, 2, 5).reshape(KZ, NY, NX)

    rsh = (sdz, sdy, sdx)

    def build_tables(coefs, shard):
        zero_f = jnp.zeros(((R_pad + 1) * GREP, LANES), f32)
        zero = jnp.zeros(((R_pad + 1) * GREP, LANES), i32)
        if nongray:
            # frequency-dependent models: (rho, T, fleck) slabs from the
            # shard's LOCAL packed matter state; the kernel evaluates the
            # models per refresh at the particle's photon energy
            mk = lambda col: _slab_tables(
                _local_glob(coefs.packed[:, col]), rsh, rn, ng, halo, K_reg,
                f32, per_tab,
            )
            pk_t, t2_t, f3_t = mk(0), mk(1), mk(2)
        else:
            ea_loc = _local_glob(coefs.fleck * coefs.sigma_a)
            es_loc = _local_glob(
                coefs.sigma_s + (1.0 - coefs.fleck) * coefs.sigma_a
            )
            # this kernel instance is always pure-IMC (prm_static passes
            # use_ddmc=False), so the pair word is (p_abs, 1/sig_t) — see
            # transport_grid
            inv_loc = 1.0 / (ea_loc + es_loc + jnp.float32(1.0e-37))
            pk_t = _slab_tables(
                _pack_bf16_pair(ea_loc * inv_loc, inv_loc), rsh, rn, ng, halo,
                K_reg, i32, per_tab,
            )
            t2_t = f3_t = zero_f
        z0 = (shard * KZ).astype(i32) if hasattr(shard, "astype") else jnp.int32(
            shard * KZ
        )
        return (pk_t, t2_t, f3_t, zero, zero, zero, z0)

    def round_fn(p, tables, key, rounds, dt):
        pk_t, t2_t, f3_t, fpx_t, fpy_t, fpz_t, z0 = tables
        del rounds  # halo slabs make parity alternation unnecessary
        # ledger -> global cells: integer tile arithmetic (exact), arithmetic
        # origins for the float rebase (match transport_grid's convention)
        b = p.block
        tx = b % ntx
        ty = (b // ntx) % nty
        tz = b // (ntx * nty)
        gi = tx * nxb + p.i
        gj = ty * nyb + p.j
        gk = tz * nzb + p.k
        ox_b, oy_b, oz_b = org_of(tx, ty, tz)
        gx = p.x + ox_b
        gy = p.y + oy_b
        gz = p.z + oz_b
        gkl = gk - z0
        owned = (gkl >= 0) & (gkl < KZ)
        unfinished = p.alive & (p.tau < 1.0) & owned
        region = (gkl // rnz * NGY + gj // rny) * NGX + gi // rnx
        if K_SUB > 1:
            # composite key: chunk-sort within regions for the ranged scans.
            # clip: un-owned rows hold arbitrary gkl but land in the dump
            gku = jnp.clip(gkl, 0, KZ - 1)
            li = gi - gi // rnx * rnx + hx
            lj = gj - gj // rny * rny + hy
            lk = gku - gku // rnz * rnz + hz
            sub = ((lk * sdy + lj) * sdx + li) >> 7
            keyv = jnp.where(
                unfinished, region * K_SUB + sub, R_pad * K_SUB
            ).astype(i32)
        elif T_SUB > 1:
            # tau subkey: same-tile lanes carry similar remaining work (see
            # transport_grid's key_of)
            sub = jnp.clip(
                (p.tau.astype(f32) * T_SUB).astype(i32), 0, T_SUB - 1
            )
            keyv = jnp.where(
                unfinished, region * T_SUB + sub, R_pad * T_SUB
            ).astype(i32)
        else:
            keyv = jnp.where(unfinished, region, R_pad).astype(i32)

        en_col = (p.energy.astype(f32),) if nongray else ()
        nfc = 7 + len(en_col)
        cols = (gx, gy, gz, p.vx, p.vy, p.vz, p.tau.astype(f32)) + en_col + (
                gi, gj, gk, p.alive.astype(i32), p.absorbed.astype(i32), p.face)
        if BUCKET_APPLY == "sort":
            rows_in, buf_lid, tile_regions, _ = _bucket_sort_apply(
                keyv, _pack_rows(cols, n_fcols=nfc), jnp.arange(cap, dtype=i32),
                R_pad, grid, n_sub=N_SUB,
            )
        else:
            src_of_slot, tile_regions, dest_of_src = _bucket_plan(
                keyv, R_pad, grid, include_dump=True, want_dest_of_src=True,
                n_sub=N_SUB,
            )
            rows_in = _permute_pack(cols, src_of_slot)
        bufs = _unpack_rows(
            rows_in, len(cols), shape=(bufcap // LANES, LANES), n_fcols=nfc
        )
        try:
            kd = jax.random.key_data(key)
        except (TypeError, AttributeError):
            kd = key
        seed = kd.reshape(-1)[-1].astype(i32)
        zero_i = jnp.zeros((), i32)
        intr = jnp.stack([seed, z0, zero_i, zero_i, zero_i, zero_i, zero_i, zero_i])
        scal = jnp.stack(
            [jnp.asarray(dt, f32), jnp.asarray(prm.c, f32)]
            + [jnp.zeros((), f32)] * 6
        )
        if nongray:
            kin = bufs
        else:
            zero_en = jnp.zeros((BSUB, LANES), f32)  # constant-index dummy
            kin = bufs[:7] + [zero_en] + bufs[7:]
        outs = call(tile_regions, scal, intr, *kin,
                    pk_t, t2_t, f3_t, fpx_t, fpy_t, fpz_t)
        parts = list(outs[:14])
        ev, it = outs[14], outs[15]
        if not nongray:
            parts = parts[:7] + parts[8:]  # drop the dummy energy output

        buf_cols = [a.reshape(bufcap) for a in parts]
        if BUCKET_APPLY == "sort":
            rows_out = _unbucket_sort(
                _pack_rows(buf_cols, n_fcols=nfc), buf_lid, cap
            )
        else:
            rows_out = _permute_pack(
                buf_cols, dest_of_src, n_extra_zero_rows=0
            )

        def from_buf(c, dtype):
            return _permute_unpack(rows_out, c, dtype)

        gi_n = from_buf(nfc, i32)
        gj_n = from_buf(nfc + 1, i32)
        gk_n = from_buf(nfc + 2, i32)
        gx_n = from_buf(0, f32)
        gy_n = from_buf(1, f32)
        gz_n = from_buf(2, f32)
        # re-wrap the kernel's unwrapped coordinates on periodic axes. The z
        # re-wrap must stay UNCONDITIONAL even when z is shard-split: a
        # particle crossing the global z seam pauses with gk outside [0, NZ)
        # (wrap_axes z is false in-kernel), and this re-wrap is what maps it
        # back in range so migrate() ships it to the owning shard — guarding
        # it with "not z_split" would clip tb to the top tile row and re-home
        # the particle into the wrong block.
        if per_bc[0]:
            w = gi_n // NX
            gi_n = gi_n - w * NX
            gx_n = gx_n - w.astype(f32) * jnp.float32(x1max - x1min)
        if per_bc[1]:
            w = gj_n // NY
            gj_n = gj_n - w * NY
            gy_n = gy_n - w.astype(f32) * jnp.float32(x2max - x2min)
        if per_bc[2]:
            w = gk_n // NZ
            gk_n = gk_n - w * NZ
            gz_n = gz_n - w.astype(f32) * jnp.float32(x3max - x3min)
        # global -> ledger: integer tile arithmetic (no lookup gather)
        txn = jnp.clip(gi_n // nxb, 0, ntx - 1)
        tyn = jnp.clip(gj_n // nyb, 0, nty - 1)
        tzn = jnp.clip(gk_n // nzb, 0, ntz - 1)
        tb = (tzn * nty + tyn) * ntx + txn
        ox_n, oy_n, oz_n = org_of(txn, tyn, tzn)
        upd = {
            "block": tb,
            "i": gi_n - txn * nxb,
            "j": gj_n - tyn * nyb,
            "k": gk_n - tzn * nzb,
            "x": gx_n - ox_n,
            "y": gy_n - oy_n,
            "z": gz_n - oz_n,
            "vx": from_buf(3, f32), "vy": from_buf(4, f32),
            "vz": from_buf(5, f32), "tau": from_buf(6, f32),
            "alive": from_buf(nfc + 3, jnp.bool_),
            "absorbed": from_buf(nfc + 4, jnp.bool_),
            "face": from_buf(nfc + 5, i32),
        }
        p = dataclasses.replace(
            p, **{k: v.astype(getattr(p, k).dtype) for k, v in upd.items()}
        )
        return p, it[0, 0], ev[0, 0]

    return build_tables, round_fn
