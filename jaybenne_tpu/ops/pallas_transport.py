"""Pallas TPU mega-kernel for the IMC census transport loop.

The XLA event loop (``ops/transport.py``) pays per-iteration HBM traffic for every
particle array and temporary, threefry RNG cost, and dispatch overhead — ~40 ns/event
measured on v5e. This kernel runs the ENTIRE census loop on-chip:

  * the particle tile (pos/vel/tau/cell ids/flags) lives in VMEM for the whole loop;
  * per-cell coefficients, block geometry, and the block-lookup grid are VMEM tables
    read with ``tpu.dynamic_gather`` in LANE mode (``take_along_axis(..., axis=1)``;
    Mosaic on v5e supports per-lane gathers within a 128-lane row, so tables are
    replicated across rows and limited to 128 entries — sublane-mode gather crashes
    the backend compiler on this target);
  * random numbers come from the hardware PRNG (``pltpu.prng_random_bits``), seeded
    per (tile, step) — the analog of the reference's per-thread ``XorShift64`` pool;
  * each grid tile (SUBLANES*128 particles) iterates to ITS OWN census completion,
    confining divergence costs to a tile;
  * single-block meshes (the production bench shape) skip all block-geometry
    gathers: cell size/origin become scalars and transitions reduce to domain BCs.

Physics is the same algorithm as the XLA path (the branch structure of
``ptcl_transport_step``, reference ``transport_utils.hpp:111-160``, plus the inline
block-transition/BC logic); only the RNG stream differs, which Monte Carlo
tolerances absorb.

Scope (phase 1): pure-IMC steps (``use_ddmc=False``) on meshes with
``total_cells <= 128``; larger meshes and the DDMC branch fall back to the XLA path
(chunked lane-gather is the planned extension).

Measured on v5e (stepdiff, 128 cells, 100k particles): see BENCH notes / bench.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BC

SUBLANES = 256
LANES = 128
TILE = SUBLANES * LANES  # particles per grid tile
MAX_TABLE = LANES        # lane-gather tables hold at most 128 entries


def supports(mesh, prm) -> bool:
    """Whether this kernel covers the configuration."""
    n_tiles = mesh.tile_shape[0] * mesh.tile_shape[1] * mesh.tile_shape[2]
    return (
        not prm.use_ddmc
        and mesh.total_cells <= MAX_TABLE
        and mesh.n_blocks <= MAX_TABLE
        and n_tiles <= MAX_TABLE
    )


def _lane_table(vec, dtype):
    """[N] -> [SUBLANES, LANES] table: padded to 128 lanes, replicated across rows."""
    n = vec.shape[0]
    row = jnp.concatenate([vec.astype(dtype), jnp.zeros((LANES - n,), dtype)])
    return jnp.broadcast_to(row[None, :], (SUBLANES, LANES))


def _gather(tab, idx):
    """Per-lane gather: out[i,j] = tab[i, idx[i,j]]."""
    return jnp.take_along_axis(tab, jnp.clip(idx, 0, LANES - 1), axis=1)


def _transport_kernel(
    scal_ref,   # SMEM f32[8]: dt, c
    seed_ref,   # SMEM i32[1]
    x_ref, y_ref, z_ref, vx_ref, vy_ref, vz_ref, tau_ref,
    blk_ref, ci_ref, cj_ref, ck_ref, alive_ref, absorbed_ref,
    sa_ref, ss_ref, ff_ref,
    bdx_ref, bdy_ref, bdz_ref,
    box_ref, boy_ref, boz_ref,
    lut_ref,
    ox_ref, oy_ref, oz_ref, ovx_ref, ovy_ref, ovz_ref, otau_ref,
    oblk_ref, oci_ref, ocj_ref, ock_ref, oalive_ref, oabsorbed_ref,
    ev_ref, it_ref,
    *,
    prm_static,
):
    (ndim, nx, ny, nz, max_iters, bcs, bounds, tile_shape, finest,
     single_block, block_dx0, block_org0) = prm_static
    multi_d = ndim >= 2
    three_d = ndim == 3
    dt = scal_ref[0]
    c = scal_ref[1]
    x1min, x1max, x2min, x2max, x3min, x3max = bounds
    ntz, nty, ntx = tile_shape
    tsx = (x1max - x1min) / ntx
    tsy = (x2max - x2min) / nty
    tsz = (x3max - x3min) / ntz

    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    shape = (SUBLANES, LANES)
    BIG = jnp.float32(3.0e38)
    tiny = jnp.float32(1.0e-37)

    def uniform():
        bits = pltpu.prng_random_bits(shape)
        return ((bits >> 9) & 0x7FFFFF).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 23)
        )

    def expdraw():
        return -jnp.log(jnp.maximum(uniform(), tiny))

    def body(carry):
        (x, y, z, vx, vy, vz, tau, blk, ci, cj, ck, alive, absorbed, it, ev) = carry
        active = (alive != 0) & (tau < 1.0)

        if single_block:
            dxb = jnp.float32(block_dx0[0])
            dyb = jnp.float32(block_dx0[1])
            dzb = jnp.float32(block_dx0[2])
            dmin = jnp.float32(min(block_dx0))
            cell = (ck * ny + cj) * nx + ci
        else:
            dxb = _gather(bdx_ref[:], blk)
            dyb = _gather(bdy_ref[:], blk)
            dzb = _gather(bdz_ref[:], blk)
            dmin = jnp.minimum(dxb, jnp.minimum(dyb, dzb))
            cell = (blk * (nz * ny * nx)) + (ck * ny + cj) * nx + ci
        sa = _gather(sa_ref[:], cell)
        ss = _gather(ss_ref[:], cell)
        ff = _gather(ff_ref[:], cell)

        fi = ci.astype(jnp.float32)
        fj = cj.astype(jnp.float32)
        fk = ck.astype(jnp.float32)
        xl, xu = fi * dxb, (fi + 1.0) * dxb
        yl, yu = fj * dyb, (fj + 1.0) * dyb
        zl, zu = fk * dzb, (fk + 1.0) * dzb

        d_abs = expdraw() / (ff * sa + tiny)
        d_sc = expdraw() / (ss + (1.0 - ff) * sa + tiny)
        d_end = c * dt * (1.0 - tau)
        d_geom = jnp.minimum(dmin, d_end)

        def face_dist(v, lo, hi, q):
            vsafe_p = jnp.where(v > 0, v, 1.0)
            vsafe_n = jnp.where(v < 0, v, -1.0)
            return jnp.where(
                v > 0, c * (hi - q) / vsafe_p,
                jnp.where(v < 0, c * (lo - q) / vsafe_n, BIG),
            )

        fxd = face_dist(vx, xl, xu, x)
        fyd = face_dist(vy, yl, yu, y) if multi_d else jnp.full(shape, BIG)
        fzd = face_dist(vz, zl, zu, z) if three_d else jnp.full(shape, BIG)

        d_push = jnp.minimum(jnp.minimum(d_geom, fxd), jnp.minimum(fyd, fzd))
        i_abs = active & (d_abs < d_push) & (d_abs < d_sc)
        i_sc = active & ~i_abs & (d_sc < d_push)
        no_coll = active & ~i_abs & ~i_sc
        cr_x = no_coll & (fxd <= fyd) & (fxd <= fzd) & (fxd <= d_geom)
        cr_y = no_coll & ~cr_x & (fyd <= fzd) & (fyd <= d_geom)
        cr_z = no_coll & ~cr_x & ~cr_y & (fzd <= d_geom)
        i_census = no_coll & ~cr_x & ~cr_y & ~cr_z & (d_end <= dmin)

        d = jnp.where(i_abs, d_abs, jnp.where(i_sc, d_sc, d_push))
        ntau = jnp.where(i_census, 1.0, tau + d / (c * dt))
        nx_ = x + vx * (d / c)
        ny_ = y + vy * (d / c) if multi_d else y
        nz_ = z + vz * (d / c) if three_d else z
        nx_ = jnp.where(cr_x, jnp.where(vx > 0, xu, xl), nx_)
        ny_ = jnp.where(cr_y, jnp.where(vy > 0, yu, yl), ny_)
        nz_ = jnp.where(cr_z, jnp.where(vz > 0, zu, zl), nz_)
        nci = ci + jnp.where(cr_x, jnp.where(vx > 0, 1, -1), 0)
        ncj = cj + jnp.where(cr_y, jnp.where(vy > 0, 1, -1), 0)
        nck = ck + jnp.where(cr_z, jnp.where(vz > 0, 1, -1), 0)

        # isotropic scatter redraw (scattering.hpp:21-29)
        mu = 1.0 - 2.0 * uniform()
        phi = jnp.float32(2.0 * 3.14159265358979) * uniform()
        st = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        nvx = jnp.where(i_sc, c * st * jnp.cos(phi), vx)
        nvy = jnp.where(i_sc, c * st * jnp.sin(phi), vy)
        nvz = jnp.where(i_sc, c * mu, vz)

        nalive = jnp.where(i_abs, 0, alive)
        nabsorbed = jnp.where(i_abs, 1, absorbed)

        # ---- block transition / domain BCs ------------------------------
        out_lo_x, out_hi_x = nci < 0, nci >= nx
        out_lo_y, out_hi_y = ncj < 0, ncj >= ny
        out_lo_z, out_hi_z = nck < 0, nck >= nz

        if single_block:
            gx = jnp.float32(block_org0[0]) + nx_
            gy = jnp.float32(block_org0[1]) + ny_
            gz = jnp.float32(block_org0[2]) + nz_
        else:
            gx = _gather(box_ref[:], blk) + nx_
            gy = _gather(boy_ref[:], blk) + ny_
            gz = _gather(boz_ref[:], blk) + nz_

        def apply_bc(g, v, lo, hi, o_lo, o_hi, bc_lo, bc_hi, al):
            L = hi - lo
            hit_lo = o_lo & (g <= lo)
            hit_hi = o_hi & (g >= hi)
            if bc_lo == BC.reflecting:
                g = jnp.where(hit_lo, 2.0 * lo - g, g)
                v = jnp.where(hit_lo, -v, v)
            elif bc_lo == BC.periodic:
                g = jnp.where(hit_lo, g + L, g)
            else:
                al = jnp.where(hit_lo, 0, al)
            if bc_hi == BC.reflecting:
                g = jnp.where(hit_hi, 2.0 * hi - g, g)
                v = jnp.where(hit_hi, -v, v)
            elif bc_hi == BC.periodic:
                g = jnp.where(hit_hi, g - L, g)
            else:
                al = jnp.where(hit_hi, 0, al)
            return g, v, al

        gx, nvx, nalive = apply_bc(
            gx, nvx, x1min, x1max, out_lo_x, out_hi_x, bcs[0], bcs[1], nalive
        )
        if multi_d:
            gy, nvy, nalive = apply_bc(
                gy, nvy, x2min, x2max, out_lo_y, out_hi_y, bcs[2], bcs[3], nalive
            )
        if three_d:
            gz, nvz, nalive = apply_bc(
                gz, nvz, x3min, x3max, out_lo_z, out_hi_z, bcs[4], bcs[5], nalive
            )

        out = (out_lo_x | out_hi_x | out_lo_y | out_hi_y | out_lo_z | out_hi_z) & (
            nalive != 0
        )
        if single_block:
            # transitions are BC-only: rebase the (possibly reflected/wrapped)
            # global position into the single block
            lx = gx - jnp.float32(block_org0[0])
            ly = gy - jnp.float32(block_org0[1])
            lz = gz - jnp.float32(block_org0[2])
            ri = jnp.clip((lx / dxb).astype(jnp.int32), 0, nx - 1)
            rj = jnp.clip((ly / dyb).astype(jnp.int32), 0, ny - 1)
            rk = jnp.clip((lz / dzb).astype(jnp.int32), 0, nz - 1)
            nblk = blk
        else:
            # velocity-nudged probe resolves boundary-exact positions by direction
            px = gx + jnp.float32(0.01 * finest[0]) * (nvx / c)
            py = gy + jnp.float32(0.01 * finest[1]) * (nvy / c) if multi_d else gy
            pz = gz + jnp.float32(0.01 * finest[2]) * (nvz / c) if three_d else gz
            tx = jnp.clip(jnp.floor((px - x1min) / tsx).astype(jnp.int32), 0, ntx - 1)
            ty = jnp.clip(jnp.floor((py - x2min) / tsy).astype(jnp.int32), 0, nty - 1)
            tz = jnp.clip(jnp.floor((pz - x3min) / tsz).astype(jnp.int32), 0, ntz - 1)
            b_new = _gather(lut_ref[:], (tz * nty + ty) * ntx + tx)
            ndxb = _gather(bdx_ref[:], b_new)
            ndyb = _gather(bdy_ref[:], b_new)
            ndzb = _gather(bdz_ref[:], b_new)
            lx = gx - _gather(box_ref[:], b_new)
            ly = gy - _gather(boy_ref[:], b_new)
            lz = gz - _gather(boz_ref[:], b_new)
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

        def sel(new, old):
            return jnp.where(active, new, old)

        return (
            sel(nx_, x), sel(ny_, y), sel(nz_, z),
            sel(nvx, vx), sel(nvy, vy), sel(nvz, vz),
            sel(ntau, tau),
            jnp.where(active, nblk, blk),
            jnp.where(active, nci, ci),
            jnp.where(active, ncj, cj),
            jnp.where(active, nck, ck),
            jnp.where(active, nalive, alive),
            jnp.where(active, nabsorbed, absorbed),
            it + 1,
            ev + jnp.sum(active.astype(jnp.int32)),
        )

    def cond(carry):
        tau, alive, it = carry[6], carry[11], carry[13]
        return (it < max_iters) & jnp.any((alive != 0) & (tau < 1.0))

    init = (
        x_ref[:], y_ref[:], z_ref[:],
        vx_ref[:], vy_ref[:], vz_ref[:], tau_ref[:],
        blk_ref[:], ci_ref[:], cj_ref[:], ck_ref[:],
        alive_ref[:], absorbed_ref[:],
        jnp.int32(0), jnp.int32(0),
    )
    (x, y, z, vx, vy, vz, tau, blk, ci, cj, ck, alive, absorbed, it, ev) = (
        jax.lax.while_loop(cond, body, init)
    )
    ox_ref[:], oy_ref[:], oz_ref[:] = x, y, z
    ovx_ref[:], ovy_ref[:], ovz_ref[:] = vx, vy, vz
    otau_ref[:] = tau
    oblk_ref[:], oci_ref[:], ocj_ref[:], ock_ref[:] = blk, ci, cj, ck
    oalive_ref[:], oabsorbed_ref[:] = alive, absorbed

    # grid steps run sequentially on a TensorCore: accumulate stats in-place
    @pl.when(pl.program_id(0) == 0)
    def _init_stats():
        ev_ref[0, 0] = 0
        it_ref[0, 0] = 0

    ev_ref[0, 0] = ev_ref[0, 0] + ev
    it_ref[0, 0] = jnp.maximum(it_ref[0, 0], it)


def transport_pallas(particles, coefs, mesh, key, prm, dt):
    """Drop-in replacement for ``transport_ops.transport`` on supported configs.

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
    sa_t = _lane_table(coefs.sigma_a, f32)
    ss_t = _lane_table(coefs.sigma_s, f32)
    ff_t = _lane_table(coefs.fleck, f32)
    bdx_t = _lane_table(mesh.block_dx[:, 0], f32)
    bdy_t = _lane_table(mesh.block_dx[:, 1], f32)
    bdz_t = _lane_table(mesh.block_dx[:, 2], f32)
    box_t = _lane_table(mesh.block_origin[:, 0], f32)
    boy_t = _lane_table(mesh.block_origin[:, 1], f32)
    boz_t = _lane_table(mesh.block_origin[:, 2], f32)
    lut_t = _lane_table(mesh.lookup.reshape(-1), i32)

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
    )

    scal = jnp.array([dt, prm.c, 0, 0, 0, 0, 0, 0], dtype=f32)
    try:
        kd = jax.random.key_data(key)
    except (TypeError, AttributeError):
        kd = key
    seed = kd.reshape(-1)[-1].astype(i32)[None]

    kernel = functools.partial(_transport_kernel, prm_static=prm_static)
    part_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    tab_spec = pl.BlockSpec(
        (SUBLANES, LANES), lambda g: (0, 0), memory_space=pltpu.VMEM
    )
    stat_spec = pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM)

    inputs = [
        shape2(p.x, f32), shape2(p.y, f32), shape2(p.z, f32),
        shape2(p.vx, f32), shape2(p.vy, f32), shape2(p.vz, f32),
        shape2(p.tau, f32),
        shape2(p.block), shape2(p.i), shape2(p.j), shape2(p.k),
        shape2(p.alive, i32), shape2(p.absorbed, i32),
    ]
    tables = [sa_t, ss_t, ff_t, bdx_t, bdy_t, bdz_t, box_t, boy_t, boz_t, lut_t]

    out_shapes = (
        [jax.ShapeDtypeStruct((grid * SUBLANES, LANES), f32)] * 7
        + [jax.ShapeDtypeStruct((grid * SUBLANES, LANES), i32)] * 6
        + [jax.ShapeDtypeStruct((1, 1), i32)] * 2
    )
    out_specs = [part_spec] * 13 + [stat_spec] * 2

    results = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        + [part_spec] * 13
        + [tab_spec] * 10,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        input_output_aliases={i + 2: i for i in range(13)},
    )(scal, seed, *inputs, *tables)

    (x, y, z, vx, vy, vz, tau, blk, ci, cj, ck, alive, absorbed, ev, it) = results
    flat = lambda a: a.reshape(cap)
    p = dataclasses.replace(
        p,
        x=flat(x).astype(p.x.dtype), y=flat(y).astype(p.y.dtype), z=flat(z).astype(p.z.dtype),
        vx=flat(vx).astype(p.vx.dtype), vy=flat(vy).astype(p.vy.dtype), vz=flat(vz).astype(p.vz.dtype),
        tau=flat(tau).astype(p.tau.dtype),
        block=flat(blk), i=flat(ci), j=flat(cj), k=flat(ck),
        alive=flat(alive).astype(bool), absorbed=flat(absorbed).astype(bool),
    )
    return p, it[0, 0], ev[0, 0]
