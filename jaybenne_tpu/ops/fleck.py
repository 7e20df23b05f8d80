"""Derived transport fields: Fleck factor and DDMC face probabilities.

TPU-native equivalent of ``UpdateDerivedTransportFields``
(``/root/reference/src/jaybenne/jaybenne.cpp:277-492``).

Fleck factor (Fleck & Cummings 1971), per cell::

    f = 1 / (1 + (4 * emis / (rho * cv * T)) * dt)

DDMC face probability (Habetler-Matkowsky extrapolation, lambda_ext = 0.7104), per
face between cells l (lower) and u (upper)::

    tau_s = dx_s * (sigma_s + sigma_a)_s        for side s in {l, u}
    tau_s = tau_s            if tau_s > tau_ddmc
          = 2 * lambda_ext   otherwise
    P     = 2 / (3 * (tau_l + tau_u))

where ``dx_s`` is the cell size of the side's OWNING block (the reference's
level-scaled ``2^(rlev - rlev_n) * dx`` at ``jaybenne.cpp:354-355`` equals the
neighbor's actual dx).

Across block boundaries the reference reads ghost cells filled by a
prolongation/restriction exchange; here every face evaluates its two sides by a
**position-based sample**: a point a quarter local-cell inward/outward of the face is
located with the mesh's block-lookup grid and the owning cell's (tau, dx) gathered
directly. That single code path covers interior faces, same-level block faces,
coarse/fine (2:1) faces (piecewise-constant sampling in place of prolongation), and
physical boundaries (the sample point is wrapped for periodic field BCs or clamped
into the domain otherwise, reproducing zero-gradient ghosts).
"""

from __future__ import annotations

import jax.numpy as jnp

LAM_EXT = 0.7104  # Habetler & Matkowsky (1975) extrapolation distance


def fleck_factor(rho, sie, eos, opacity, dt, dtype):
    """Per-cell Fleck factor (``jaybenne.cpp:304-316``)."""
    temp = eos.temperature_from_density_internal_energy(rho, sie)
    cv = eos.specific_heat_from_density_internal_energy(rho, sie)
    emis = opacity.emissivity(rho, temp)
    return (1.0 / (1.0 + (4.0 * emis / (rho * cv * temp)) * dt)).astype(dtype)


def _wrap_or_clamp(coord, lo, hi, periodic):
    if periodic:
        return lo + jnp.mod(coord - lo, hi - lo)
    return jnp.clip(coord, lo, hi)


def _sample_tau(mesh, tau_cell_flat, px, py, pz, axis, periodic_flags):
    """Gather tau (along ``axis``) of the cell owning physical point (px, py, pz)."""
    x1min, x1max, x2min, x2max, x3min, x3max = mesh.bounds
    px = _wrap_or_clamp(px, x1min, x1max, periodic_flags[0])
    py = _wrap_or_clamp(py, x2min, x2max, periodic_flags[1])
    pz = _wrap_or_clamp(pz, x3min, x3max, periodic_flags[2])
    b = mesh.locate_block(px, py, pz)
    org = mesh.block_origin[b]
    i, j, k = mesh.cell_of_local(b, px - org[..., 0], py - org[..., 1], pz - org[..., 2])
    flat = mesh.flat_cell(b, k, j, i)
    # tau_cell_flat is [NC, 3]; pick the requested axis
    return jnp.take(tau_cell_flat[:, axis], flat, axis=0)


def ddmc_face_probs(mesh, sigma_t, tau_ddmc, periodic_flags, dtype):
    """Face probability arrays (px, py, pz) of shapes
    ``[B, nz, ny, nx+1] / [B, nz, ny+1, nx] / [B, nz+1, ny, nx]``.

    ``sigma_t``: per-cell total interaction coefficient [B, nz, ny, nx].
    ``periodic_flags``: (x, y, z) bools from the *field* boundary conditions.
    """
    B, nz, ny, nx = sigma_t.shape
    dxv = mesh.block_dx  # [B, 3]
    # tau along each axis for every cell, flattened [B*nz*ny*nx, 3]
    tau3 = sigma_t[..., None] * dxv[:, None, None, None, :]
    tau_flat = tau3.reshape(-1, 3).astype(dtype)

    def one_direction(axis):
        # face-center coordinate grids for this direction
        if axis == 0:
            fshape = (B, nz, ny, nx + 1)
            fi = jnp.arange(nx + 1, dtype=dtype)[None, None, None, :]
            fj = (jnp.arange(ny, dtype=dtype) + 0.5)[None, None, :, None]
            fk = (jnp.arange(nz, dtype=dtype) + 0.5)[None, :, None, None]
        elif axis == 1:
            fshape = (B, nz, ny + 1, nx)
            fi = (jnp.arange(nx, dtype=dtype) + 0.5)[None, None, None, :]
            fj = jnp.arange(ny + 1, dtype=dtype)[None, None, :, None]
            fk = (jnp.arange(nz, dtype=dtype) + 0.5)[None, :, None, None]
        else:
            fshape = (B, nz + 1, ny, nx)
            fi = (jnp.arange(nx, dtype=dtype) + 0.5)[None, None, None, :]
            fj = (jnp.arange(ny, dtype=dtype) + 0.5)[None, None, :, None]
            fk = jnp.arange(nz + 1, dtype=dtype)[None, :, None, None]

        org = mesh.block_origin
        dx = dxv
        px = jnp.broadcast_to(org[:, 0][:, None, None, None] + fi * dx[:, 0][:, None, None, None], fshape)
        py = jnp.broadcast_to(org[:, 1][:, None, None, None] + fj * dx[:, 1][:, None, None, None], fshape)
        pz = jnp.broadcast_to(org[:, 2][:, None, None, None] + fk * dx[:, 2][:, None, None, None], fshape)

        # sample points a quarter local-cell to either side of the face along `axis`
        # (inside the adjacent cell for same/coarser neighbors, and inside the
        # face-adjacent fine cell for 2x finer neighbors)
        d_ax = dx[:, axis][:, None, None, None]
        off = 0.25 * d_ax
        if axis == 0:
            pl = (px - off, py, pz)
            pu = (px + off, py, pz)
        elif axis == 1:
            pl = (px, py - off, pz)
            pu = (px, py + off, pz)
        else:
            pl = (px, py, pz - off)
            pu = (px, py, pz + off)

        tau_l = _sample_tau(mesh, tau_flat, *pl, axis=axis, periodic_flags=periodic_flags)
        tau_u = _sample_tau(mesh, tau_flat, *pu, axis=axis, periodic_flags=periodic_flags)
        tau_l = jnp.where(tau_l > tau_ddmc, tau_l, 2.0 * LAM_EXT)
        tau_u = jnp.where(tau_u > tau_ddmc, tau_u, 2.0 * LAM_EXT)
        return (2.0 / (3.0 * (tau_l + tau_u))).astype(dtype)

    px_arr = one_direction(0)
    py_arr = one_direction(1) if mesh.ndim > 1 else jnp.zeros((B, nz, ny + 1, nx), dtype)
    pz_arr = one_direction(2) if mesh.ndim > 2 else jnp.zeros((B, nz + 1, ny, nx), dtype)
    return px_arr, py_arr, pz_arr
