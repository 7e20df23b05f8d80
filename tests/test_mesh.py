"""Mesh construction + block lookup tests (uniform and SMR forests)."""

import numpy as np
import jax.numpy as jnp

from jaybenne_tpu.config import MeshConfig, RefinementRegion
from jaybenne_tpu.mesh import build_mesh


def _cfg_1d(nx=100, mb=50):
    return MeshConfig(
        nx1=nx, nx2=1, nx3=1,
        x1min=-0.5, x1max=0.5, x2min=-0.5, x2max=0.5, x3min=-0.5, x3max=0.5,
        mbnx1=mb, mbnx2=1, mbnx3=1,
    )


def test_uniform_1d_two_blocks():
    m = build_mesh(_cfg_1d())
    assert m.n_blocks == 2
    assert (m.nx, m.ny, m.nz) == (50, 1, 1)
    assert np.allclose(np.asarray(m.block_origin)[:, 0], [-0.5, 0.0])
    assert np.allclose(np.asarray(m.block_dx)[:, 0], 0.01)
    # volumes include full extent of inactive dims
    assert np.allclose(np.asarray(m.block_volume), 0.01)


def test_locate_block_1d():
    m = build_mesh(_cfg_1d())
    x = jnp.asarray([-0.49, -0.01, 0.01, 0.49])
    y = jnp.zeros(4)
    b = m.locate_block(x, y, y)
    assert list(np.asarray(b)) == [0, 0, 1, 1]


def test_cell_of_local_clamping():
    m = build_mesh(_cfg_1d())
    b = jnp.asarray([0, 0, 0])
    # exactly at lower face, mid, exactly at block upper face
    i, j, k = m.cell_of_local(b, jnp.asarray([0.0, 0.255, 0.5]), jnp.zeros(3), jnp.zeros(3))
    assert list(np.asarray(i)) == [0, 25, 49]


def _cfg_smr():
    # the stepdiff_smr test configuration: 64x32 cells, 16^2 blocks, center box at
    # level 1 -> 4 coarse + 16 fine = 20 blocks
    return MeshConfig(
        nx1=64, nx2=32, nx3=1,
        x1min=-0.5, x1max=0.5, x2min=-0.25, x2max=0.25, x3min=-0.5, x3max=0.5,
        mbnx1=16, mbnx2=16, mbnx3=1,
        refinement="static",
        refinement_regions=(
            RefinementRegion(level=1, x1min=-0.25, x1max=0.25,
                             x2min=-0.25, x2max=0.25, x3min=-0.5, x3max=0.5),
        ),
    )


def test_smr_forest():
    m = build_mesh(_cfg_smr())
    assert m.n_blocks == 20
    levels = np.asarray(m.block_level)
    assert (levels == 0).sum() == 4
    assert (levels == 1).sum() == 16
    # fine blocks have half the cell size
    dx = np.asarray(m.block_dx)
    assert np.allclose(dx[levels == 0, 0], 1.0 / 64.0)
    assert np.allclose(dx[levels == 1, 0], 1.0 / 128.0)
    # lookup covers the domain and respects refinement
    b_center = int(m.locate_block(jnp.asarray(0.01), jnp.asarray(0.01), jnp.asarray(0.0)))
    assert int(np.asarray(m.block_level)[b_center]) == 1
    b_edge = int(m.locate_block(jnp.asarray(-0.45), jnp.asarray(0.01), jnp.asarray(0.0)))
    assert int(np.asarray(m.block_level)[b_edge]) == 0


def test_cell_centers_cover_domain():
    m = build_mesh(_cfg_1d())
    xc, yc, zc = m.cell_centers()
    xs = np.sort(np.asarray(xc).reshape(-1))
    expect = -0.5 + (np.arange(100) + 0.5) * 0.01
    assert np.allclose(xs, expect, atol=1e-6)
