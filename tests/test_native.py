"""Native (C++) mesh-forest builder vs the pure-Python fallback: identical output."""

import numpy as np
import pytest

from jaybenne_tpu import native as native_mod
from jaybenne_tpu.mesh import build_mesh
from jaybenne_tpu.config import MeshConfig, RefinementRegion


def _smr_cfg():
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


def test_native_builds():
    lib = native_mod.load_mesh_builder()
    if lib is None:
        pytest.skip("native builder unavailable (no toolchain)")
    m = build_mesh(_smr_cfg(), use_native=True)
    assert m.n_blocks == 20


def test_native_matches_python():
    if native_mod.load_mesh_builder() is None:
        pytest.skip("native builder unavailable")
    for cfg in (
        _smr_cfg(),
        MeshConfig(nx1=100, nx2=1, nx3=1, x1min=-0.5, x1max=0.5,
                   x2min=-0.5, x2max=0.5, x3min=-0.5, x3max=0.5, mbnx1=50),
    ):
        a = build_mesh(cfg, use_native=True)
        b = build_mesh(cfg, use_native=False)
        assert a.n_blocks == b.n_blocks
        assert a.max_level == b.max_level
        assert a.tile_shape == b.tile_shape
        np.testing.assert_allclose(
            np.asarray(a.block_origin), np.asarray(b.block_origin), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(a.block_dx), np.asarray(b.block_dx), atol=1e-12
        )
        np.testing.assert_array_equal(
            np.asarray(a.block_level), np.asarray(b.block_level)
        )
        np.testing.assert_array_equal(np.asarray(a.lookup), np.asarray(b.lookup))
