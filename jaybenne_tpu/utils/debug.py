"""Debug invariant checks — the analog of the reference's in-kernel
``PARTHENON_DEBUG_REQUIRE`` position/index sanity assertions
(``/root/reference/src/jaybenne/transport.cpp:100-111``,
``sample_ddmc_bface.cpp:229-234``) and Kokkos debug bounds checking.

Races cannot occur here (tallies are functional segment-sums), so the remaining
invariants are state sanity: enabled per-cycle with ``jaybenne/debug_checks = true``
(host-side, after each step — no cost inside the jitted step).
"""

from __future__ import annotations

import numpy as np


class InvariantError(AssertionError):
    pass


def _require(cond, msg):
    if not cond:
        raise InvariantError(msg)


def validate_state(state, mesh, cfg) -> None:
    """Assert particle/field invariants; raises InvariantError on violation."""
    p = state.particles
    alive = np.asarray(p.alive)
    n = int(alive.sum())
    if n == 0:
        return

    i = np.asarray(p.i)[alive]
    j = np.asarray(p.j)[alive]
    k = np.asarray(p.k)[alive]
    b = np.asarray(p.block)[alive]
    _require((b >= 0).all() and (b < mesh.n_blocks).all(), "block id out of range")
    _require((i >= 0).all() and (i < mesh.nx).all(), "cell i out of logical bounds")
    _require((j >= 0).all() and (j < mesh.ny).all(), "cell j out of logical bounds")
    _require((k >= 0).all() and (k < mesh.nz).all(), "cell k out of logical bounds")

    dxv = np.asarray(mesh.block_dx)[b]
    for q, d, nn, name in (
        (np.asarray(p.x)[alive], dxv[:, 0], mesh.nx, "x"),
        (np.asarray(p.y)[alive], dxv[:, 1], mesh.ny, "y"),
        (np.asarray(p.z)[alive], dxv[:, 2], mesh.nz, "z"),
    ):
        ext = d * nn
        tol = 1e-3 * d  # face-offset epsilons live within a cell width
        _require(
            (q >= -tol).all() and (q <= ext + tol).all(),
            f"particle {name} outside block extent",
        )
        _require(np.isfinite(q).all(), f"non-finite particle {name}")

    w = np.asarray(p.weight)[alive]
    tau = np.asarray(p.tau)[alive]
    v2 = (
        np.asarray(p.vx)[alive] ** 2
        + np.asarray(p.vy)[alive] ** 2
        + np.asarray(p.vz)[alive] ** 2
    )
    _require((w > 0).all(), "non-positive particle weight")
    _require(np.isfinite(w).all(), "non-finite particle weight")
    _require((tau >= 0).all() and (tau <= 1.0 + 1e-6).all(), "tau outside [0, 1]")
    c = cfg.mcblock.build_opacity().get_runtime_physical_constants().c
    _require(
        np.allclose(np.sqrt(v2), c, rtol=2e-3),
        "particle speed drifted from c",
    )

    f = state.fields
    for name in ("energy_tally", "u", "sie", "rho"):
        arr = np.asarray(getattr(f, name))
        _require(np.isfinite(arr).all(), f"non-finite field {name}")
    _require((np.asarray(f.energy_tally) >= 0).all(), "negative energy tally")
