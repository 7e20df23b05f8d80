#!/usr/bin/env python
"""Step-diffusion gate on a NESTED level-2 statically refined mesh (levels
0/1/2 in one 2:1-graded forest — deeper than any reference deck reaches;
problem spec and constants: see ``stepdiff_common``).

Gated on the volume-weighted x-PROFILE at root resolution (tolerance 0.1)
rather than per-cell: under uniform-per-cell sourcing a level-2 cell sees 16x
fewer particles than a root cell, so the per-cell weighted error is dominated
by fine-cell Monte Carlo noise (~0.4 at 100k particles, scaling as 1/sqrt(N))
while the profile error stays ~3x tighter than even the level-1 per-cell gate's
0.3 tolerance — and a transport bug at either refinement jump still distorts
the profile at the box edges. Also used for the DDMC-everywhere variant via
``--override jaybenne/use_ddmc=true``.

``--per-cell`` switches to the PER-CELL weighted comparison at the reference's
SMR tolerance (0.3) — affordable at >= 400k particles, where the measured
fine-cell noise is ~0.19 (1/sqrt(N) scaling measured in round 4: 0.397 at
100k -> 0.193 at 400k). The CI runner's slow row pairs it with
``--override jaybenne/num_particles=400000`` to pin depth-2 correctness
cell-by-cell, not just profile-by-profile."""

import sys

import stepdiff_common as sd

MESH = {
    "parthenon/mesh/nx1": 64,
    "parthenon/mesh/nx2": 32,
    "parthenon/meshblock/nx1": 16,
    "parthenon/meshblock/nx2": 16,
}

if "--per-cell" in sys.argv:
    sys.argv.remove("--per-cell")
    sys.exit(
        sd.run_gate(
            default_deck="stepdiff_smr2.in",
            mesh_overrides=MESH,
            tolerance=0.3,
        )
    )

sys.exit(
    sd.run_profile_gate(
        default_deck="stepdiff_smr2.in",
        mesh_overrides=MESH,
        tolerance=0.1,
        nbins=64,
    )
)
