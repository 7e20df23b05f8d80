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
``--override jaybenne/use_ddmc=true``."""

import sys

import stepdiff_common as sd

sys.exit(
    sd.run_profile_gate(
        default_deck="stepdiff_smr2.in",
        mesh_overrides={
            "parthenon/mesh/nx1": 64,
            "parthenon/mesh/nx2": 32,
            "parthenon/meshblock/nx1": 16,
            "parthenon/meshblock/nx2": 16,
        },
        tolerance=0.1,
        nbins=64,
    )
)
