#!/usr/bin/env python
"""Step-diffusion gate: 1D uniform slab at 128 cells, weighted-mean tolerance 0.05
(problem spec and constants: see ``stepdiff_common``). Also used for the DDMC
variant via ``--input stepdiff_ddmc.in``."""

import sys

import stepdiff_common as sd

sys.exit(
    sd.run_gate(
        default_deck="stepdiff.in",
        mesh_overrides={
            "parthenon/mesh/nx1": 128,
            "parthenon/meshblock/nx1": 128,
        },
        tolerance=0.05,
    )
)
