#!/usr/bin/env python
"""Step-diffusion gate on a 2D statically refined mesh: 64x32 cells in 16^2 blocks,
weighted-mean tolerance 0.3 (problem spec and constants: see ``stepdiff_common``).
Also used for the SMR+DDMC and SMR hybrid variants via ``--input``."""

import sys

import stepdiff_common as sd

sys.exit(
    sd.run_gate(
        default_deck="stepdiff_smr.in",
        mesh_overrides={
            "parthenon/mesh/nx1": 64,
            "parthenon/mesh/nx2": 32,
            "parthenon/meshblock/nx1": 16,
            "parthenon/meshblock/nx2": 16,
        },
        tolerance=0.3,
    )
)
