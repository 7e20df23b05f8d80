#!/usr/bin/env python
"""Step-diffusion gate on a 3D statically refined mesh with DDMC: 32x16x16
cells in 8^3 blocks, a centered level-1 box narrower than the domain in x2/x3
(so coarse->fine DDMC leaks cross genuine 3D quad subfaces), weighted-mean
tolerance 0.3 against the same analytic erf profile as the 1D/2D gates.

The reference ships no 3D deck, but its kernels are 3D first-class
(``transport_ddmc.cpp`` X3 handling, ``SampleFace3D`` in
``sample_ddmc_bface.cpp:43-78``); this gate is the rebuild's 3D proof."""

import sys

import stepdiff_common as sd

sys.exit(
    sd.run_gate(
        default_deck="stepdiff_3d_smr_ddmc.in",
        # ~20k cells (vs ~2k in the 2D SMR gate): pin enough particles that the
        # per-cell weighted-mean MC noise sits under the 0.3 tolerance
        mesh_overrides={"jaybenne/num_particles": 500000},
        tolerance=0.3,
    )
)
