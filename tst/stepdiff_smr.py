#!/usr/bin/env python
"""SMR step-diffusion regression test: 2D statically refined mesh vs the analytic erf
solution (reference ``tst/stepdiff_smr.py``; tolerance 0.3 at 64x32 / 16^2 blocks)."""

import sys

sys.dont_write_bytecode = True

import numpy as np
from scipy.special import erf

import regression_test as rt

parser = rt.get_default_parser()
parser.set_defaults(input="stepdiff_smr.in")
args = parser.parse_args()

modified_inputs = {}
modified_inputs["parthenon/mesh/nx1"] = 64
modified_inputs["parthenon/mesh/nx2"] = 32
modified_inputs["parthenon/meshblock/nx1"] = 16
modified_inputs["parthenon/meshblock/nx2"] = 16

# -- Analytic solution
tau = 1.000692e-7
ur0 = 7.5646e5
shift = 0.5


def ur_solution(t, x, y, z):
    return (
        ur0
        / 2.0
        * (
            erf(((x + shift) + 0.5) / (2.0 * np.sqrt(t / tau)))
            - erf(((x + shift) - 0.5) / (2.0 * np.sqrt(t / tau)))
        )
    )


code = rt.analytic_comparison(
    args=args,
    variables=["field.jaybenne.energy_tally"],
    solutions=[ur_solution],
    modified_inputs=modified_inputs,
    tolerance=0.3,
)

sys.exit(code)
