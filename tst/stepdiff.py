#!/usr/bin/env python
"""Step-diffusion regression test: 1D slab vs the analytic erf diffusion solution
(reference ``tst/stepdiff.py``; tolerance 0.05 weighted-mean at 128 cells)."""

import sys

sys.dont_write_bytecode = True

import numpy as np
from scipy.special import erf

import regression_test as rt

parser = rt.get_default_parser()
parser.set_defaults(input="stepdiff.in")
args = parser.parse_args()

modified_inputs = {}
modified_inputs["parthenon/mesh/nx1"] = 128
modified_inputs["parthenon/meshblock/nx1"] = 128

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
    tolerance=0.05,
)

sys.exit(code)
