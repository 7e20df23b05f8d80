#!/usr/bin/env python
"""Infinite-medium equilibration gate (``inputs/inf.in``).

Primary criterion (analytic): with feedback off the matter temperature is
pinned at T0, so the radiation field's fixed point is the closed-form thermal
equilibrium u_r = a T0^4 — and since the run STARTS from a thermal sample of
exactly that field, the trajectory must HOLD it through emission/absorption
churn (the coupled two-temperature ODE du_r/dt = c f sigma_a (a T^4 - u_r) has
u_r = a T^4 as its fixed point). Any bias in sourcing, Fleck weighting, or the
emission debit drifts the mean tally off a T0^4.

Secondary criterion: the committed gold tally (the reference ships the
``gold_comparison`` mechanism dormant at ``tst/regression_test.py:450-548``;
active here as a drift tripwire). Regenerate with ``--upgold`` after
intentional physics changes.
"""

import sys

sys.dont_write_bytecode = True

import regression_test as rt
from jaybenne_tpu.utils import constants

parser = rt.get_default_parser()
parser.set_defaults(input="inf.in", comparison="mean")
args = parser.parse_args()

modified_inputs = {
    "parthenon/time/tlim": "2.e-11",
    "jaybenne/num_particles": 2000,
    "jaybenne/seed": 42,
}

T0 = 1.0  # deck initial_temperature [K]; feedback off => pinned
UR_EQ = constants.AR * T0**4


def equilibrium(t, x, y, z):
    return UR_EQ + 0.0 * x


# ~2000 live particles over 64 cells (~30/cell) -> ~18% per-cell MC noise,
# ~2-3% on the 64-cell mean; the 0.1 mean gate detects any systematic bias
code = rt.analytic_comparison(
    args=args,
    variables=["field.jaybenne.energy_tally"],
    solutions=[equilibrium],
    modified_inputs=modified_inputs,
    tolerance=0.1,
)

# the analytic gate is physics-invariant (u_r = a*T0^4): never regenerate the
# gold drift-tripwire from a run that failed it
if code == 0:
    code = rt.gold_comparison(
        args=args,
        variables=["field.jaybenne.energy_tally"],
        modified_inputs=modified_inputs,
        tolerance=0.2,
    )

sys.exit(code)
