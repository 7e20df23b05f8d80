"""Shared definition of the step-diffusion acceptance problem.

The problem spec comes from the reference's acceptance suite (a hot/cold 1D slab
with pure scattering; the radiation energy density relaxes toward the analytic
error-function diffusion profile). Both the 1D uniform gate (``stepdiff.py``) and
the 2D SMR gate (``stepdiff_smr.py``) check the same closed-form solution, so the
solution and the runner live here once and the per-gate scripts only parameterize
mesh size and tolerance.

Spec constants (diffusion time ``TAU``, initial radiation energy density ``UR0``,
domain half-width ``SHIFT``, and the per-gate tolerances) are the behavioral
contract of the reference problem (``/root/reference/tst/stepdiff.py:32-55``,
``stepdiff_smr.py:40-57``) and must not drift.
"""

import sys

sys.dont_write_bytecode = True

import numpy as np
from scipy.special import erf

import regression_test as rt

# -- reference spec constants -----------------------------------------------
TAU = 1.000692e-7     # diffusion timescale of the slab problem [s]
UR0 = 7.5646e5        # initial hot-side radiation energy density [erg/cm^3]
SHIFT = 0.5           # hot/cold interface sits at x = 0 in a [-0.5, 0.5] domain
TALLY_VAR = "field.jaybenne.energy_tally"


def erf_profile(t, x, y, z):
    """Analytic radiation energy density of step diffusion at time t.

    Solution of du/dt = D d2u/dx2 with a top-hat initial condition of height
    ``UR0`` on [-1, 0] (in shifted coordinates): the difference of two error
    functions spreading with sqrt(t / TAU).
    """
    s = 2.0 * np.sqrt(t / TAU)
    xs = x + SHIFT
    return 0.5 * UR0 * (erf((xs + 0.5) / s) - erf((xs - 0.5) / s))


def run_gate(default_deck, mesh_overrides, tolerance):
    """Parse the standard harness CLI and run the analytic comparison.

    ``mesh_overrides`` maps deck keys (``parthenon/mesh/nx1`` etc.) to the sizes
    this gate pins regardless of what the deck says.
    """
    parser = rt.get_default_parser()
    parser.set_defaults(input=default_deck)
    args = parser.parse_args()
    return rt.analytic_comparison(
        args=args,
        variables=[TALLY_VAR],
        solutions=[erf_profile],
        modified_inputs=dict(mesh_overrides),
        tolerance=tolerance,
    )


def run_profile_gate(default_deck, mesh_overrides, tolerance, nbins):
    """x-profile variant of ``run_gate`` (see ``rt.profile_comparison``): the
    gate for deeply refined meshes, where the per-cell comparison is dominated
    by fine-cell Monte Carlo noise rather than transport fidelity."""
    parser = rt.get_default_parser()
    parser.set_defaults(input=default_deck)
    args = parser.parse_args()
    return rt.profile_comparison(
        args=args,
        variables=[TALLY_VAR],
        solutions=[erf_profile],
        modified_inputs=dict(mesh_overrides),
        tolerance=tolerance,
        nbins=nbins,
    )
