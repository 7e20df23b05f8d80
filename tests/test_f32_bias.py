"""Quantify the float32 face-offset epsilon bias (VERDICT round-1 item #7).

The f32 DDMC path re-seeds leaked particles ``eps_ddmc = 1e-2`` of a cell inside
the destination cell and albedo-bounces ``eps_imc = 1e-3`` of a cell off the face
(``ops/transport.py::default_eps``); in f64 the offsets are ~1e7x smaller. If the
blur biased the leakage physics, the f32 and f64 stepdiff_ddmc profiles would
separate beyond Monte Carlo noise. The test runs the same reduced stepdiff_ddmc
problem at both precisions (independent RNG streams — the comparison is
statistical) and asserts the weighted-mean fractional difference stays well below
the acceptance-gate tolerance (0.05).
"""

import os

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODS = {
    "parthenon/mesh/nx1": 64,
    "parthenon/meshblock/nx1": 64,
    "jaybenne/num_particles": 60000,
    "jaybenne/seed": 7,
    "jaybenne/use_pallas": "off",  # the f64 path has no kernel; compare like with like
}


def _profile(precision, tmpdir, deck="stepdiff_ddmc.in", mods=None):
    from jaybenne_tpu.driver import run_file

    m = dict(MODS if mods is None else mods)
    m["jaybenne/precision"] = precision
    sim = run_file(
        os.path.join(_ROOT, "inputs", deck),
        outdir=os.path.join(tmpdir, precision),
        modified_inputs=m,
        quiet=True,
    )
    return np.asarray(sim.state.fields.energy_tally, dtype=np.float64).reshape(-1)


def _sep(a, b):
    w = a + b
    mask = w > 0
    return np.abs(a - b)[mask].sum() / w[mask].sum()


def _compare(tmp_path, deck, mods, tol, self_calibrate=False):
    """Assert the f32-vs-f64 tally separation stays below ``tol`` — or, with
    ``self_calibrate``, below 1.5x the same metric between two INDEPENDENT f64
    seeds (pure MC noise): a real epsilon bias adds to the noise floor, noise
    alone does not. Needed where the per-cell counts are low (the 2D SMR config
    runs ~30 particles/cell, noise floor ~0.21 — measured seed7-vs-seed8)."""
    import jax

    t32 = _profile("f32", str(tmp_path), deck, mods)
    try:
        t64 = _profile("f64", str(tmp_path), deck, mods)  # driver enables x64
        if self_calibrate:
            m2 = dict(mods)
            m2["jaybenne/seed"] = int(mods.get("jaybenne/seed", 0)) + 1
            t64b = _profile("f64", str(tmp_path) + "_b", deck, m2)
    finally:
        jax.config.update("jax_enable_x64", False)  # don't leak into other tests
    err = _sep(t32, t64)
    if self_calibrate:
        noise = _sep(t64, t64b)
        assert err < 1.5 * noise, (
            f"f32-vs-f64 separation {err:.4f} exceeds 1.5x the measured "
            f"seed-to-seed MC noise {noise:.4f} — a real f32 epsilon bias"
        )
    else:
        assert err < tol, f"f32-vs-f64 weighted separation {err:.4f}"


@pytest.mark.slow
def test_f32_epsilon_bias_below_mc_noise(tmp_path):
    # two independent 60k-particle MC runs of this problem differ by ~1-2%
    # (weighted); a real epsilon bias would push past the 5% gate tolerance
    _compare(tmp_path, "stepdiff_ddmc.in", MODS, 0.03)


@pytest.mark.slow
def test_f32_epsilon_bias_smr_ddmc(tmp_path):
    """SMR + DDMC: coarse->fine subface resamples and level-changing leaks
    re-seed across the eps offsets constantly — the configuration VERDICT r2
    flagged as uncovered."""
    mods = {
        "parthenon/mesh/nx1": 64, "parthenon/mesh/nx2": 32,
        "parthenon/meshblock/nx1": 16, "parthenon/meshblock/nx2": 16,
        "jaybenne/num_particles": 60000,
        "jaybenne/seed": 7,
        "jaybenne/use_pallas": "off",
    }
    # ~30 particles/cell in 2D: the flat-tally noise floor is ~0.21, so the
    # bound is calibrated against measured seed-to-seed noise, not a constant
    _compare(tmp_path, "stepdiff_smr_ddmc.in", mods, None, self_calibrate=True)


def test_f32_epsilon_bias_fast(tmp_path):
    """Reduced-size DDMC bias bound in the FAST suite (VERDICT r2 #8): 3 steps,
    32 cells, 20k particles — enough leakage events that a systematic epsilon
    bias would separate the precisions beyond the loose bound."""
    mods = {
        "parthenon/mesh/nx1": 32, "parthenon/meshblock/nx1": 32,
        "jaybenne/num_particles": 20000,
        "jaybenne/seed": 7,
        "parthenon/time/tlim": "1.0006923e-10",  # 3 steps
        "jaybenne/use_pallas": "off",
    }
    _compare(tmp_path, "stepdiff_ddmc.in", mods, 0.08)
