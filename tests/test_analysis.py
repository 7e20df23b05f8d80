"""Analysis tooling smoke tests: plotter on real dumps, f64 precision mode."""

import os
import subprocess
import sys

import numpy as np
import pytest

from jaybenne_tpu import config as cfg_mod
from jaybenne_tpu.driver import Simulation
from jaybenne_tpu.utils.deck import Deck

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DECK = """
<parthenon/job>
problem_id = plotme

<parthenon/mesh>
nx1 = 16
x1min = -0.5
x1max = 0.5
ix1_bc = outflow
ox1_bc = outflow
nx2 = 8
x2min = -0.25
x2max = 0.25
ix2_bc = periodic
ox2_bc = periodic
nx3 = 1
x3min = -0.5
x3max = 0.5

<parthenon/swarm>
ix1_bc = jaybenne_reflecting
ox1_bc = jaybenne_reflecting
ix2_bc = periodic
ox2_bc = periodic

<parthenon/meshblock>
nx1 = 8
nx2 = 8

<parthenon/time>
tlim = 1.e-11

<jaybenne>
num_particles = 2000
dt = 1.e-11
do_emission = false
do_feedback = false
seed = 9

<mcblock>
opacity_model = none
scattering_model = constant
scattering_constant_value = 2.0e2
cv = 1.0e8
initial_density = 1.0
initial_temperature = 1.0e5
initial_radiation = thermal

<parthenon/output0>
file_type = hdf5
dt = 1.e-11
variables = field.jaybenne.energy_tally, field.material.density
swarms = photons
swarm_variables = swarm.x, swarm.y
"""


def test_plotter_1d_2d(tmp_path):
    cfg = cfg_mod.from_deck(Deck.parse(DECK))
    sim = Simulation(cfg, outdir=str(tmp_path), quiet=True)
    sim.run()
    dumps = sorted(p for p in os.listdir(tmp_path) if p.endswith(".phdf"))
    assert dumps
    dump = os.path.join(str(tmp_path), dumps[-1])
    for args in (
        [dump, "field.jaybenne.energy_tally", "--dim", "1",
         "-o", str(tmp_path / "p1.png")],
        [dump, "field.jaybenne.energy_tally", "--dim", "2", "--blocks",
         "--particles", "-o", str(tmp_path / "p2.png")],
    ):
        r = subprocess.run(
            [sys.executable, os.path.join(_ROOT, "analysis/plot.py")] + args,
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-500:]
    assert (tmp_path / "p1.png").stat().st_size > 1000
    assert (tmp_path / "p2.png").stat().st_size > 1000


def test_f64_precision_mode():
    """precision = f64 runs end-to-end (requires jax_enable_x64, which the driver
    flips on) and conserves energy at double-precision accuracy."""
    import jax

    try:
        cfg = cfg_mod.from_deck(Deck.parse(DECK).update({"jaybenne/precision": "f64"}))
        sim = Simulation(cfg, quiet=True)
        assert sim.state.particles.x.dtype == np.float64
        p0 = sim.state.particles
        w0 = float(np.asarray(p0.weight)[np.asarray(p0.alive)].sum())
        sim.run()
        p1 = sim.state.particles
        w1 = float(np.asarray(p1.weight)[np.asarray(p1.alive)].sum())
        assert abs(w1 - w0) / w0 < 1e-12
    finally:
        # x64 is process-global; restore so later f32 tests keep weak-typed int32
        jax.config.update("jax_enable_x64", False)
