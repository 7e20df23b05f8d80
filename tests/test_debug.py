"""Debug invariant checker: passes on healthy runs, catches corrupted state."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from jaybenne_tpu import config as cfg_mod
from jaybenne_tpu.driver import Simulation
from jaybenne_tpu.utils.deck import Deck
from jaybenne_tpu.utils.debug import InvariantError, validate_state

DECK = """
<parthenon/job>
problem_id = dbg

<parthenon/mesh>
nx1 = 8
x1min = -0.5
x1max = 0.5
ix1_bc = outflow
ox1_bc = outflow
nx2 = 1
x2min = -0.5
x2max = 0.5
nx3 = 1
x3min = -0.5
x3max = 0.5

<parthenon/swarm>
ix1_bc = jaybenne_reflecting
ox1_bc = jaybenne_reflecting

<parthenon/time>
tlim = 1.e-11

<jaybenne>
num_particles = 500
dt = 1.e-11
debug_checks = true
seed = 2

<mcblock>
opacity_model = none
scattering_model = constant
scattering_constant_value = 1.0e2
cv = 1.0e8
initial_density = 1.0
initial_temperature = 1.0e5
initial_radiation = thermal
"""


def test_debug_checks_pass_on_healthy_run():
    cfg = cfg_mod.from_deck(Deck.parse(DECK))
    sim = Simulation(cfg, quiet=True)
    sim.run()  # validates each cycle via debug_checks=true
    validate_state(sim.state, sim.mesh, cfg)


def test_debug_checks_catch_corruption():
    cfg = cfg_mod.from_deck(Deck.parse(DECK))
    sim = Simulation(cfg, quiet=True)
    p = sim.state.particles
    bad = dataclasses.replace(p, i=p.i.at[0].set(999))
    state = dataclasses.replace(sim.state, particles=bad)
    with pytest.raises(InvariantError):
        validate_state(state, sim.mesh, cfg)
    bad2 = dataclasses.replace(p, weight=p.weight.at[0].set(jnp.nan))
    with pytest.raises(InvariantError):
        validate_state(dataclasses.replace(sim.state, particles=bad2), sim.mesh, cfg)
