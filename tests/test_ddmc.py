"""DDMC physics tests.

The strongest check the reference provides is that DDMC reproduces the same
diffusion solution as IMC (its CI runs stepdiff and stepdiff_ddmc against the same
erf curve). The same consistency is tested here directly: one scattering slab run
with DDMC forced everywhere vs pure IMC must give the same tally profile to MC
noise. Plus value checks on the pieces (face probabilities are covered in
test_planck_fleck.py)."""

import numpy as np
import pytest

from jaybenne_tpu import config as cfg_mod
from jaybenne_tpu.driver import Simulation
from jaybenne_tpu.utils.deck import Deck

DECK = """
<parthenon/job>
problem_id = stepdiff

<parthenon/mesh>
nx1 = 16
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
tlim = 2.e-11

<jaybenne>
num_particles = 30000
dt = 1.e-11
do_emission = false
do_feedback = false
seed = 3

<mcblock>
opacity_model = none
scattering_model = constant
scattering_constant_value = 4.0e2
cv = 1.0e8
initial_density = 1.0
initial_temperature = 1.0e5
initial_radiation = thermal
"""


def _run(mods):
    cfg = cfg_mod.from_deck(Deck.parse(DECK).update(mods))
    sim = Simulation(cfg, quiet=True)
    sim.run()
    return sim


def test_ddmc_matches_imc_diffusion():
    """tau/cell = 1e3/32 = 31 >> tau_ddmc: with use_ddmc the whole domain goes
    through the DDMC branch; the resulting energy profile must agree with the pure
    IMC run to MC noise (the reference's stepdiff vs stepdiff_ddmc CI equivalence)."""
    imc = _run({})
    ddmc = _run({"jaybenne/use_ddmc": "true"})
    t1 = np.asarray(imc.state.fields.energy_tally).reshape(-1)
    t2 = np.asarray(ddmc.state.fields.energy_tally).reshape(-1)
    w = t1 + t2
    err = np.abs(t1 - t2)[w > 0].sum() / w[w > 0].sum()
    assert err < 0.06, err
    # both conserve the initial energy exactly (pure scattering, reflecting walls)
    assert np.isclose(t1.sum(), t2.sum(), rtol=1e-4)
    # DDMC needs far fewer events to census than IMC in a thick medium
    assert ddmc.total_events < 0.25 * imc.total_events, (
        ddmc.total_events, imc.total_events,
    )


def test_ddmc_absorption_conserves_energy():
    """DDMC with absorption + emission + feedback: total (matter + radiation) energy
    conserved across a step (the inf_stiff regime at small scale)."""
    import jax.numpy as jnp

    cfg = cfg_mod.from_deck(
        Deck.parse(DECK).update(
            {
                "jaybenne/use_ddmc": "true",
                "jaybenne/do_emission": "true",
                "jaybenne/do_feedback": "true",
                "mcblock/opacity_model": "constant",
                "mcblock/opacity_constant_value": "1000.0",
                "mcblock/scattering_model": "none",
                "jaybenne/num_particles": "8000",
                "jaybenne/dt": "1.e-11",
            }
        )
    )
    sim = Simulation(cfg, quiet=True)
    dv = np.asarray(sim.mesh.block_volume)[:, None, None, None]
    f0, p0 = sim.state.fields, sim.state.particles
    e0 = float((np.asarray(f0.u) * dv).sum()) + float(
        np.asarray(p0.weight)[np.asarray(p0.alive)].sum()
    )
    state, stats = sim.step_fn(sim.state, jnp.float32(1.0e-11))
    f1, p1 = state.fields, state.particles
    e1 = float((np.asarray(f1.u) * dv).sum()) + float(
        np.asarray(p1.weight)[np.asarray(p1.alive)].sum()
    )
    assert abs(e1 - e0) / e0 < 2e-4, (e0, e1)
    assert int(stats.iterations) < cfg.jaybenne.max_transport_iterations
