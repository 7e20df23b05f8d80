"""Transport invariants: census completion, energy conservation, domain containment,
block-transition consistency. These are the unit tests the reference lacks
(SURVEY §4 implication)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jaybenne_tpu import config as cfg_mod
from jaybenne_tpu.driver import Simulation
from jaybenne_tpu.utils.deck import Deck

BASE_DECK = """
<parthenon/job>
problem_id = uniform

<parthenon/mesh>
refinement = none
nx1 = 16
x1min = -0.5
x1max = 0.5
ix1_bc = outflow
ox1_bc = outflow
nx2 = 1
x2min = -0.5
x2max = 0.5
ix2_bc = periodic
ox2_bc = periodic
nx3 = 1
x3min = -0.5
x3max = 0.5
ix3_bc = periodic
ox3_bc = periodic

<parthenon/swarm>
ix1_bc = jaybenne_reflecting
ox1_bc = jaybenne_reflecting
ix2_bc = periodic
ox2_bc = periodic
ix3_bc = periodic
ox3_bc = periodic

<parthenon/time>
tlim = 2.e-11
integrator = rk1

<jaybenne>
num_particles = 2000
dt = 1.e-11
seed = 42

<mcblock>
opacity_model = constant
opacity_constant_value = 1.0
scattering_model = constant
scattering_constant_value = 1.0e2
cv = 1.0e8
initial_density = 1.0
initial_temperature = 1.0e5
initial_radiation = thermal
"""


def _sim(mods=None):
    deck = Deck.parse(BASE_DECK).update(mods or {})
    cfg = cfg_mod.from_deck(deck)
    return Simulation(cfg, quiet=True)


def test_census_completion_and_containment():
    sim = _sim()
    sim.run()
    p = sim.state.particles
    alive = np.asarray(p.alive)
    assert alive.sum() > 0
    # all survivors reached census (tau reset to 0 post-step) and sit inside blocks
    i = np.asarray(p.i)[alive]
    x = np.asarray(p.x)[alive]
    dx = np.asarray(sim.mesh.block_dx)[np.asarray(p.block)[alive], 0]
    assert (i >= 0).all() and (i < sim.mesh.nx).all()
    assert (x >= -1e-4).all() and (x <= sim.mesh.nx * dx + 1e-4).all()
    gx, gy, gz = p.global_position(sim.mesh)
    gx = np.asarray(gx)[alive]
    assert (gx >= -0.5 - 1e-5).all() and (gx <= 0.5 + 1e-5).all()


def test_energy_conservation_no_feedback():
    """With emission + absorption and feedback off: initial thermal energy + emitted
    == live weights + absorbed deposits (to float32 summation accuracy)."""
    sim = _sim({"jaybenne/do_emission": "true", "jaybenne/do_feedback": "false"})
    # initial radiation energy
    f0 = sim.state.fields
    dv = np.asarray(sim.mesh.block_volume)[:, None, None, None]
    e_init = float((np.asarray(f0.energy_tally) * dv).sum())
    p0 = sim.state.particles
    w_init = float(np.asarray(p0.weight)[np.asarray(p0.alive)].sum())
    assert np.isclose(e_init, w_init / dv.mean() * dv.mean(), rtol=1e-4)

    state, stats = sim.step_fn(sim.state, jnp.float32(1.0e-11))
    f1, p1 = state.fields, state.particles
    w_live = float(np.asarray(p1.weight)[np.asarray(p1.alive)].sum())
    # energy_delta = absorbed - emitted  =>  w_init = w_live - emitted + absorbed
    delta = float(np.asarray(f1.energy_delta).sum())
    assert np.isclose(w_live + delta, w_init, rtol=5e-4)


def test_feedback_total_energy_conserved():
    """With feedback on: (matter internal energy * dV + radiation weights) is
    conserved across a step."""
    sim = _sim({"jaybenne/do_emission": "true", "jaybenne/do_feedback": "true"})
    dv = np.asarray(sim.mesh.block_volume)[:, None, None, None]
    f0, p0 = sim.state.fields, sim.state.particles
    e_mat0 = float((np.asarray(f0.u) * dv).sum())
    e_rad0 = float(np.asarray(p0.weight)[np.asarray(p0.alive)].sum())

    state, _ = sim.step_fn(sim.state, jnp.float32(1.0e-11))
    f1, p1 = state.fields, state.particles
    e_mat1 = float((np.asarray(f1.u) * dv).sum())
    e_rad1 = float(np.asarray(p1.weight)[np.asarray(p1.alive)].sum())
    total0, total1 = e_mat0 + e_rad0, e_mat1 + e_rad1
    assert abs(total1 - total0) / total0 < 1e-4


def test_pure_scattering_conserves_weight():
    """stepdiff physics: no absorption, reflecting walls -> total live weight exactly
    invariant; tally energy == initial thermal energy."""
    sim = _sim(
        {
            "mcblock/opacity_model": "none",
            "mcblock/scattering_constant_value": "1.0e3",
            "jaybenne/do_emission": "false",
        }
    )
    p0 = sim.state.particles
    w0 = float(np.asarray(p0.weight)[np.asarray(p0.alive)].sum())
    n0 = int(np.asarray(p0.alive).sum())
    state, stats = sim.step_fn(sim.state, jnp.float32(1.0e-11))
    p1 = state.particles
    w1 = float(np.asarray(p1.weight)[np.asarray(p1.alive)].sum())
    assert int(np.asarray(p1.alive).sum()) == n0
    assert np.isclose(w0, w1, rtol=1e-5)
    # census reached by everyone
    assert int(stats.iterations) < sim.cfg.jaybenne.max_transport_iterations


@pytest.mark.slow
def test_two_blocks_statistics_match_one_block():
    """Block decomposition must not change the physics: 1-block vs 2-block runs of
    the same pure-scattering slab agree to MC noise (reference exercises this via
    its 1-vs-8-rank CI matrix)."""
    mods = {
        "mcblock/opacity_model": "none",
        "jaybenne/do_emission": "false",
        "jaybenne/num_particles": "80000",
        "parthenon/mesh/nx1": "32",
    }
    sim1 = _sim(mods)
    sim1.run()
    t1 = np.asarray(sim1.state.fields.energy_tally).reshape(-1)

    sim2 = _sim({**mods, "parthenon/meshblock/nx1": "16"})
    sim2.run()
    assert sim2.mesh.n_blocks == 2
    t2 = np.asarray(sim2.state.fields.energy_tally).reshape(-1)

    # same profile within MC noise (weighted mean fractional difference)
    w = t1 + t2
    err = np.abs(t1 - t2)[w > 0].sum() / w[w > 0].sum()
    # expected MC noise for two independent 80k-particle runs is ~1.5-3%
    assert err < 0.05, err


def test_outflow_removes_particles():
    sim = _sim(
        {
            "parthenon/swarm/ix1_bc": "outflow",
            "parthenon/swarm/ox1_bc": "outflow",
            "mcblock/opacity_model": "none",
            "mcblock/scattering_model": "none",
            "jaybenne/do_emission": "false",
            "parthenon/time/tlim": "1.e-10",
            "jaybenne/dt": "1.e-10",
        }
    )
    # free streaming across a 1-cm box for one light-crossing time: directions are
    # 3D-isotropic, so survivors are those with small |mu_x| (~17% analytically) —
    # assert the bulk left through the outflow faces
    n0 = int(sim.state.particles.num_alive())
    assert n0 > 0
    sim.run()
    n1 = int(sim.state.particles.num_alive())
    assert n1 < 0.25 * n0, (n0, n1)


def test_inexact_domain_extents_do_not_livelock():
    """With extents like [0, 0.1] whose cell faces are not binary-exact, nx*dx can
    round below x1max in f32; the domain-face hit test must still recognize the
    boundary (it is tolerant by half a finest cell) instead of re-homing the
    particle into the top cell forever. Free-streaming outflow: everyone must exit
    in O(nx) events, not max_transport_iterations."""
    sim = _sim(
        {
            "parthenon/mesh/x1min": "0.0",
            "parthenon/mesh/x1max": "0.1",
            "parthenon/mesh/nx1": "10",
            "parthenon/swarm/ix1_bc": "outflow",
            "parthenon/swarm/ox1_bc": "outflow",
            "mcblock/opacity_model": "none",
            "mcblock/scattering_model": "none",
            "jaybenne/do_emission": "false",
            "parthenon/time/tlim": "1.e-10",
            "jaybenne/dt": "1.e-10",
        }
    )
    n0 = int(sim.state.particles.num_alive())
    assert n0 > 0
    state, stats = sim.step_fn(sim.state, jnp.float32(1.0e-10))
    # dt = one light-crossing time of the 0.1 cm box: only near-grazing directions
    # survive. Grazing flights are zone-size capped at dmin per event, so the
    # longest legitimate history is ~c*dt/dmin = 300 events; the livelocked bug
    # spun to max_transport_iterations (10000).
    assert int(stats.iterations) < 400, int(stats.iterations)
    assert int(state.particles.num_alive()) < 0.5 * n0


def test_reflecting_inexact_extents_conserves_particles():
    """Same inexact extents with reflecting walls and pure scattering: no particle
    may be lost or livelocked by the boundary arithmetic."""
    sim = _sim(
        {
            "parthenon/mesh/x1min": "0.0",
            "parthenon/mesh/x1max": "0.1",
            "parthenon/mesh/nx1": "10",
            "mcblock/opacity_model": "none",
            "mcblock/scattering_constant_value": "1.0e2",
            "jaybenne/do_emission": "false",
        }
    )
    n0 = int(sim.state.particles.num_alive())
    state, stats = sim.step_fn(sim.state, jnp.float32(1.0e-11))
    assert int(state.particles.num_alive()) == n0
    assert int(stats.iterations) < sim.cfg.jaybenne.max_transport_iterations


def test_grazing_block_transition_does_not_livelock():
    """A particle sitting EXACTLY on a block face with a grazing direction
    (|v_axis|/c smaller than the position's f32 ulp over the old 0.01-cell
    velocity nudge) must re-home into the neighbor block, not spin at face
    distance 0. Regression for the block-lookup probe: nudging by velocity
    rounds away entirely at such angles (observed 118/20k particles stuck at
    x=0 with |mu| < 0.04 on an 8192-cell mesh); the probe now steps half a
    finest cell along the CROSSED face's normal, like the Pallas kernels."""
    from jaybenne_tpu.mesh import build_mesh
    from jaybenne_tpu.particles import empty_ledger
    from jaybenne_tpu.ops import transport as T
    from jaybenne_tpu.step import make_transport_params
    import jax.random as jr

    deck = Deck.parse(BASE_DECK).update(
        {
            "parthenon/mesh/x1min": "0.0",
            "parthenon/mesh/x1max": "1.0",
            "parthenon/mesh/nx1": 8192,
            "parthenon/meshblock/nx1": 64,
            "mcblock/opacity_model": "none",
            "mcblock/scattering_model": "none",
        }
    )
    cfg = cfg_mod.from_deck(deck)
    mesh = build_mesh(cfg.mesh)
    prm = make_transport_params(cfg, jnp.float32)
    c = jnp.float32(prm.c)
    n = 32
    # lower face of cell 0 of mid-domain blocks (global x ~ 0.5: ulp 6e-8),
    # moving DOWN at grazing angles spanning the old nudge's blind spot
    mus = jnp.geomspace(1e-4, 3e-2, n).astype(jnp.float32)
    p = empty_ledger(128)
    p = dataclasses.replace(
        p,
        x=p.x.at[:n].set(0.0),
        vx=p.vx.at[:n].set(-c * mus),
        vy=p.vy.at[:n].set(c * jnp.sqrt(1.0 - mus * mus)),
        block=p.block.at[:n].set(64),
        i=p.i.at[:n].set(0),
        alive=p.alive.at[:n].set(True),
        weight=p.weight.at[:n].set(1.0),
    )
    NC, B = mesh.total_cells, mesh.n_blocks
    coefs = T.TransportCoefs(
        sigma_a=jnp.zeros((NC,)), sigma_s=jnp.zeros((NC,)),
        fleck=jnp.ones((NC,)),
        px=jnp.zeros((B, 1, 1, mesh.nx + 1)),
        py=jnp.zeros((B, 1, 2, mesh.nx)),
        pz=jnp.zeros((B, 2, 1, mesh.nx)),
    )
    # dt = 40 cell-widths of path: free-streaming census in ~40 zone-capped
    # events; the livelocked bug spun to max_transport_iterations (10000)
    dxc = 1.0 / 8192
    dt = jnp.float32(40 * dxc / float(c))
    pp, iters, _ = T.transport(p, coefs, mesh, jr.PRNGKey(0), prm, dt)
    alive = np.asarray(pp.alive)
    assert int(alive.sum()) == n
    assert not (np.asarray(pp.tau)[alive] < 1.0).any()
    assert int(iters) < 400, int(iters)


def test_per_event_opacity_gray_bitwise_unchanged():
    """Forcing the per-event frequency surface with GRAY models must reproduce the
    precomputed-coefficient path BITWISE: same per-cell values reach every event
    either way (VERDICT #5 contract)."""
    from jaybenne_tpu.ops import transport as T
    from jaybenne_tpu.step import make_transport_params

    sim = _sim({"mcblock/scattering_constant_value": "5.0e2"})
    cfg = sim.cfg
    eos = cfg.mcblock.build_eos()
    opacity = cfg.mcblock.build_opacity()
    scattering = cfg.mcblock.build_scattering()
    prm = make_transport_params(cfg, jnp.float32)
    f = sim.state.fields
    f = dataclasses.replace(
        f,
        fleck=jax.numpy.full_like(f.fleck, 0.8),
    )
    coefs_gray = T.precompute_coefs(
        f, sim.mesh, eos, opacity, scattering, False, jnp.float32
    )
    # hand-build the per-event variant: packed = (rho, T, fleck) + models attached
    temp = eos.temperature_from_density_internal_energy(f.rho, f.sie)
    coefs_evt = dataclasses.replace(
        coefs_gray,
        packed=jnp.stack(
            [
                f.rho.reshape(-1).astype(jnp.float32),
                jnp.asarray(temp, jnp.float32).reshape(-1),
                f.fleck.reshape(-1).astype(jnp.float32),
            ],
            axis=-1,
        ),
        opacity=opacity,
        scattering=scattering,
    )
    key = jax.random.PRNGKey(7)
    dt = jnp.float32(1.0e-11)
    p0 = sim.state.particles
    p1, it1, ev1 = T.transport(p0, coefs_gray, sim.mesh, key, prm, dt)
    p2, it2, ev2 = T.transport(p0, coefs_evt, sim.mesh, key, prm, dt)
    assert int(it1) == int(it2) and int(ev1) == int(ev2)
    for name in ("x", "y", "z", "vx", "vy", "vz", "tau", "weight"):
        a = np.asarray(getattr(p1, name))
        b = np.asarray(getattr(p2, name))
        assert (a == b).all(), name
    for name in ("block", "i", "j", "k", "alive", "absorbed", "face"):
        assert (np.asarray(getattr(p1, name)) == np.asarray(getattr(p2, name))).all(), name


def test_epbremss_end_to_end_runs():
    """A frequency-dependent opacity drives the per-event path through a full
    cycle: energy bookkeeping still closes (weights + deposits vs emission)."""
    sim = _sim(
        {
            "mcblock/opacity_model": "ep_bremss",
            "mcblock/scattering_model": "none",
            "mcblock/initial_temperature": "1.0e7",
            "jaybenne/do_emission": "true",
            "jaybenne/do_feedback": "false",
        }
    )
    p0 = sim.state.particles
    w0 = float(np.asarray(p0.weight)[np.asarray(p0.alive)].sum())
    state, stats = sim.step_fn(sim.state, jnp.float32(1.0e-11))
    p1 = state.particles
    w1 = float(np.asarray(p1.weight)[np.asarray(p1.alive)].sum())
    delta = float(np.asarray(state.fields.energy_delta).sum())
    assert int(stats.iterations) < sim.cfg.jaybenne.max_transport_iterations
    assert np.isclose(w1 + delta, w0, rtol=5e-4), (w0, w1, delta)
