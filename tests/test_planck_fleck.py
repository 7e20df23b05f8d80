"""Planck sampler moments + Fleck factor / DDMC face probability values."""

import jax
import jax.numpy as jnp
import numpy as np

from jaybenne_tpu.models import eos as eos_m
from jaybenne_tpu.models import opacity as op_m
from jaybenne_tpu.ops import fleck as fleck_ops
from jaybenne_tpu.ops.planck import sample_planck_energy


def test_planck_moments():
    # E/(sb T) ~ x with pdf ~ x^3/(e^x - 1):
    #   mean = Gamma(5) zeta(5) / (Gamma(4) zeta(4)) = 4 zeta(5)/zeta(4) = 3.83223
    key = jax.random.PRNGKey(0)
    sb, T = 1.0, 1.0
    n = 200_000
    e = np.asarray(sample_planck_energy(key, sb, T, (n,), jnp.float32))
    assert abs(e.mean() - 3.83223) < 0.02
    # second moment: E[x^2] = Gamma(6) zeta(6)/(Gamma(4) zeta(4)) = 20 zeta(6)/zeta(4)
    m2 = 20.0 * 1.0173431 / 1.0823232
    assert abs((e**2).mean() - m2) / m2 < 0.02


def test_fleck_factor_hand_calc():
    # f = 1/(1 + 4 emis dt/(rho cv T)), emis = kappa rho c a T^4 (jaybenne.cpp:314-315)
    from jaybenne_tpu.utils import constants

    rho, T, cv, kappa, dt = 1.0, 1.0e5, 1.0e8, 2.0, 1.0e-11
    eos = eos_m.IdealGas(gm1=2.0 / 3.0, cv=cv)
    opac = op_m.Gray(kappa=kappa)
    sie = cv * T
    f = fleck_ops.fleck_factor(
        jnp.full((1, 1, 1, 4), rho), jnp.full((1, 1, 1, 4), sie), eos, opac, dt, jnp.float32
    )
    emis = kappa * rho * constants.CC * constants.AR * T**4
    expect = 1.0 / (1.0 + (4.0 * emis / (rho * cv * T)) * dt)
    assert np.allclose(np.asarray(f), expect, rtol=1e-5)


def test_ddmc_face_probs_uniform():
    """Uniform 1D mesh: interior faces P = 2/(3*2*tau) when tau > tau_ddmc, and the
    thin-limit substitution tau -> 2*lam_ext otherwise (jaybenne.cpp:375-381)."""
    from jaybenne_tpu.config import MeshConfig
    from jaybenne_tpu.mesh import build_mesh

    nx = 8
    cfg = MeshConfig(
        nx1=nx, nx2=1, nx3=1,
        x1min=0.0, x1max=1.0, x2min=-0.5, x2max=0.5, x3min=-0.5, x3max=0.5,
    )
    m = build_mesh(cfg)
    dx = 1.0 / nx
    sigma = 100.0
    sig_t = jnp.full((1, 1, 1, nx), sigma)
    px, py, pz = fleck_ops.ddmc_face_probs(
        m, sig_t, tau_ddmc=5.0, periodic_flags=(False, False, False), dtype=jnp.float32
    )
    tau = sigma * dx  # = 12.5 > 5
    expect = 2.0 / (3.0 * 2.0 * tau)
    assert np.allclose(np.asarray(px), expect, rtol=1e-5)

    # thin case: tau < tau_ddmc on both sides -> P = 2/(3*4*lam_ext)
    sig_thin = jnp.full((1, 1, 1, nx), 1.0)
    px2, _, _ = fleck_ops.ddmc_face_probs(
        m, sig_thin, tau_ddmc=5.0, periodic_flags=(False, False, False), dtype=jnp.float32
    )
    expect2 = 2.0 / (3.0 * (4.0 * fleck_ops.LAM_EXT))
    assert np.allclose(np.asarray(px2), expect2, rtol=1e-5)


def test_ddmc_face_probs_mixed_sides():
    """A face between a thick cell and a thin cell mixes tau_thick with 2*lam_ext."""
    from jaybenne_tpu.config import MeshConfig
    from jaybenne_tpu.mesh import build_mesh

    nx = 4
    cfg = MeshConfig(
        nx1=nx, nx2=1, nx3=1,
        x1min=0.0, x1max=1.0, x2min=-0.5, x2max=0.5, x3min=-0.5, x3max=0.5,
    )
    m = build_mesh(cfg)
    dx = 1.0 / nx
    sig = jnp.asarray([100.0, 1.0, 1.0, 1.0]).reshape(1, 1, 1, nx)
    px, _, _ = fleck_ops.ddmc_face_probs(
        m, sig, tau_ddmc=5.0, periodic_flags=(False, False, False), dtype=jnp.float32
    )
    tau_thick = 100.0 * dx
    lam2 = 2.0 * fleck_ops.LAM_EXT
    # face 1 separates cell0 (thick) and cell1 (thin)
    assert np.isclose(np.asarray(px)[0, 0, 0, 1], 2.0 / (3.0 * (tau_thick + lam2)), rtol=1e-5)
    # face 0 is the domain boundary: ghost = clamped copy of cell0 (zero-gradient)
    assert np.isclose(np.asarray(px)[0, 0, 0, 0], 2.0 / (3.0 * 2.0 * tau_thick), rtol=1e-5)
