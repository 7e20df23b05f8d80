"""EOS / opacity / scattering model unit tests (values vs hand calculation;
conventions per SURVEY §2c and the singularity call sites)."""

import jax.numpy as jnp
import numpy as np
import pytest

from jaybenne_tpu.models import eos as eos_m
from jaybenne_tpu.models import opacity as op_m
from jaybenne_tpu.utils import constants


def test_ideal_gas_roundtrip():
    gas = eos_m.IdealGas(gm1=2.0 / 3.0, cv=1.0e8)
    t = gas.temperature_from_density_internal_energy(1.0, 1.0e13)
    assert np.isclose(float(t), 1.0e5)
    cv = gas.specific_heat_from_density_internal_energy(1.0, 1.0e13)
    assert np.isclose(float(cv), 1.0e8)
    sie = gas.internal_energy_from_density_temperature(1.0, 1.0e5)
    assert np.isclose(float(sie), 1.0e13)


def test_unit_system_identity_at_unit_scales():
    base = eos_m.IdealGas(gm1=2.0 / 3.0, cv=1.0e8)
    w = eos_m.UnitSystemEOS(base)
    assert np.isclose(
        float(w.temperature_from_density_internal_energy(1.0, 1.0e13)), 1.0e5
    )


def test_gray_opacity_values():
    g = op_m.Gray(kappa=2.0)
    rho, T = 3.0, 1.0e5
    alpha = float(g.absorption_coefficient(rho, T))
    assert np.isclose(alpha, 6.0)
    # emissivity identity J = alpha * c * a * T^4 (jaybenne.cpp:281-284)
    emis = float(g.emissivity(rho, T))
    assert np.isclose(emis, 6.0 * constants.CC * constants.AR * T**4, rtol=1e-5)


def test_gray_scattering_apm():
    s = op_m.GrayS(s=1.0e3, apm=2.0)
    assert np.isclose(float(s.total_scattering_coefficient(4.0, 1.0)), 2.0e3)


def test_noncgs_wrappers_identity():
    g = op_m.NonCGSUnits(op_m.Gray(kappa=2.0))
    assert np.isclose(float(g.absorption_coefficient(3.0, 1.0e5)), 6.0)
    consts = g.get_runtime_physical_constants()
    assert np.isclose(consts.c, constants.CC)
    assert np.isclose(consts.sb, constants.SB)


def test_noncgs_wrapper_scaling():
    # length_scale = 100 (code unit = 1 m): coefficient in 1/m = 100x the 1/cm value
    g = op_m.NonCGSUnits(op_m.Gray(kappa=1.0), length_scale=100.0)
    # rho in code units (g/m^3): rho_cgs = rho_code * 1/100^3
    rho_code = 1.0e6  # = 1 g/cm^3
    alpha_code = float(g.absorption_coefficient(rho_code, 1.0))
    assert np.isclose(alpha_code, 100.0)  # 1/cm -> 100/m


def test_ep_bremss_scalings():
    e = op_m.EPBremss()
    a1 = float(e.absorption_coefficient(1.0, 1.0e6))
    a2 = float(e.absorption_coefficient(2.0, 1.0e6))
    a3 = float(e.absorption_coefficient(1.0, 2.0e6))
    assert np.isclose(a2 / a1, 4.0)          # ~ rho^2
    assert np.isclose(a3 / a1, 2.0**-3.5)    # ~ T^-3.5


def test_tabulated_opacity_interpolation(tmp_path):
    """Table model reproduces an analytic kappa(rho, T) it was sampled from, both at
    grid nodes (exact) and between them (log-log bilinear), and runs end-to-end as
    opacity_model = table."""
    import os

    # kappa = 3 * rho^0.5 * T^-1.5 sampled on a log grid
    rho_ax = np.logspace(-2, 2, 17)
    t_ax = np.logspace(3, 7, 21)
    kap = 3.0 * rho_ax[:, None] ** 0.5 * t_ax[None, :] ** -1.5
    tab = op_m.TabulatedOpacity.from_arrays(rho_ax, t_ax, kap)
    # at nodes: exact
    a = float(tab.absorption_coefficient(rho_ax[5], t_ax[7]))
    assert np.isclose(a, kap[5, 7] * rho_ax[5], rtol=1e-5)
    # between nodes: power laws are linear in log-log -> interpolation is exact too
    rho_q, t_q = 0.37, 4.2e5
    a2 = float(tab.absorption_coefficient(rho_q, t_q))
    assert np.isclose(a2, 3.0 * rho_q**0.5 * t_q**-1.5 * rho_q, rtol=1e-3)
    # clamping at edges
    a3 = float(tab.absorption_coefficient(1e-9, 1.0))
    assert np.isfinite(a3) and a3 > 0

    # end-to-end via the deck
    import numpy as _np

    path = os.path.join(str(tmp_path), "opac.npz")
    _np.savez(path, rho=rho_ax, T=t_ax, kappa=kap)
    from jaybenne_tpu.config import McblockConfig, InitialRadiation

    mc = McblockConfig(
        problem_id="t", initial_temperature=1e5, initial_density=1.0,
        initial_radiation=InitialRadiation.thermal,
        opacity_model="table", opacity_table_file=path,
    )
    opac = mc.build_opacity()
    v = float(opac.absorption_coefficient(1.0, 1.0e5))
    assert np.isclose(v, 3.0 * 1.0e5**-1.5, rtol=1e-3)


def test_epbremss_spectral_form():
    """EPBremss is frequency-dependent: alpha ~ nu^-3 between the stimulated-emission
    regime and the exponential tail; nu=None returns the Kramers Planck mean."""
    import numpy as np
    from jaybenne_tpu.models.opacity import EPBremss, NonCGSUnits
    from jaybenne_tpu.utils import constants as C

    m = EPBremss()
    rho, T = 1.0, 1.0e6
    mean = float(m.absorption_coefficient(rho, T))
    assert np.isclose(mean, m.kff * rho**2 * T**-3.5, rtol=1e-6)
    assert not m.is_gray and not NonCGSUnits(m).is_gray

    # photon tags are in sb*T units (ops/planck.py): x = tag / (sb * T)
    # in the Wien tail x >> 1 the stimulated factor -> 1 and alpha ~ nu^-3
    e1 = 50.0 * C.SB * T
    a1 = float(m.absorption_coefficient(rho, T, e1))
    a2 = float(m.absorption_coefficient(rho, T, 2.0 * e1))
    assert np.isclose(a1 / a2, 8.0, rtol=1e-3), a1 / a2
    # Rayleigh-Jeans limit: (1 - e^-x) ~ x -> alpha ~ nu^-2
    e3 = 1e-2 * C.SB * T
    a3 = float(m.absorption_coefficient(rho, T, e3))
    a4 = float(m.absorption_coefficient(rho, T, 2.0 * e3))
    assert np.isclose(a3 / a4, 4.0, rtol=1e-2), a3 / a4
    assert a1 > 0 and a3 > 0
    # the Planck-mean of the sampled distribution sits near the Kramers mean:
    # alpha at the spectral peak (x ~ 2.7) is within an order of magnitude
    a_peak = float(m.absorption_coefficient(rho, T, 2.7 * C.SB * T))
    assert 0.01 * mean < a_peak < 100.0 * mean
