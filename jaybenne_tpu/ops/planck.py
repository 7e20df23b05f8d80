"""Planck (blackbody) photon-energy sampling.

Vectorized, rejection-free sampler after Everett & Cashwell (1972), the same algorithm
as the reference's ``sample_Planck_energy`` (``/root/reference/src/jaybenne/planck.hpp:26-50``):

  1. choose a series term ``l`` from the CDF ``sum_{j<=l} j^-4  >=  xi * pi^4 / 90``;
  2. return ``E = -(1/l) * ln(xi1 xi2 xi3 xi4) * sb * T``.

The reference finds ``l`` with a data-dependent double loop; here the (static) CDF
table is precomputed and ``l`` is found with a vectorized ``searchsorted`` — identical
distribution, no divergence. The series is truncated at ``L=64`` terms (residual
probability ~4e-7; the reference truncates at 100 and silently falls back to l=1).

``sb * T`` is the energy scale the reference uses (its ``stefan_boltzmann`` runtime
constant); for gray physics the sampled energy only tags the particle (the frequency
argument of opacity models), so the scale choice is inert but kept for parity.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import rng

_L = 64
_terms = np.arange(1, _L + 1, dtype=np.float64) ** -4.0
_CDF = np.cumsum(_terms) / (np.pi**4 / 90.0)
_CDF[-1] = 1.0  # absorb the truncated tail into the last term


def sample_planck_energy(key, sb, temp, shape, dtype):
    """Draw Planck-distributed energies ``E`` with scale ``sb * temp``.

    ``temp`` broadcasts against ``shape``.
    """
    k0, k1 = jax.random.split(key)
    cdf = jnp.asarray(_CDF, dtype=dtype)
    xi0 = rng.uniform(k0, shape, dtype)
    # searchsorted(left): first index with cdf[idx] >= xi0 -> l = idx + 1
    l = jnp.searchsorted(cdf, xi0, side="left").astype(dtype) + 1.0
    u = rng.uniform_pos(k1, (4,) + tuple(shape), dtype)
    log_prod = jnp.sum(jnp.log(u), axis=0)
    return -(1.0 / l) * log_prod * sb * jnp.asarray(temp, dtype=dtype)
