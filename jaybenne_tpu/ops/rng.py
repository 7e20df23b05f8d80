"""Counter-based RNG utilities.

Replaces the reference's stateful ``Kokkos::Random_XorShift64_Pool`` per-thread
generators (``/root/reference/src/jaybenne/jaybenne.hpp:26-27``, seeded at
``jaybenne.cpp:187-192``) with JAX's counter-based PRNG: every kernel derives a fresh
subkey by folding a stable integer tag (step phase, transport-loop iteration, shard
index) into the state key, then draws whole arrays of variates. Streams are therefore
deterministic for a fixed (seed, sharding) without any cross-thread state, and shards
are decorrelated by folding the shard index (the analog of the reference's
``seed + my_rank``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold(key, *tags):
    for t in tags:
        key = jax.random.fold_in(key, t)
    return key


def uniform(key, shape, dtype):
    """U[0, 1) of the requested float dtype."""
    return jax.random.uniform(key, shape, dtype=dtype)


def uniform_pos(key, shape, dtype):
    """U(0, 1): strictly positive, safe under ``log``."""
    tiny = jnp.finfo(dtype).tiny
    return jnp.maximum(jax.random.uniform(key, shape, dtype=dtype), tiny)


def exponential(key, shape, dtype):
    """Unit-rate exponential variate: ``-log(U(0,1))``, finite and positive."""
    return -jnp.log(uniform_pos(key, shape, dtype))


def isotropic_direction(key, shape, dtype):
    """Uniform direction on the unit sphere, returned as (nx, ny, nz) with the polar
    axis on z — the convention of the reference's ``scatter``
    (``src/jaybenne/scattering.hpp:21-29``)."""
    kmu, kphi = jax.random.split(key)
    mu = 1.0 - 2.0 * uniform(kmu, shape, dtype)
    phi = (2.0 * jnp.pi) * uniform(kphi, shape, dtype)
    st = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
    return st * jnp.cos(phi), st * jnp.sin(phi), mu


def face_isotropic_direction(key, shape, dtype):
    """Cosine-weighted hemisphere direction off a face: principal component
    ``mu = sqrt(U)`` (reference ``sample_face_iso_dir``,
    ``src/jaybenne/transport_utils.hpp:27-39``). Returns (n1, n2, n3) where n1 is the
    **unsigned** principal component; callers apply the face's outward/inward sign and
    map (n1, n2, n3) onto the face's axis permutation."""
    kmu, kphi = jax.random.split(key)
    mu = jnp.sqrt(uniform(kmu, shape, dtype))
    nu = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
    phi = (2.0 * jnp.pi) * uniform(kphi, shape, dtype)
    return mu, nu * jnp.cos(phi), nu * jnp.sin(phi)
