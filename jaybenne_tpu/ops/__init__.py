from . import fleck, planck, rng, sourcing, tally, transport  # noqa: F401
