from . import eos, opacity  # noqa: F401
