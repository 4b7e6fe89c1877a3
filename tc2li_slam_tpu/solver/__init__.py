from . import factors, lm, balm  # noqa: F401
