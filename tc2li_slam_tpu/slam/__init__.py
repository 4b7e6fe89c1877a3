from . import lio  # noqa: F401
