from . import config, lio, local_mapping, mapstate, system, tracking, trajectory  # noqa: F401
