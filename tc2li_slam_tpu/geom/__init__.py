from . import lie, camera, triangulate  # noqa: F401
