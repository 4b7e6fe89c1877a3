from . import synthetic, kitti  # noqa: F401
