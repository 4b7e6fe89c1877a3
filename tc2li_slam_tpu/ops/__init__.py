from . import voxel_map, plane_fit, pointcloud  # noqa: F401
