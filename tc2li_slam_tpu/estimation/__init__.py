from . import imu, esekf, undistort  # noqa: F401
