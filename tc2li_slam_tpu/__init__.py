"""tc2li_slam_tpu — TPU-native tightly-coupled camera–LiDAR–inertial SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of TC2LI-SLAM
(ORB-SLAM3 stereo(-inertial) tracking + FAST-LIO2 iterated-ESEKF LiDAR-inertial
odometry + BALM2 plane eigen-factor LiDAR bundle adjustment), built TPU-first:

- map state lives in fixed-capacity device arrays (voxel hash instead of
  ikd-tree, padded pools instead of pointer graphs),
- all per-frame numerics are jitted batched kernels (Pallas for the hot ones),
- one Levenberg–Marquardt factor-graph core replaces g2o,
- multi-chip scaling via ``jax.sharding`` meshes + collectives, not threads.

Subpackages
-----------
geom         Lie groups (SO3/SE3/Sim3), camera models, triangulation.
ops          Batched vision + LiDAR kernels (ORB, matching, voxel map, plane fit).
estimation   IMU preintegration, iterated ESEKF, scan undistortion.
solver       LM/GN factor-graph core, reprojection/IMU/BALM factors, PnP, Sim3.
slam         Map pools, tracking state machine, local mapping, system facade.
parallel     Device-mesh sharding of the factor graph + distributed BA.
io           KITTI-format dataset loading, synthetic world generation.
"""

__version__ = "0.1.0"
