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


def _enable_compilation_cache():
    """Persistent XLA compilation cache (opt-out via TC2LI_NO_JIT_CACHE).

    The system compiles ~20 large kernels (frame build, tracking, BA, LIO);
    on a real TPU backend that is minutes of XLA time. Caching them on disk
    makes every process after the first start in seconds. Honors an existing
    user-set cache dir.
    """
    import os

    if os.environ.get("TC2LI_NO_JIT_CACHE"):
        return

    def machine_tag():
        # XLA:CPU AOT artifacts bake in the compile machine's feature set;
        # loading them on a host without those features SIGILLs/segfaults
        # (observed: a cache built on an avx512/prefer-no-scatter host
        # crashed the whole test suite elsewhere). Key the cache directory
        # by the host's CPU flags so each machine type gets its own space.
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith("flags"):
                        import hashlib
                        return hashlib.md5(line.encode()).hexdigest()[:10]
        except OSError:
            pass
        import platform
        return platform.machine() or "generic"

    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = os.environ.get(
                "TC2LI_JIT_CACHE_DIR",
                os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                             machine_tag()),
            )
            jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
