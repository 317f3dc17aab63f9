"""pyLiDAR-SLAM-TPU: a TPU-native (JAX/XLA/Pallas) LiDAR odometry & SLAM framework.

A ground-up re-design of the capabilities of Kitware/pyLiDAR-SLAM (the reference
implementation lives at /root/reference) for TPU hardware:

  * All numeric kernels are pure-functional JAX ops over fixed-shape padded arrays
    (no per-frame recompiles) -- see ``pylidar_slam_tpu.ops``.
  * The ICP odometry inner loop is a single jitted ``lax.while_loop`` fusing
    transform -> projective association -> point-to-plane residual/Jacobian ->
    6x6 Gauss-Newton solve -- see ``pylidar_slam_tpu.slam.odometry``.
  * Pipeline state is an explicit pytree; the reference's ``data_dict`` string-key
    protocol (slam/slam.py:118-168 in the reference) is preserved at the host
    boundary as the public API.
  * Multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` (point-sharded
    normal equations, data-parallel training) -- see ``pylidar_slam_tpu.parallel``.
"""

__version__ = "0.1.0"
