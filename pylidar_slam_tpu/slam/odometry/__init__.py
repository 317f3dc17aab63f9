from pylidar_slam_tpu.config import Registry

# Registry of odometry algorithms (discriminator field: `algorithm`,
# mirroring the reference's ODOMETRY enum, slam/odometry/__init__.py:23).
ODOMETRY = Registry("odometry", type_key="algorithm")

# Import for registration side effects (after ODOMETRY exists).
from pylidar_slam_tpu.slam.odometry import icp_odometry  # noqa: E402,F401
from pylidar_slam_tpu.slam.odometry import posenet_odometry  # noqa: E402,F401
