from pylidar_slam_tpu.config import Registry

# Registry of pose-regression networks (reference slam/models/posenet.py:72-78).
POSENET = Registry("posenet", type_key="type")

from pylidar_slam_tpu.models import posenet  # noqa: E402,F401  (registration)
