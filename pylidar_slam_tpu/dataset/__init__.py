from pylidar_slam_tpu.config import Registry

# Registry of dataset loaders (discriminator field: `dataset`, mirroring the
# reference's DATASET enum, slam/dataset/__init__.py:15).
DATASET = Registry("dataset", type_key="dataset")


def _register_all():
    # Import for registration side effects.
    from pylidar_slam_tpu.dataset import kitti_dataset  # noqa: F401
    from pylidar_slam_tpu.dataset import synthetic  # noqa: F401
    from pylidar_slam_tpu.dataset import kitti_360_dataset  # noqa: F401
    from pylidar_slam_tpu.dataset import nclt_dataset  # noqa: F401
    from pylidar_slam_tpu.dataset import ford_dataset  # noqa: F401
    from pylidar_slam_tpu.dataset import nhcd_dataset  # noqa: F401
    from pylidar_slam_tpu.dataset import rosbag_dataset  # noqa: F401
    from pylidar_slam_tpu.dataset import urban_loco_dataset  # noqa: F401
    from pylidar_slam_tpu.dataset import ct_icp_dataset  # noqa: F401


_register_all()
