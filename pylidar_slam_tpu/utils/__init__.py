from pylidar_slam_tpu.utils.checks import assert_debug, check_tensor
