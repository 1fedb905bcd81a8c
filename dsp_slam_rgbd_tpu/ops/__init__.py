from dsp_slam_rgbd_tpu.ops import lie, robust, camera  # noqa: F401
