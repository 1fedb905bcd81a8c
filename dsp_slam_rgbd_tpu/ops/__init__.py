from dsp_slam_rgbd_tpu.ops import lie, robust, camera, gn  # noqa: F401
