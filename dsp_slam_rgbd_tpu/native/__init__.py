from dsp_slam_rgbd_tpu.native import runtime  # noqa: F401
