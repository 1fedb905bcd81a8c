from dsp_slam_rgbd_tpu.tracking import tracker  # noqa: F401
