from dsp_slam_rgbd_tpu.frontend import fast, matcher, orb, pyramid, stereo  # noqa: F401
