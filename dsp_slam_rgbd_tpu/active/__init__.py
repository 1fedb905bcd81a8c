from dsp_slam_rgbd_tpu.active import nbv, rrt  # noqa: F401
