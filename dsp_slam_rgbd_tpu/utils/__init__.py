from dsp_slam_rgbd_tpu.utils import checkpoint, timers  # noqa: F401
