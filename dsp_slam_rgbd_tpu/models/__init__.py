from dsp_slam_rgbd_tpu.models import deepsdf, mesh  # noqa: F401
