from dsp_slam_rgbd_tpu.system import detections, io, sequence, slam  # noqa: F401
