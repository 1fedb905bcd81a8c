from dsp_slam_rgbd_tpu.recon import losses, optimizer  # noqa: F401
