from dsp_slam_rgbd_tpu.parallel import mesh, sharded_ba, sharded_recon  # noqa: F401
