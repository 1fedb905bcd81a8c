from dsp_slam_rgbd_tpu.ops.pallas import mlp_sdf  # noqa: F401
