from dsp_slam_rgbd_tpu.loop import keyframe_db, loop_closing, vocabulary  # noqa: F401
