from dsp_slam_rgbd_tpu.mapping import ba, covisibility, map_state, objects, pose_graph  # noqa: F401
