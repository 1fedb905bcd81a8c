from dsp_slam_rgbd_tpu.solvers import (  # noqa: F401
    initializer,
    pnp,
    pose_gn,
    sim3,
    triangulate,
)
