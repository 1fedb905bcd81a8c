"""dsp_slam_rgbd_tpu — a TPU-native object-SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DSP-SLAM
(reference: TINY-KE/DSP-SLAM-RGBD): ORB feature extraction/matching, pose
solving (motion-only GN, EPnP, Sim3/Horn), object-aware bundle adjustment,
loop closing with a tensorized visual vocabulary, and DeepSDF shape-prior
object reconstruction via second-order Gauss-Newton — all device-resident,
with SLAM map state held as masked fixed-capacity struct-of-arrays pytrees
in HBM and scaled across device meshes with `jax.sharding`.

Layout:
  ops/       geometry & math primitives (Lie groups, camera, robust norms, GN)
  models/    DeepSDF decoder + mesh extraction
  recon/     object shape+pose Gauss-Newton optimizer (the FLOPs core)
  frontend/  ORB pyramid features, descriptors, matching, stereo
  solvers/   PnP / Sim3 / triangulation / mono initializer
  mapping/   map state, covisibility, BA (Schur), pose graph
  loop/      place recognition + loop closing
  tracking/  per-frame tracker state machine
  system/    orchestrator, sequence IO, trajectory/map writers
  parallel/  device-mesh sharding of reconstruction & BA
  active/    next-best-view + RRT planning (host-side)
"""

import jax as _jax

# Geometry / Gauss-Newton math is float32 and precision-critical: a bf16 MXU
# pass (the TPU default for f32 matmuls) destroys GN convergence.  Force full
# f32 precision for f32 matmuls; the DeepSDF decoder opts into bf16 speed
# explicitly via bf16-typed weights (dtype-driven, unaffected by this flag).
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
