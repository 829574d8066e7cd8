"""tloam_tpu — TPU-native truncated-least-squares LiDAR odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the problem class solved by the
T-LOAM reference (C++/ROS/Ceres): robust Gauss-Newton on SE(3) with
point-to-point / point-to-line / point-to-plane TLS residuals over KITTI
velodyne scans, with graduated non-convexity (GNC) outlier rejection.

Layer map (bottom → top):
  ops.se3        — batched Lie-group math (exp/log/hat/adjoint)
  ops.eig3       — closed-form symmetric 3x3 eigendecomposition (vmappable)
  ops.residuals  — the four residual/Jacobian families + GNC weights
  ops.voxel      — voxel downsample + sorted voxel-hash kNN gather
  cloud          — fixed-shape masked point-cloud pytree
  models.*       — ground seg, DCVC clustering, edge extraction, PCA features,
                   TLS-GN registration solver
  pipeline.*     — odometry front end + rolling submap
  parallel.*     — device-mesh sharding, batched multi-frame solver, psum
                   Schur reduction
  io.*           — KITTI dataset reader (numpy + native C++ fast path)
  utils.*        — trajectory writer/eval, timing, checkpointing
"""

__version__ = "0.1.0"
