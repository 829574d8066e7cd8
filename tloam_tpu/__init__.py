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

# Persistent XLA compilation cache: first-compile latency through the axon
# remote-compile relay can exceed minutes; the cache cuts repeat runs to
# ~sub-second. Opt out with TLOAM_NO_COMPILE_CACHE=1 or override the
# directory with TLOAM_COMPILE_CACHE_DIR.
import os as _os

if not _os.environ.get("TLOAM_NO_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("TLOAM_COMPILE_CACHE_DIR", "/tmp/tloam_jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# TPU matmuls default to bf16 inputs; the solver's J^T J / J^T r reductions
# and plane fits are einsums, and bf16 truncation of ~1e-4 residuals costs
# ~0.4% relative error right where convergence is decided (the reference
# solves in f64). All contractions here are tiny (6-wide), so full-precision
# passes are free. Opt out with TLOAM_NO_HIGHEST_PRECISION=1.
if not _os.environ.get("TLOAM_NO_HIGHEST_PRECISION"):
    import jax as _jax2

    _jax2.config.update("jax_default_matmul_precision", "highest")
