"""Batched + sharded multi-frame registration (BASELINE configs 3-5).

The reference solves one frame at a time in a sequential ROS loop
(lidar_odometry_nodelet.cpp update thread). Here whole batches of frames are
solved in parallel:

  * `vmap_scan_matching` — 64-frame batches fused into one XLA program on a
    single chip (BASELINE config 3). The per-frame GNC while_loops batch
    cleanly (a frame that converges early masks out).
  * `sharded_scan_matching` — the same batched solve with the frame axis laid
    out over the mesh's "frames" axis via NamedSharding; XLA partitions the
    whole program with zero cross-frame communication (configs 4-5 frame
    partitioning across hosts/chips).
  * `distributed_scan_matching` — ONE frame's correspondence buffers sharded
    over the "points" axis inside shard_map; the 6x6 J^T J / J^T r blocks,
    GNC max-residual, and family cost sums are psum/pmax-reduced across the
    mesh each iteration (the collective Schur reduction of BASELINE's north
    star). Correspondence caps bind on the GLOBAL scan-order index (each
    shard offsets its prefix count by preceding shards' totals), so the
    N-way solve admits exactly the single-device correspondence set even
    when caps bind.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tloam_tpu.config import TLSConfig
from tloam_tpu.models.registration import FeatureSet, scan_matching


@partial(jax.jit, static_argnums=3)
def vmap_scan_matching(
    scans: FeatureSet,  # leaves with leading batch axis B
    submaps: FeatureSet,  # leading batch axis B (per-frame submaps)
    predict_poses: jax.Array,  # (B,4,4)
    cfg: TLSConfig,
):
    """Solve B independent frames in one fused program."""
    return jax.vmap(lambda s, m, p: scan_matching(s, m, p, cfg))(
        scans, submaps, predict_poses
    )


def sharded_scan_matching(
    scans: FeatureSet,
    submaps: FeatureSet,
    predict_poses: jax.Array,
    cfg: TLSConfig,
    mesh: Mesh,
):
    """Frame-data-parallel batched solve: batch axis over mesh axis "frames".

    The batch size must be divisible by the mesh's frames axis. XLA partitions
    the vmapped program; per-frame solves are independent so the only
    communication is the (tiny) gathered outputs.
    """
    batch_sh = NamedSharding(mesh, P("frames"))

    def shard_batched(tree):
        def place(x):
            spec = P("frames", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))

        return jax.tree.map(place, tree)

    scans = shard_batched(scans)
    submaps = shard_batched(submaps)
    predict_poses = jax.device_put(predict_poses, batch_sh)
    return vmap_scan_matching(scans, submaps, predict_poses, cfg)


def distributed_scan_matching(
    scan: FeatureSet,
    submap: FeatureSet,
    predict_pose: jax.Array,
    cfg: TLSConfig,
    mesh: Mesh,
    axis: str = "points",
):
    """Consensus registration of ONE frame with its scan features sharded
    across `axis`: every device evaluates residuals/Jacobians for its point
    shard, the normal equations are psum-reduced, and each device applies the
    identical SE(3) update (lockstep GNC).

    The submap is replicated; scan feature capacities must be divisible by
    the axis size.
    """
    shard_map = jax.shard_map

    point_spec = jax.tree.map(lambda x: P(axis, *([None] * (x.ndim - 1))), scan)
    rep_submap = jax.tree.map(lambda x: P(*([None] * x.ndim)), submap)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(point_spec, rep_submap, P(None, None)),
        out_specs=(P(None, None), jax.tree.map(lambda _: P(), _diag_struct(cfg))),
        check_vma=False,
    )
    def solve(scan_local, submap_local, predict):
        return scan_matching(scan_local, submap_local, predict, cfg, axis_name=axis)

    return jax.jit(solve)(scan, submap, predict_pose)


def _diag_struct(cfg: TLSConfig):
    """Pytree structure template for Diagnostics out_specs."""
    from tloam_tpu.models.registration import Diagnostics

    mi = cfg.max_iterations
    return Diagnostics(
        iterations=jnp.int32(0),
        mu=0.0,
        costs=jnp.zeros(4),
        num_corr=jnp.zeros(4, jnp.int32),
        degenerate=jnp.asarray(False),
        misaligned=jnp.asarray(False),  # scan_matching always emits it
        never_aligned=jnp.asarray(False),
        corr_trace=jnp.zeros((mi, 4), jnp.int32),
        cost_trace=jnp.zeros(mi),
        coarse_trace=jnp.zeros(mi, bool),
        aligned_trace=jnp.zeros(mi, bool),
    )
