"""Finer solver profiling: _build_surf_cells internals + outer-loop
skipped-round overhead. Fetch-synced (axon-relay-safe)."""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.models import registration as R
from tloam_tpu.ops import voxel
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic


def timeit(name, fn, variants, n=24):
    def _sync(o):
        leaf = [l for l in jax.tree_util.tree_leaves(o) if hasattr(l, "ravel")][-1]
        np.asarray(leaf).ravel()[:1]
    outs = [fn(*variants[i % len(variants)]) for i in range(2)]
    _sync(outs[-1])
    t0 = time.time()
    outs = [fn(*variants[i % len(variants)]) for i in range(n)]
    _sync(outs[-1])
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:46s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    cfg = frontend.PipelineConfig()
    tls = cfg.odometry.tls
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(8, step=1.0)

    state = frontend.init_state(cfg, jnp.float32)
    feats = None
    for i in range(5):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870, rng=np.random.default_rng(i)
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32)
        pre = jax.jit(frontend.preprocess_frame, static_argnums=1)(raw, cfg)
        if i < 4:
            state, _, _ = frontend.odometry_step_nodonate(state, raw, cfg)
        feats = pre
    submap = jax.jit(frontend.submap_features, static_argnums=1)(state.submap, cfg)
    scan = feats.scan
    predict = state.predict
    jax.block_until_ready(submap.planar.xyz)
    np.asarray(submap.planar.xyz[:1])
    variants = [(scan, submap, predict)]

    caps = lambda c, d=1: max(1024, min(c.capacity // d, 65536))

    # --- grid build internals on the planar submap (12288 cap) ---
    pl = submap.planar
    mc = caps(pl, 2)

    def p_bt(scan, submap, predict):
        return voxel.build_block_table(pl.xyz, pl.valid, tls.planar_dist_thres, mc)

    def p_bt_mom(scan, submap, predict):
        bt = voxel.build_block_table(pl.xyz, pl.valid, tls.planar_dist_thres, mc)
        return voxel.block_window_moments(
            pl.xyz, pl.valid, bt, tls.planar_dist_thres, return_cell=True
        )

    def p_full_build(scan, submap, predict):
        return R._build_surf_cells(pl, tls.planar_dist_thres, mc)

    def p_build_edge(scan, submap, predict):
        return R._build_surf_cells(
            submap.edge, tls.edge_dist_thres, caps(submap.edge, 2), line_mode="cell"
        )

    def p_build_ground(scan, submap, predict):
        return R._build_surf_cells(
            submap.ground, tls.ground_dist_thres, caps(submap.ground)
        )

    for name, fn in [
        ("planar build_block_table", p_bt),
        ("planar +window_moments", p_bt_mom),
        ("planar full _build_surf_cells", p_full_build),
        ("edge full build (cell mode)", p_build_edge),
        ("ground full build", p_build_ground),
    ]:
        timeit(name, jax.jit(fn), variants)

    # --- outer-loop round cost: max_iterations sweep ---
    for mi in (3, 4, 7):
        tlsm = dataclasses.replace(tls, max_iterations=mi)

        def p_full(scan, submap, predict, _t=tlsm):
            return R.scan_matching(scan, submap, predict, _t)

        timeit(f"scan_matching max_iter={mi}", jax.jit(p_full), variants)

    # stall exit off (all rounds real) for reference
    tls_nostall = dataclasses.replace(tls, exit_stall_rounds=0, exit_cost_thres=0.0)

    def p_nostall(scan, submap, predict):
        return R.scan_matching(scan, submap, predict, tls_nostall)

    timeit("scan_matching 7 rounds NO early exit", jax.jit(p_nostall), variants)


if __name__ == "__main__":
    main()
