"""Prefix-differencing profiler for scan_matching internals on realistic
bench-shaped inputs. Fetch-synced."""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.models import registration as R
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
    print(f"{name:44s} {(time.time()-t0)/n*1e3:9.2f} ms", flush=True)


def main():
    cfg = frontend.PipelineConfig()
    tls = cfg.odometry.tls
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(8, step=1.0)

    # build a REAL state by running 4 frames, then capture scan+submap
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
    print("scan counts:", [int(np.asarray(c.count())) for c in scan], flush=True)
    print("submap counts:", [int(np.asarray(c.count())) for c in submap], flush=True)

    def p_grids(scan, submap, predict):
        caps = lambda c, d=1: max(1024, min(c.capacity // d, 65536))
        return {
            "edge": R._build_surf_cells(submap.edge, tls.edge_dist_thres, caps(submap.edge, 2)),
            "planar": R._build_surf_cells(submap.planar, tls.planar_dist_thres, caps(submap.planar, 2)),
            "ground": R._build_surf_cells(submap.ground, tls.ground_dist_thres, caps(submap.ground)),
        }

    def p_grids_sphere(scan, submap, predict):
        from tloam_tpu.ops import voxel
        g = p_grids(scan, submap, predict)
        g["sphere"] = voxel.build_hash_grid(
            submap.sphere.xyz, submap.sphere.valid, tls.sphere_dist_thres
        )
        return g

    def p_corr1(scan, submap, predict):
        grids = p_grids_sphere(scan, submap, predict)
        xi = jnp.zeros(6, jnp.float32)
        return R._build_correspondences(xi, scan, submap, grids, tls)

    def p_eval1(scan, submap, predict):
        grids = p_grids_sphere(scan, submap, predict)
        xi = jnp.zeros(6, jnp.float32)
        corr = R._build_correspondences(xi, scan, submap, grids, tls)
        w = R._Weights(*(jnp.ones(c.capacity) for c in
                         (scan.planar, scan.ground, scan.edge, scan.sphere)))
        return R._evaluate(xi, scan, corr, w)

    def p_inner(scan, submap, predict):
        grids = p_grids_sphere(scan, submap, predict)
        xi = jnp.zeros(6, jnp.float32)
        corr = R._build_correspondences(xi, scan, submap, grids, tls)
        w = R._Weights(*(jnp.ones(c.capacity) for c in
                         (scan.planar, scan.ground, scan.edge, scan.sphere)))
        return R._gn_inner(xi, scan, corr, w, tls)

    def p_full(scan, submap, predict):
        return R.scan_matching(scan, submap, predict, tls)

    for name, fn in [
        ("3 surf-cell builds", p_grids),
        ("+sphere hash grid", p_grids_sphere),
        ("+1x correspondences", p_corr1),
        ("+1x evaluate", p_eval1),
        ("+1x gn_inner (4 evals+solves)", p_inner),
        ("scan_matching FULL (4 GNC iters)", p_full),
    ]:
        timeit(name, jax.jit(fn), variants)


if __name__ == "__main__":
    main()
