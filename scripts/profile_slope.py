"""Slope profiler: real in-program cost of each pipeline sub-op, measured as
the marginal cost of repeating the op K times inside ONE jitted program
(eliminates the ~1 ms per-dispatch relay overhead that floors single-op
timings). Inputs are perturbed per repetition so XLA cannot CSE the copies;
a data dependence chains repetitions so they cannot be eliminated.

Usage: python scripts/profile_slope.py [--ops op1,op2] [--k 4]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.models import dcvc, edge as edge_mod, features, registration as R, segmentation
from tloam_tpu.ops import voxel
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic


def measure(fn, args, n=16):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]
    return (time.time() - t0) / n * 1e3


def slope(name, make_fn, args, k=4, n=16):
    """make_fn(K) -> jitted fn running the op K times (chained)."""
    t1 = measure(make_fn(1), args, n)
    tk = measure(make_fn(k), args, n)
    print(f"{name:42s} {(tk - t1) / (k - 1):8.3f} ms  (1x={t1:.2f} {k}x={tk:.2f})",
          flush=True)


def chain(f, K, seed_of_out):
    """Build g(*args): run f K times, mixing a scalar derived from the
    previous output into the first (array) argument to serialize + defeat CSE."""

    def g(*args):
        a0 = args[0]
        acc = jnp.asarray(0.0, jnp.float32)
        out = None
        for i in range(K):
            bump = (acc * 1e-20 + i * 1e-7).astype(a0.dtype) if jnp.issubdtype(
                a0.dtype, jnp.floating) else jnp.asarray(0, a0.dtype)
            out = f(a0 + bump, *args[1:])
            acc = acc + seed_of_out(out).astype(jnp.float32)
        return out, acc

    return jax.jit(g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--ops", default="")
    args = ap.parse_args()

    cfg = frontend.PipelineConfig()
    od = cfg.odometry
    tls = od.tls
    scene = synthetic.Scene.town(np.random.default_rng(3), extent=140.0)
    gt = synthetic.town_trajectory(8, step=1.0)

    state = frontend.init_state(cfg, jnp.float32)
    feats = None
    raw = None
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
    jax.block_until_ready(submap.planar.xyz)

    caps = lambda c, d=1: max(1024, min(c.capacity // d, 65536))
    first = lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[0]

    # cleaned cloud + ring for downstream stage inputs
    cleaned = raw.remove_nonfinite().remove_close(cfg.sensor.near_dis)
    seg = jax.jit(
        lambda c: segmentation.ground_remove(c, cfg.sensor, cfg.ground)
    )(cleaned)
    # compacted objects (same as frontend)
    packed = jnp.concatenate(
        [seg.objects.xyz, seg.objects.intensity[:, None],
         seg.objects.valid[:, None].astype(jnp.float32),
         seg.ring[:, None].astype(jnp.float32)], axis=1)
    order = jnp.argsort(~seg.objects.valid, stable=True)[: cfg.general_cap]
    outp = jnp.take(packed, order, axis=0)
    objects = Cloud(xyz=outp[:, :3], intensity=outp[:, 3], valid=outp[:, 4] > 0.5)
    obj_ring = outp[:, 5].astype(jnp.int32)
    clusters = jax.jit(
        lambda c: dcvc.dcvc_segment(c, cfg.dcvc, cfg.sensor, cfg.max_voxels,
                                    cfg.max_clusters, cc_iters=cfg.dcvc_cc_iters)
    )(objects)
    n = objects.capacity
    order_key = clusters.labels.astype(jnp.int32) * n + jnp.arange(n, dtype=jnp.int32)
    edges = jax.jit(
        lambda c: edge_mod.extract_edges(
            c, obj_ring, order_key, sensor_model=cfg.sensor.sensor_model,
            ring_min_num=cfg.ground.ring_min_num, ring_width=cfg.edge_ring_width)
    )(clusters.segmented)
    general_cloud = clusters.segmented.mask(edges.general_mask)
    jax.block_until_ready(general_cloud.xyz)

    OPS = {}

    OPS["ground_remove"] = (
        lambda x: segmentation.ground_remove(
            Cloud(x, cleaned.intensity, cleaned.valid), cfg.sensor, cfg.ground
        ),
        (cleaned.xyz,), lambda o: first(o),
    )
    OPS["dcvc"] = (
        lambda x: dcvc.dcvc_segment(
            Cloud(x, objects.intensity, objects.valid), cfg.dcvc, cfg.sensor,
            cfg.max_voxels, cfg.max_clusters, cc_iters=cfg.dcvc_cc_iters
        ),
        (objects.xyz,), lambda o: first(o),
    )
    OPS["edges"] = (
        lambda x: edge_mod.extract_edges(
            Cloud(x, clusters.segmented.intensity, clusters.segmented.valid),
            obj_ring, order_key, sensor_model=cfg.sensor.sensor_model,
            ring_min_num=cfg.ground.ring_min_num, ring_width=cfg.edge_ring_width
        ),
        (clusters.segmented.xyz,), lambda o: first(o),
    )
    OPS["pca"] = (
        lambda x: features.extract_planar_sphere(
            Cloud(x, general_cloud.intensity, general_cloud.valid), cfg.feature
        ),
        (general_cloud.xyz,), lambda o: first(o),
    )
    OPS["build_planar"] = (
        lambda x: R._build_surf_cells(
            Cloud(x, submap.planar.intensity, submap.planar.valid),
            tls.planar_dist_thres, caps(submap.planar, 2)
        ),
        (submap.planar.xyz,), lambda o: first(o),
    )
    OPS["build_ground"] = (
        lambda x: R._build_surf_cells(
            Cloud(x, submap.ground.intensity, submap.ground.valid),
            tls.ground_dist_thres, caps(submap.ground)
        ),
        (submap.ground.xyz,), lambda o: first(o),
    )
    OPS["build_edge"] = (
        lambda x: R._build_surf_cells(
            Cloud(x, submap.edge.intensity, submap.edge.valid),
            tls.edge_dist_thres, caps(submap.edge, 2), line_mode="cell"
        ),
        (submap.edge.xyz,), lambda o: first(o),
    )

    grids = jax.jit(lambda: {
        "edge": R._build_surf_cells(submap.edge, tls.edge_dist_thres,
                                    caps(submap.edge, 2), line_mode="cell"),
        "planar": R._build_surf_cells(submap.planar, tls.planar_dist_thres,
                                      caps(submap.planar, 2)),
        "ground": R._build_surf_cells(submap.ground, tls.ground_dist_thres,
                                      caps(submap.ground)),
        "sphere": voxel.build_hash_grid(submap.sphere.xyz, submap.sphere.valid,
                                        tls.sphere_dist_thres),
    })()
    jax.block_until_ready(grids["planar"].surf)
    xi0 = jnp.zeros(6, jnp.float32)

    OPS["corr_round"] = (
        lambda x: R._build_correspondences(
            x, scan, submap, grids, tls, None, None, None
        ),
        (xi0,), lambda o: first(o),
    )

    w = R._Weights(*(jnp.ones(c.capacity) for c in
                     (scan.planar, scan.ground, scan.edge, scan.sphere)))
    corr = jax.jit(lambda: R._build_correspondences(
        xi0, scan, submap, grids, tls, None, None, None))()
    jax.block_until_ready(corr.plane_n)

    OPS["gn_inner"] = (
        lambda x: R._gn_inner(x, scan, corr, w, tls),
        (xi0,), lambda o: first(o),
    )
    OPS["evaluate"] = (
        lambda x: R._evaluate(x, scan, corr, w, 1.0),
        (xi0,), lambda o: first(o),
    )

    sel = args.ops.split(",") if args.ops else list(OPS)
    for name in sel:
        f, a, seed = OPS[name]
        slope(name, lambda K, f=f, s=seed: chain(f, K, s), a, k=args.k)


if __name__ == "__main__":
    main()
