"""Per-stage TPU timing, tunnel-safe: dispatch N executions (cycling distinct
inputs), sync ONCE, divide. The TPU executes programs serially in dispatch
order, so the sum of wall time between the first dispatch and the final sync
is the sum of program times — per-dispatch tunnel latency (~20 ms) overlaps
and cancels (unlike profile_stages2's per-iteration device_get)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.models import dcvc, edge as edge_mod, features, segmentation
from tloam_tpu.models.registration import scan_matching, _build_surf_cells
from tloam_tpu.ops import voxel
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic


def timeit(name, fn, variants, n=24):
    outs = [fn(*variants[i % len(variants)]) for i in range(2)]
    jax.block_until_ready(outs)
    t0 = time.time()
    outs = [fn(*variants[i % len(variants)]) for i in range(n)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / n
    print(f"{name:40s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    cfg = frontend.PipelineConfig()
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(6, step=1.0)
    raws = []
    for i in range(3):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870, rng=np.random.default_rng(i)
        )
        raws.append(Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32))
    print("scan: ~117k pts", flush=True)

    sensor, g, d, f = cfg.sensor, cfg.ground, cfg.dcvc, cfg.feature

    clean_fn = jax.jit(lambda c: c.remove_nonfinite().remove_close(sensor.near_dis))
    cleans = [clean_fn(r) for r in raws]
    timeit("remove_close+nonfinite", clean_fn, [(r,) for r in raws])

    seg_fn = jax.jit(lambda c: segmentation.ground_remove(c, sensor, g))
    segs = [seg_fn(c) for c in cleans]
    timeit("ground_remove", seg_fn, [(c,) for c in cleans])

    dcvc_fn = jax.jit(
        lambda c: dcvc.dcvc_segment(c, d, sensor, cfg.max_voxels, cfg.max_clusters)
    )
    clusters = [dcvc_fn(s.objects) for s in segs]
    timeit("dcvc_segment", dcvc_fn, [(s.objects,) for s in segs])

    n = cleans[0].capacity
    iota = jnp.arange(n, dtype=jnp.int32)
    edge_fn = jax.jit(
        lambda c, r, o: edge_mod.extract_edges(
            c, r, o, sensor_model=sensor.sensor_model, ring_min_num=g.ring_min_num
        )
    )
    edge_args = [
        (cl.segmented, s.ring, cl.labels.astype(jnp.int32) * n + iota)
        for cl, s in zip(clusters, segs)
    ]
    edges = [edge_fn(*a) for a in edge_args]
    timeit("extract_edges", edge_fn, edge_args)

    generals = [cl.segmented.mask(e.general_mask) for cl, e in zip(clusters, edges)]
    timeit(
        "extract_planar_sphere(cell)",
        jax.jit(lambda c: features.extract_planar_sphere(c, f)),
        [(c,) for c in generals],
    )
    timeit(
        "  build_cell_table",
        jax.jit(lambda c: voxel.build_cell_table(c.xyz, c.valid, f.radius, 65536)),
        [(c,) for c in generals],
    )
    tables = [
        voxel.build_cell_table(c.xyz, c.valid, f.radius, 65536) for c in generals
    ]
    timeit(
        "  cell_neighbor_index",
        jax.jit(voxel.cell_neighbor_index),
        [(t,) for t in tables],
    )
    nbrs = [voxel.cell_neighbor_index(t) for t in tables]
    timeit(
        "  anchored_window_moments",
        jax.jit(
            lambda c, t, nb: voxel.anchored_window_moments(
                c.xyz, c.valid, t, nb, f.radius
            )
        ),
        [(c, t, nb) for c, t, nb in zip(generals, tables, nbrs)],
    )

    timeit(
        "voxel_downsample(ground .3)",
        jax.jit(
            lambda c: voxel.voxel_downsample(
                c.xyz, c.intensity, c.valid, 0.3, cfg.odometry.scan_ground_cap
            )
        ),
        [(s.ground,) for s in segs],
    )
    timeit(
        "preprocess_frame (full)",
        jax.jit(lambda c: frontend.preprocess_frame(c, cfg)),
        [(r,) for r in raws],
    )

    feat_fn = jax.jit(lambda c: frontend.preprocess_frame(c, cfg))
    feats = [feat_fn(r) for r in raws]
    state = frontend.init_state(cfg, jnp.float32)
    state, _, _ = frontend.odometry_step_nodonate(state, raws[0], cfg)
    submap = frontend.submap_features(state.submap, cfg)
    timeit(
        "scan_matching",
        jax.jit(lambda s, m: scan_matching(s, m, jnp.eye(4), cfg.odometry.tls)),
        [(ft.scan, submap) for ft in feats],
    )
    timeit(
        "  build_surf_cells(planar submap)",
        jax.jit(
            lambda c: _build_surf_cells(
                c, cfg.odometry.tls.planar_dist_thres,
                max(1024, min(c.capacity, 65536)),
            )
        ),
        [(submap.planar,)],
    )
    timeit(
        "update_submap",
        jax.jit(lambda st, ft: frontend.update_submap(st, ft, jnp.eye(4), cfg)),
        [(state.submap, ft) for ft in feats],
    )

    # full step (the number that matters)
    sfn = frontend.odometry_step_nodonate
    st = state
    outs = []
    for i in range(3):
        st, pose, dg = sfn(st, raws[i % 3], cfg)
    jax.block_until_ready(pose)
    N = 12
    t0 = time.time()
    for i in range(N):
        st, pose, dg = sfn(st, raws[i % 3], cfg)
    jax.block_until_ready(pose)
    print(
        f"{'odometry_step (threaded, no xfer)':40s} {(time.time()-t0)/N*1e3:9.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
