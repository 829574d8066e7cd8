"""Trustworthy per-stage TPU timing.

The axon relay can overlap/elide repeated identical dispatches, which made
the original profile_stages.py report nonsense (e.g. 2.5 ms for a step the
profiler trace shows at 474 ms). This version:
  * feeds a DIFFERENT input every iteration (fresh noise),
  * forces completion by device_get of a scalar reduction of every output
    leaf (full execution + a tiny transfer), and
  * reports per-iteration wall time medians.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.models import dcvc, edge as edge_mod, features, segmentation
from tloam_tpu.models.registration import scan_matching
from tloam_tpu.ops import voxel
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic


def force(out):
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
    s = sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
    return float(jax.device_get(s))


def timeit(name, fn, variants, n=4):
    """variants: list of arg-tuples, cycled; variants[0] used for compile."""
    force(fn(*variants[0]))
    ts = []
    for i in range(n):
        args = variants[(i + 1) % len(variants)]
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:36s} {med*1e3:9.1f} ms  (min {min(ts)*1e3:.1f})", flush=True)


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
    print(f"scan: ~117k pts", flush=True)

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
        "  argsort 131k int32",
        jax.jit(lambda c: jnp.argsort(c.xyz[:, 0].astype(jnp.int32) * 7919)),
        [(c,) for c in cleans],
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
        "update_submap",
        jax.jit(lambda st, ft: frontend.update_submap(st, ft, jnp.eye(4), cfg)),
        [(state.submap, ft) for ft in feats],
    )

    # full step, fresh state threading (real hot loop)
    st = state
    t0 = time.time()
    N = 6
    for i in range(N):
        st, pose, _ = frontend.odometry_step_nodonate(st, raws[i % 3], cfg)
    print(
        f"{'odometry_step x%d (threaded)' % N:36s} {(time.time()-t0)/N*1e3:9.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
