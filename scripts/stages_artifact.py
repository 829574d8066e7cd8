"""Committed per-stage device-time breakdown at bench scale (VERDICT r3
missing #2 / next #2): writes STAGES_r{N}.json.

Timing method (axon-relay-safe): the TPU executes dispatched programs
serially, so for each stage we dispatch `n` executions (cycling distinct
inputs so no caching can collapse them), then FETCH a scalar from the last
output — `block_until_ready` returns before execution finishes through the
relay (memory: axon-tpu-environment), so only the fetch is a true sync.
Per-dispatch tunnel latency (~20 ms) overlaps across the n dispatches and
amortizes to ~1/n.

Stages are the frontend's real per-frame phases (pipeline/frontend.py
`_odometry_step_impl`): cleanup -> ground segmentation -> DCVC -> edge
extraction -> PCA features -> downsamples/picks -> scan_matching (the TLS
solver) -> update_submap. The full fused `odometry_step` is timed last (the
bench number); the stage sum exceeds it because fusing removes boundary
materialization.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.models import dcvc, edge as edge_mod, features, segmentation
    from tloam_tpu.models.registration import scan_matching
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.ops import voxel
    from tloam_tpu.utils import synthetic

    cfg = load_pipeline_config(None, args.set)
    sensor, g, d, f = cfg.sensor, cfg.ground, cfg.dcvc, cfg.feature

    scene = synthetic.Scene.town(np.random.default_rng(3), extent=140.0)
    gt = synthetic.town_trajectory(6, step=1.0)
    raws = []
    for i in range(3):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870, rng=np.random.default_rng(i)
        )
        raws.append(Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32))

    results = {}

    def fetch(out):
        """Drain the device queue: fetch one scalar from the output tree."""
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf.reshape(-1)[0] if leaf.ndim else leaf)

    def timeit(name, fn, variants, n=args.n):
        outs = None
        for i in range(2):  # warm (compile + cache)
            outs = fn(*variants[i % len(variants)])
        fetch(outs)
        t0 = time.time()
        for i in range(n):
            outs = fn(*variants[i % len(variants)])
        fetch(outs)
        dt = (time.time() - t0) / n
        results[name] = round(dt * 1e3, 3)
        print(f"{name:36s} {dt*1e3:9.2f} ms", flush=True)
        return outs

    clean_fn = jax.jit(lambda c: c.remove_nonfinite().remove_close(sensor.near_dis))
    cleans = [clean_fn(r) for r in raws]
    timeit("cleanup", clean_fn, [(r,) for r in raws])

    seg_fn = jax.jit(lambda c: segmentation.ground_remove(c, sensor, g))
    segs = [seg_fn(c) for c in cleans]
    timeit("ground_remove", seg_fn, [(c,) for c in cleans])

    # compaction (the general_cap argsort/take in preprocess_frame)
    def compact(c, ring):
        order = jnp.argsort(~c.valid, stable=True)[: cfg.general_cap]
        packed = jnp.concatenate(
            [c.xyz, c.intensity[:, None], c.valid[:, None].astype(c.xyz.dtype),
             ring[:, None].astype(c.xyz.dtype)], axis=1)
        out = jnp.take(packed, order, axis=0)
        return Cloud(xyz=out[:, :3], intensity=out[:, 3], valid=out[:, 4] > 0.5), \
            out[:, 5].astype(jnp.int32)

    compact_fn = jax.jit(compact)
    compacted = [compact_fn(s.objects, s.ring) for s in segs]
    timeit("compact_objects", compact_fn, [(s.objects, s.ring) for s in segs])

    dcvc_fn = jax.jit(
        lambda c: dcvc.dcvc_segment(c, d, sensor, cfg.max_voxels, cfg.max_clusters)
    )
    clusters = [dcvc_fn(c) for c, _ in compacted]
    timeit("dcvc_segment", dcvc_fn, [(c,) for c, _ in compacted])

    n_cap = compacted[0][0].capacity
    iota = jnp.arange(n_cap, dtype=jnp.int32)
    edge_fn = jax.jit(
        lambda c, r, o: edge_mod.extract_edges(
            c, r, o, sensor_model=sensor.sensor_model, ring_min_num=g.ring_min_num,
            ring_width=cfg.edge_ring_width,
        )
    )
    edge_args = [
        (cl.segmented, ring, cl.labels.astype(jnp.int32) * n_cap + iota)
        for cl, (_, ring) in zip(clusters, compacted)
    ]
    edges = [edge_fn(*a) for a in edge_args]
    timeit("extract_edges", edge_fn, edge_args)

    generals = [cl.segmented.mask(e.general_mask) for cl, e in zip(clusters, edges)]
    timeit(
        "pca_features",
        jax.jit(lambda c: features.extract_planar_sphere(c, f)),
        [(c,) for c in generals],
    )

    timeit(
        "preprocess_frame_total",
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
        jax.jit(lambda st_, ft: frontend.update_submap(st_, ft, jnp.eye(4), cfg)),
        [(state.submap, ft) for ft in feats],
    )

    # the fused full step (what the bench measures per frame)
    st = state
    sfn = frontend.odometry_step_nodonate
    pose = None
    for i in range(3):
        st, pose, dg = sfn(st, raws[i % 3], cfg)
    fetch(pose)
    t0 = time.time()
    for i in range(args.n):
        st, pose, dg = sfn(st, raws[i % 3], cfg)
    fetch(pose)
    results["odometry_step_fused"] = round((time.time() - t0) / args.n * 1e3, 3)
    print(f"{'odometry_step_fused':36s} {results['odometry_step_fused']:9.2f} ms",
          flush=True)

    payload = {
        "metric": "per_stage_device_time_ms",
        "scale": "64-ring 1870-az town scans (~117k pts), bench capacities",
        "sync": "serial-dispatch x n + single scalar fetch (axon-relay-safe)",
        "note": (
            "stage sum > fused step because stage boundaries materialize "
            "intermediate buffers the fused program elides"
        ),
        "stages_ms": results,
        "backend": jax.default_backend(),
    }
    out = f"STAGES_r{args.round:02d}.json"
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"out": out, "fused_ms": results["odometry_step_fused"]}))


if __name__ == "__main__":
    main()
