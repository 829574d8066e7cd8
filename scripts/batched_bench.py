"""BASELINE config 3 (VERDICT r4 next #5): 64-frame batched registration
throughput on ONE chip — vmap_scan_matching frames/s vs the 1-at-a-time
solver. Real feature sets captured from a synthetic drive, perturbed
per batch entry. Writes BATCHED_r{N}.json.
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
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.models.registration import scan_matching
    from tloam_tpu.parallel import batched
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic

    cfg = load_pipeline_config(None, [])
    tls = cfg.odometry.tls
    scene = synthetic.Scene.town(np.random.default_rng(3), extent=140.0)
    gt = synthetic.town_trajectory(8, step=1.0)
    state = frontend.init_state(cfg, jnp.float32)
    feats = None
    for i in range(5):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870, rng=np.random.default_rng(i)
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32)
        if i == 4:
            feats = jax.jit(frontend.preprocess_frame, static_argnums=1)(raw, cfg)
        else:
            state, _, _ = frontend.odometry_step_nodonate(state, raw, cfg)
    submap = jax.jit(frontend.submap_features, static_argnums=1)(state.submap, cfg)
    predict = state.predict

    B = args.batch
    key = jax.random.PRNGKey(0)

    def tile(x):
        return jnp.broadcast_to(x, (B,) + x.shape).copy()

    scans = jax.tree.map(tile, feats.scan)
    # perturb each batch entry's points slightly so entries are distinct
    noise = jax.random.normal(key, scans.planar.xyz.shape) * 0.002
    scans = scans._replace(planar=scans.planar.replace_xyz(scans.planar.xyz + noise)) \
        if hasattr(scans.planar, "replace_xyz") else scans._replace(
            planar=type(scans.planar)(
                scans.planar.xyz + noise, scans.planar.intensity, scans.planar.valid
            )
        )
    submaps = jax.tree.map(tile, submap)
    predicts = tile(predict)

    vsolve = jax.jit(
        lambda s, m, p: batched.vmap_scan_matching(s, m, p, tls)
    )
    t0 = time.time()
    out = vsolve(scans, submaps, predicts)
    np.asarray(out[0]).ravel()[:1]
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(args.n):
        out = vsolve(scans, submaps, predicts)
    np.asarray(out[0]).ravel()[:1]
    batched_s = (time.time() - t0) / args.n

    ssolve = jax.jit(lambda s, m, p: scan_matching(s, m, p, tls))
    out1 = ssolve(feats.scan, submap, predict)
    np.asarray(out1[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(args.n * 4):
        out1 = ssolve(feats.scan, submap, predict)
    np.asarray(out1[0]).ravel()[:1]
    single_s = (time.time() - t0) / (args.n * 4)

    payload = {
        "metric": "batched_registration_frames_per_s_one_chip",
        "batch": B,
        "batched_frames_per_s": round(B / batched_s, 1),
        "batched_wall_ms": round(batched_s * 1e3, 2),
        "single_frames_per_s": round(1.0 / single_s, 1),
        "single_wall_ms": round(single_s * 1e3, 2),
        "speedup_vs_single": round((B / batched_s) * single_s, 2),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "note": (
            "vmap converts the solver's per-round lax.cond (done-masking, "
            "lazy coarse build, yaw fan) into select: every batched frame "
            "executes all rounds' both branches, so batching is slower per "
            "frame than the sequential early-exiting solver on ONE chip; "
            "the frames axis pays off across chips (EFFICIENCY frames-mesh "
            "~1.0), each device running its own early-exiting program."
        ),
    }
    with open(f"BATCHED_r{args.round:02d}.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
