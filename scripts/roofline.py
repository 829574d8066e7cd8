"""Per-stage roofline artifact (VERDICT r4 next #2): measured device time
per pipeline stage vs the speed-of-light bound implied by XLA's own
flops/bytes cost model and the chip peaks. Writes ROOFLINE_r{N}.json.

TPU v5e peaks used: 394 TFLOP/s bf16 MXU, ~98 TFLOP/s f32 (MXU f32 runs at
1/4 bf16 throughput), 819 GB/s HBM. "sol_ms" = max(flops/peak, bytes/bw) —
the stage cannot run faster than its roofline bound; "x_sol" says how far
from speed-of-light the measured time is (dispatch overhead ~1 ms floors
every single-stage measurement; the FUSED step amortizes it).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

F32_PEAK = 98e12
HBM_BW = 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--n", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tloam_tpu.cloud import Cloud
    from tloam_tpu.config import load_pipeline_config
    from tloam_tpu.models import dcvc, edge as edge_mod, features, segmentation
    from tloam_tpu.models.registration import scan_matching
    from tloam_tpu.pipeline import frontend
    from tloam_tpu.utils import synthetic

    cfg = load_pipeline_config(None, [])
    scene = synthetic.Scene.town(np.random.default_rng(3), extent=140.0)
    gt = synthetic.town_trajectory(6, step=1.0)
    raws = []
    for i in range(3):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870, rng=np.random.default_rng(i)
        )
        raws.append(Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32))

    state = frontend.init_state(cfg, jnp.float32)
    for r in raws:
        state, _, _ = frontend.odometry_step_nodonate(state, r, cfg)
    submap = jax.jit(frontend.submap_features, static_argnums=1)(state.submap, cfg)
    feats = jax.jit(frontend.preprocess_frame, static_argnums=1)(raws[-1], cfg)
    jax.block_until_ready(submap.planar.xyz)

    def timeit(fn, variants, n=args.n):
        outs = [fn(*variants[i % len(variants)]) for i in range(2)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[-1]).ravel()[:1]
        t0 = time.time()
        outs = [fn(*variants[i % len(variants)]) for i in range(n)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[-1]).ravel()[:1]
        return (time.time() - t0) / n * 1e3

    def cost(jfn, *a):
        c = jfn.lower(*a).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))

    sens, g, d = cfg.sensor, cfg.ground, cfg.dcvc
    cleaned = raws[-1].remove_nonfinite().remove_close(sens.near_dis)
    seg = jax.jit(lambda c: segmentation.ground_remove(c, sens, g))(cleaned)

    stages = {}

    def stage(name, fn, variants):
        jfn = jax.jit(fn)
        ms = timeit(jfn, variants)
        fl, by = cost(jfn, *variants[0])
        sol = max(fl / F32_PEAK, by / HBM_BW) * 1e3
        stages[name] = {
            "measured_ms": round(ms, 3),
            "gflops": round(fl / 1e9, 3),
            "mbytes": round(by / 1e6, 2),
            "sol_ms": round(sol, 4),
            "x_sol": round(ms / sol, 1) if sol > 0 else None,
            "bound_by": "flops" if fl / F32_PEAK > by / HBM_BW else "bytes",
        }
        print(f"{name:22s} {ms:7.2f} ms  sol={sol:7.3f} ms "
              f"({stages[name]['x_sol']}x)  {stages[name]['bound_by']}", flush=True)

    stage("cleanup", lambda r: r.remove_nonfinite().remove_close(sens.near_dis),
          [(r,) for r in raws])
    stage("ground_remove", lambda c: segmentation.ground_remove(c, sens, g),
          [(cleaned,)])
    stage("dcvc_segment",
          lambda c: dcvc.dcvc_segment(c, d, sens, cfg.max_voxels,
                                      cfg.max_clusters, cc_iters=cfg.dcvc_cc_iters),
          [(seg.objects,)])
    stage("preprocess_frame",
          lambda r: frontend.preprocess_frame(r, cfg), [(r,) for r in raws])
    stage("scan_matching",
          lambda s, m, p: scan_matching(s, m, p, cfg.odometry.tls),
          [(feats.scan, submap, state.predict)])
    stage("odometry_step_fused",
          lambda st, r: frontend._odometry_step_impl(st, r, cfg),
          [(state, r) for r in raws])

    payload = {
        "metric": "per_stage_roofline",
        "chip": "TPU v5e",
        "peaks": {"f32_tflops": F32_PEAK / 1e12, "hbm_GBps": HBM_BW / 1e9},
        "note": "sol_ms = max(flops/f32peak, bytes/HBM bw) from XLA cost "
                "analysis; single-stage measurements carry ~1 ms dispatch "
                "floor (relay), the fused step amortizes it",
        "stages": stages,
    }
    out = f"ROOFLINE_r{args.round:02d}.json"
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"out": out, "fused_ms": stages["odometry_step_fused"]["measured_ms"]}))


if __name__ == "__main__":
    main()
