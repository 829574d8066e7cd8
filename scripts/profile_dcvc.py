"""DCVC cost attribution: slope over cc_iters gives the per-round cost, the
intercept gives voxelize+stats. Also times reduced-voxel variants.
Fetch-synced (axon block_until_ready returns early)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.models import dcvc, segmentation
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
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(6, step=1.0)
    objs = []
    for i in range(3):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870, rng=np.random.default_rng(i)
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32)
        cloud = raw.remove_nonfinite().remove_close(cfg.sensor.near_dis)
        seg = segmentation.ground_remove(cloud, cfg.sensor, cfg.ground)
        o = seg.objects
        jax.block_until_ready(o.xyz)
        objs.append(o)
    variants = [(o,) for o in objs]
    print(f"objects valid: {[int(np.asarray(o.count())) for o in objs]}", flush=True)

    for iters in (0, 4, 8, 12):
        timeit(
            f"dcvc cc_iters={iters}",
            jax.jit(lambda c, k=iters: dcvc.dcvc_segment(
                c, cfg.dcvc, cfg.sensor, cfg.max_voxels, cfg.max_clusters,
                cc_iters=k)),
            variants,
        )
    for mv in (16384, 8192):
        timeit(
            f"dcvc max_voxels={mv} (12 rounds)",
            jax.jit(lambda c, m=mv: dcvc.dcvc_segment(
                c, cfg.dcvc, cfg.sensor, m, cfg.max_clusters)),
            variants,
        )


if __name__ == "__main__":
    main()
