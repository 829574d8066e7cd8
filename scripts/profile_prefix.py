"""Prefix-differencing profiler for preprocess_frame: time jitted PREFIXES of
the stage chain and report deltas, so cross-stage fusion effects are included
(timing stages in isolation lets XLA dead-code-eliminate work that the real
program must do)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.models import dcvc, edge as edge_mod, features, segmentation
from tloam_tpu.ops import voxel
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic


def timeit(name, fn, variants, n=24):
    def _sync(o):
        # np fetch of one scalar: the device queue executes in dispatch order,
        # so fetching from the LAST output waits for everything (the axon
        # relay's block_until_ready returns early - measured round 2)
        leaf = [l for l in jax.tree_util.tree_leaves(o) if hasattr(l, 'ravel')][-1]
        np.asarray(leaf).ravel()[:1]
    outs = [fn(*variants[i % len(variants)]) for i in range(2)]
    _sync(outs[-1])
    t0 = time.time()
    outs = [fn(*variants[i % len(variants)]) for i in range(n)]
    _sync(outs[-1])
    dt = (time.time() - t0) / n
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
    variants = [(r,) for r in raws]
    od = cfg.odometry

    def p_clean(raw):
        return raw.remove_nonfinite().remove_close(cfg.sensor.near_dis)

    def p_ground(raw):
        cloud = p_clean(raw)
        return segmentation.ground_remove(cloud, cfg.sensor, cfg.ground)

    def p_dcvc(raw):
        cloud = p_clean(raw)
        seg = segmentation.ground_remove(cloud, cfg.sensor, cfg.ground)
        return dcvc.dcvc_segment(
            seg.objects, cfg.dcvc, cfg.sensor, cfg.max_voxels, cfg.max_clusters
        ), seg

    def p_edges(raw):
        cloud = p_clean(raw)
        seg = segmentation.ground_remove(cloud, cfg.sensor, cfg.ground)
        clusters = dcvc.dcvc_segment(
            seg.objects, cfg.dcvc, cfg.sensor, cfg.max_voxels, cfg.max_clusters
        )
        n = cloud.capacity
        order_key = clusters.labels.astype(jnp.int32) * n + jnp.arange(n, dtype=jnp.int32)
        edges = edge_mod.extract_edges(
            clusters.segmented, seg.ring, order_key,
            sensor_model=cfg.sensor.sensor_model,
            ring_min_num=cfg.ground.ring_min_num,
        )
        edge_cloud = clusters.segmented.mask(edges.edge_mask)
        general_cloud = clusters.segmented.mask(edges.general_mask)
        return edge_cloud, general_cloud, seg

    def p_pca(raw):
        edge_cloud, general_cloud, seg = p_edges(raw)
        sel = features.extract_planar_sphere(general_cloud, cfg.feature)
        return sel, edge_cloud, general_cloud, seg

    def p_downsample(raw):
        sel, edge_cloud, general_cloud, seg = p_pca(raw)
        g = voxel.voxel_downsample(
            seg.ground.xyz, seg.ground.intensity, seg.ground.valid,
            od.ground_down_sample, od.scan_ground_cap,
        )
        e = voxel.voxel_downsample(
            edge_cloud.xyz, edge_cloud.intensity, edge_cloud.valid,
            od.edge_down_sample, od.scan_edge_cap,
        )
        return g, e, sel

    def p_full(raw):
        return frontend.preprocess_frame(raw, cfg)

    stages = [
        ("clean", p_clean),
        ("+ground_remove", p_ground),
        ("+dcvc", p_dcvc),
        ("+edges", p_edges),
        ("+extract_planar_sphere", p_pca),
        ("+2 voxel_downsamples", p_downsample),
        ("+gather_tops = full preprocess", p_full),
    ]
    prev = 0.0
    for name, fn in stages:
        dt = timeit(name, jax.jit(fn), variants)
        print(f"{name:36s} {dt*1e3:9.2f} ms  (delta {1e3*(dt-prev):+8.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()

def main2():
    cfg = frontend.PipelineConfig()
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(6, step=1.0)
    raws = []
    for i in range(3):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870, rng=np.random.default_rng(i)
        )
        raws.append(Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32))
    variants = [(r,) for r in raws]

    def p_edges(raw):
        cloud = raw.remove_nonfinite().remove_close(cfg.sensor.near_dis)
        seg = segmentation.ground_remove(cloud, cfg.sensor, cfg.ground)
        clusters = dcvc.dcvc_segment(
            seg.objects, cfg.dcvc, cfg.sensor, cfg.max_voxels, cfg.max_clusters
        )
        n = cloud.capacity
        order_key = clusters.labels.astype(jnp.int32) * n + jnp.arange(n, dtype=jnp.int32)
        edges = edge_mod.extract_edges(
            clusters.segmented, seg.ring, order_key,
            sensor_model=cfg.sensor.sensor_model,
            ring_min_num=cfg.ground.ring_min_num,
        )
        edge_cloud = clusters.segmented.mask(edges.edge_mask)
        general_cloud = clusters.segmented.mask(edges.general_mask)
        return edge_cloud, general_cloud, seg

    def p_pca_fused(raw):
        edge_cloud, general_cloud, seg = p_edges(raw)
        return features.extract_planar_sphere(general_cloud, cfg.feature)

    def p_pca_barrier(raw):
        edge_cloud, general_cloud, seg = p_edges(raw)
        general_cloud = jax.lax.optimization_barrier(general_cloud)
        return features.extract_planar_sphere(general_cloud, cfg.feature)

    for name, fn in [("pca FUSED with upstream", p_pca_fused),
                     ("pca BARRIERED from upstream", p_pca_barrier)]:
        dt_holder = []
        f = jax.jit(fn)
        outs = [f(*variants[i % 3]) for i in range(2)]
        jax.block_until_ready(outs)
        t0 = time.time()
        outs = [f(*variants[i % 3]) for i in range(24)]
        jax.block_until_ready(outs)
        print(f"{name:36s} {(time.time()-t0)/24*1e3:9.2f} ms", flush=True)


if __name__ == "__main__" and "--barrier" in sys.argv:
    main2()
