"""Coarse per-stage TPU timing: which part of odometry_step costs what."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.config import FeatureConfig
from tloam_tpu.models import dcvc, edge as edge_mod, features, segmentation
from tloam_tpu.models.registration import scan_matching
from tloam_tpu.ops import voxel
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic


def timeit(name, fn, *args, n=5, **kw):
    out = jax.block_until_ready(fn(*args, **kw))  # compile
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args, **kw))
    dt = (time.time() - t0) / n
    print(f"{name:32s} {dt*1e3:9.1f} ms", flush=True)
    return out


def main():
    cfg = frontend.PipelineConfig()
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(3, step=1.0)
    xyz, inten = synthetic.simulate_scan(
        gt[1], scene, rings=64, az_steps=1870, rng=np.random.default_rng(1)
    )
    print(f"scan: {xyz.shape[0]} pts", flush=True)
    raw = Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32)

    sensor, g, d, f = cfg.sensor, cfg.ground, cfg.dcvc, cfg.feature

    clean = timeit(
        "remove_close+nonfinite",
        jax.jit(lambda c: c.remove_nonfinite().remove_close(sensor.near_dis)),
        raw,
    )
    seg = timeit(
        "ground_remove",
        jax.jit(lambda c: segmentation.ground_remove(c, sensor, g)),
        clean,
    )
    clusters = timeit(
        "dcvc_segment",
        jax.jit(
            lambda c: dcvc.dcvc_segment(c, d, sensor, cfg.max_voxels, cfg.max_clusters)
        ),
        seg.objects,
    )
    n = clean.capacity
    order_key = clusters.labels.astype(jnp.int32) * n + jnp.arange(n, dtype=jnp.int32)
    edges = timeit(
        "extract_edges",
        jax.jit(
            lambda c, r, o: edge_mod.extract_edges(
                c, r, o, sensor_model=sensor.sensor_model,
                ring_min_num=g.ring_min_num,
            )
        ),
        clusters.segmented,
        seg.ring,
        order_key,
    )
    general = clusters.segmented.mask(edges.general_mask)
    sel = timeit(
        "extract_planar_sphere",
        jax.jit(lambda c: features.extract_planar_sphere(c, f)),
        general,
    )
    timeit(
        "voxel_downsample(ground .3)",
        jax.jit(
            lambda c: voxel.voxel_downsample(
                c.xyz, c.intensity, c.valid, 0.3, cfg.odometry.scan_ground_cap
            )
        ),
        seg.ground,
    )
    feats = timeit(
        "preprocess_frame (full)",
        jax.jit(lambda c: frontend.preprocess_frame(c, cfg), static_argnums=()),
        raw,
    )

    # build a plausible submap = same frame's features (self-registration)
    state = frontend.init_state(cfg, jnp.float32)
    state, _, _ = frontend.odometry_step_nodonate(state, raw, cfg)  # seed
    submap = frontend.submap_features(state.submap, cfg)
    timeit(
        "scan_matching",
        jax.jit(lambda s, m: scan_matching(s, m, jnp.eye(4), cfg.odometry.tls)),
        feats.scan,
        submap,
    )
    timeit(
        "update_submap",
        jax.jit(lambda st, ft: frontend.update_submap(st, ft, jnp.eye(4), cfg)),
        state.submap,
        feats,
    )

    # full step: the donating hot-loop entry — rebind state, fresh raw per call
    mkraw = lambda: Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32)
    st, _, _ = frontend.odometry_step(state, mkraw(), cfg)  # compile
    n = 5
    t0 = time.time()
    for _ in range(n):
        st, pose, _ = frontend.odometry_step(st, mkraw(), cfg)
    jax.block_until_ready(pose)
    print(f"{'odometry_step (full, donated)':32s} {(time.time()-t0)/n*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
