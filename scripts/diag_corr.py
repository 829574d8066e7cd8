"""Diagnose starved correspondence families at bench scale (VERDICT weak #2).

Reproduces the bench setup (synthetic urban scene, 64x1870 scans) and prints
per-gate survival counts for every family: classification -> scan caps ->
correspondence gates. Run with JAX_PLATFORMS=cpu for iteration, or on TPU.
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tloam_tpu.cloud import Cloud
from tloam_tpu.models import features as feat_mod, registration as reg
from tloam_tpu.ops import se3, voxel
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic


def main():
    cfg = frontend.PipelineConfig()
    od = cfg.odometry
    tls = od.tls
    rings, az = 64, 1870
    cap = 131072
    n_frames = 5

    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(n_frames, step=1.0, yaw_rate=0.005)
    scans = []
    for i in range(n_frames):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=rings, az_steps=az,
            rng=np.random.default_rng(i), noise=0.01,
        )
        scans.append((xyz, inten))
    print("scan sizes:", [s[0].shape[0] for s in scans], file=sys.stderr)

    pf = jax.jit(frontend.preprocess_frame, static_argnums=1)

    feats = []
    for i in range(n_frames):
        raw = Cloud.from_numpy(*scans[i], capacity=cap, dtype=jnp.float32)
        f = pf(raw, cfg)
        feats.append(f)
        print(
            f"frame {i}: scan counts planar={int(f.scan.planar.count())} "
            f"ground={int(f.scan.ground.count())} edge={int(f.scan.edge.count())} "
            f"sphere={int(f.scan.sphere.count())} | submap-class "
            f"planar_frame={int(f.planar_frame.count())} "
            f"sphere_frame={int(f.sphere_frame.count())} clusters={int(f.num_clusters)}"
        )

    # classification detail on frame 1 (before gather_top)
    raw1 = Cloud.from_numpy(*scans[1], capacity=cap, dtype=jnp.float32)

    def classify(raw):
        from tloam_tpu.models import dcvc, edge as edge_mod, segmentation
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
        general_cloud = clusters.segmented.mask(edges.general_mask)
        sel = feat_mod.extract_planar_sphere(general_cloud, cfg.feature)
        pca = sel.pca
        return dict(
            n_general=jnp.sum(general_cloud.valid),
            n_hasinfo=jnp.sum(pca.has_info),
            n_flat_gate=jnp.sum(pca.has_info & (pca.flatness > cfg.feature.planar_submap_thres)),
            n_vert_gate=jnp.sum(
                pca.has_info
                & (pca.flatness > cfg.feature.planar_submap_thres)
                & (jnp.abs(pca.normal[:, 2]) < cfg.feature.planar_vertic_thres)
            ),
            n_planar_scan=jnp.sum(sel.planar_scan),
            n_cvr_gate=jnp.sum(pca.has_info & (pca.cvr > cfg.feature.cvr_submap)),
            n_sphere_cls=jnp.sum(sel.sphere_submap),
            n_sphere_scan=jnp.sum(sel.sphere_scan),
            flat_q=jnp.percentile(
                jnp.where(pca.has_info, pca.flatness, jnp.nan),
                jnp.asarray([50.0, 75.0, 90.0, 99.0]),
            ),
            cvr_q=jnp.percentile(
                jnp.where(pca.has_info, pca.cvr, jnp.nan),
                jnp.asarray([50.0, 90.0, 99.0, 99.9]),
            ),
            nz_q=jnp.percentile(
                jnp.where(
                    pca.has_info & (pca.flatness > cfg.feature.planar_submap_thres),
                    jnp.abs(pca.normal[:, 2]), jnp.nan,
                ),
                jnp.asarray([10.0, 50.0, 90.0]),
            ),
        )

    d = jax.jit(classify)(raw1)
    for k, v in d.items():
        print(f"  classify[{k}] = {np.asarray(v)}")

    # ---- correspondence gates: submap from frames 0-2 windows, query frame 3
    state = frontend.init_state(cfg, jnp.float32)
    step = frontend.odometry_step
    poses = []
    for i in range(4):
        raw = Cloud.from_numpy(*scans[i], capacity=cap, dtype=jnp.float32)
        state, pose, diag = step(state, raw, cfg)
        poses.append(np.asarray(pose))
        print(
            f"odom frame {i}: iters={int(diag.iterations)} "
            f"corr={np.asarray(diag.num_corr)} costs={np.asarray(diag.costs)} "
            f"degenerate={bool(diag.degenerate)}"
        )

    submap = frontend.submap_features(state.submap, cfg)
    print(
        f"submap counts: planar={int(submap.planar.count())} "
        f"ground={int(submap.ground.count())} edge={int(submap.edge.count())} "
        f"sphere={int(submap.sphere.count())}"
    )

    scan = feats[4].scan
    predict = jnp.asarray(state.predict)

    def corr_gates(scan, submap, predict):
        T = predict
        planar_w = se3.transform(T, scan.planar.xyz)
        sphere_w = se3.transform(T, scan.sphere.xyz)

        out = {}
        # planar via cell_plane
        cells = reg._build_surf_cells(
            submap.planar, tls.planar_dist_thres,
            max(1024, min(submap.planar.capacity, 65536)),
        )
        data, ok, cen_dist = reg._query_surf_cells(cells, planar_w, scan.planar.valid)
        surf = voxel.unpack_records(cells.surf, 12, 16)
        out["planar_cells_okplane"] = jnp.sum(surf[10] > 0.5)
        out["planar_cells_total"] = jnp.sum(surf[10] >= 0.0)
        out["planar_q_valid"] = jnp.sum(scan.planar.valid)
        out["planar_q_found"] = jnp.sum(scan.planar.valid & ok)
        out["planar_q_okplane"] = jnp.sum(scan.planar.valid & ok & (data[10] > 0.5))
        out["planar_q_dist"] = jnp.sum(
            scan.planar.valid & ok & (data[10] > 0.5)
            & (cen_dist <= tls.planar_dist_thres)
        )
        out["cen_dist_q"] = jnp.percentile(
            jnp.where(scan.planar.valid & ok, cen_dist, jnp.nan),
            jnp.asarray([10.0, 50.0, 90.0]),
        )
        # sphere: 1-NN with dist_sq <= 0.2
        grid = voxel.build_hash_grid(
            submap.sphere.xyz, submap.sphere.valid, tls.sphere_dist_thres
        )
        idx, dist_sq, okn = voxel.query_knn(
            grid, sphere_w, scan.sphere.valid, k=1,
            radius=tls.sphere_dist_thres, max_per_cell=tls.max_per_cell,
        )
        out["sphere_q_valid"] = jnp.sum(scan.sphere.valid)
        out["sphere_q_found"] = jnp.sum(scan.sphere.valid & okn[:, 0])
        out["sphere_q_dist"] = jnp.sum(
            scan.sphere.valid & okn[:, 0] & (dist_sq[:, 0] <= 0.2)
        )
        return out

    g = jax.jit(corr_gates)(scan, submap, predict)
    for k, v in g.items():
        print(f"  corr[{k}] = {np.asarray(v)}")


if __name__ == "__main__":
    main()
