"""Prefix-differencing profiler for calculate_pca_info_cell internals."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from tloam_tpu.cloud import Cloud
from tloam_tpu.models import dcvc, edge as edge_mod, features, segmentation
from tloam_tpu.ops import eig3, voxel
from tloam_tpu.pipeline import frontend
from tloam_tpu.utils import synthetic


def timeit(name, fn, variants, n=24, prev=[0.0]):
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
    print(f"{name:40s} {dt*1e3:9.2f} ms  (delta {1e3*(dt-prev[0]):+8.2f})",
          flush=True)
    prev[0] = dt


def main():
    cfg = frontend.PipelineConfig()
    scene = synthetic.Scene.urban(np.random.default_rng(3), extent=80.0)
    gt = synthetic.straight_trajectory(6, step=1.0)
    gens = []
    for i in range(3):
        xyz, inten = synthetic.simulate_scan(
            gt[i], scene, rings=64, az_steps=1870, rng=np.random.default_rng(i)
        )
        raw = Cloud.from_numpy(xyz, inten, capacity=131072, dtype=jnp.float32)
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
        gens.append(jax.block_until_ready(clusters.segmented.mask(edges.general_mask)))
    variants = [(g,) for g in gens]
    fc = cfg.feature
    max_cells = 65536
    print(f"valid pts: {[int(g.count()) for g in gens]}", flush=True)

    def p_table(cloud):
        return voxel.build_block_table(cloud.xyz, cloud.valid, fc.radius, max_cells)

    def _store(cloud, bt):
        dtype = cloud.xyz.dtype
        cs = jnp.asarray(fc.radius, dtype)
        coords = jnp.floor(cloud.xyz / cs).astype(jnp.int32)
        qx = cloud.xyz[:, 0] - coords[:, 0].astype(dtype) * cs
        qy = cloud.xyz[:, 1] - coords[:, 1].astype(dtype) * cs
        qz = cloud.xyz[:, 2] - coords[:, 2].astype(dtype) * cs
        pc = bt.point_cell
        in_cell = cloud.valid & (pc >= 0)
        m = in_cell.astype(dtype)
        B = bt.cx.shape[0]
        seg_ = jnp.where(in_cell, bt.cell_store[jnp.maximum(pc, 0)], B * 8)
        z = jnp.zeros_like(m)
        vals = jnp.stack(
            [m, qx*m, qy*m, qz*m, qx*qx*m, qx*qy*m, qx*qz*m,
             qy*qy*m, qy*qz*m, qz*qz*m, z, z, z, z, z, z], axis=1)
        store = jax.ops.segment_sum(vals, seg_, num_segments=B * 8 + 1)[: B * 8]
        return store.reshape(B, 128)

    def p_store(cloud):
        bt = p_table(cloud)
        return _store(cloud, bt)

    def p_probe(cloud):
        bt = p_table(cloud)
        store = _store(cloud, bt)
        rows, found = voxel.block_window_probe_rows(bt, bt.cx, bt.cy, bt.cz)
        return store, rows, found

    def p_moments(cloud):
        bt = p_table(cloud)
        return voxel.block_window_moments(cloud.xyz, cloud.valid, bt, fc.radius)

    def p_eig(cloud):
        bt = p_table(cloud)
        _, mw, cache = voxel.block_window_moments(cloud.xyz, cloud.valid, bt, fc.radius)
        w_cnt, sx, sy, sz, mxx, mxy, mxz, myy, myz, mzz = mw
        cnt = jnp.maximum(w_cnt, 1.0)
        mx, my, mz = sx / cnt, sy / cnt, sz / cnt
        a00 = mxx / cnt - mx * mx
        a01 = mxy / cnt - mx * my
        a02 = mxz / cnt - mx * mz
        a11 = myy / cnt - my * my
        a12 = myz / cnt - my * mz
        a22 = mzz / cnt - mz * mz
        lam0, lam1, lam2 = eig3.eigvalsh3_soa(a00, a01, a02, a11, a12, a22)
        nx_, ny_, nz_ = eig3.eigvec_soa(a00, a01, a02, a11, a12, a22, lam0)
        return lam0, lam1, lam2, nx_, ny_, nz_, cache, bt

    def p_localmax(cloud):
        lam0, lam1, lam2, nx_, ny_, nz_, cache, bt = p_eig(cloud)
        rows, found, parity = cache
        lam_sum = lam0 + lam1 + lam2
        c_cvr = jnp.where(lam_sum > 0, lam0 / jnp.maximum(lam_sum, 1e-30), 0.0)
        nbr_max = voxel.block_window_scalar_max(bt, c_cvr, rows, found, parity)
        return nbr_max, c_cvr

    def p_pca_full(cloud):
        return features.calculate_pca_info_cell(cloud, fc, max_cells)

    def p_extract(cloud):
        return features.extract_planar_sphere(cloud, fc)

    for name, fn in [
        ("build_block_table", p_table),
        ("+moment store (segment_sum)", p_store),
        ("+probe_rows", p_probe),
        ("+window matmul = moments", p_moments),
        ("+eig features", p_eig),
        ("+scalar_max localmax", p_localmax),
        ("calculate_pca_info_cell (full)", p_pca_full),
        ("extract_planar_sphere (full)", p_extract),
    ]:
        timeit(name, jax.jit(fn), variants)


if __name__ == "__main__":
    main()
