"""Odometry front end: per-frame device pipeline + rolling submap.

TPU-native replacement for the reference's ``FrontEnd`` + the three-nodelet
process layer (reference: src/front_end/front_end.cpp:14-338,
src/core_node/*_nodelet.cpp). The reference splits preprocessing and odometry
into separate ROS threads passing clouds through topic queues; here the whole
per-frame path — close-point removal, ground segmentation, DCVC clustering,
edge extraction, PCA features, downsampling, scan-to-map TLS-GNC solve, and
submap update — is ONE jitted device program (`odometry_step`); the host loop
just streams raw scans in (with the C++ prefetch loader overlapping I/O).

Reference behaviors reproduced (citations):
  * first frame seeds the submap: raw edge cloud, 0.3-voxel ground,
    submap-class planar/sphere features (front_end.cpp:285-305).
  * scan features: ground 0.3 / edge 0.1 voxel downsample; planar/sphere =
    scan-class PCA selections (processCloud, front_end.cpp:181-199).
  * constant-velocity motion model predicate = pose * (last^-1 * pose)
    (front_end.cpp:329-332).
  * submap: 3-frame planar/sphere windows transformed per frame; edge/ground
    accumulated, crop-boxed ±100 m around the current position, then
    re-downsampled 0.3/0.45 (updateSubmap, front_end.cpp:201-275).
  * QUIRK kept behind `sphere_submap_from_planar` (default True): the
    reference builds BOTH the sphere and planar submaps from
    `submap_planar_buffer` (front_end.cpp:240,253 — both loops iterate the
    planar deque), so the sphere submap is actually planar features.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tloam_tpu.cloud import Cloud
from tloam_tpu.config import (
    DCVCConfig,
    FeatureConfig,
    GroundSegConfig,
    OdometryConfig,
    SensorConfig,
)
from tloam_tpu.models import dcvc, edge as edge_mod, features, segmentation
from tloam_tpu.models.registration import Diagnostics, FeatureSet, scan_matching
from tloam_tpu.ops import se3, voxel


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """All static hyper-parameters of the front end."""

    sensor: SensorConfig = dataclasses.field(default_factory=SensorConfig)
    ground: GroundSegConfig = dataclasses.field(default_factory=GroundSegConfig)
    dcvc: DCVCConfig = dataclasses.field(default_factory=DCVCConfig)
    feature: FeatureConfig = dataclasses.field(default_factory=FeatureConfig)
    odometry: OdometryConfig = dataclasses.field(default_factory=OdometryConfig)
    # Reference quirk (front_end.cpp:240,253): BOTH the sphere and planar
    # submaps are assembled from the planar deque, so sphere scan features
    # (isotropic, high-cvr) must find a PLANAR pick within the 0.45 m gate
    # to match at all — measured 17/200 mean, 0 min sphere correspondences.
    # Default False = the evident intent (sphere deque feeds the sphere
    # submap); True reproduces the reference bit of behavior.
    sphere_submap_from_planar: bool = False
    sphere_index_bug: bool = False
    # DCVC voxel table capacity: every CC-round scatter/gather scales with
    # this. HDL-64E urban scans occupy ~4-5k curved voxels (measured); 8192
    # leaves ~2x headroom (overflow voxels drop their points from clustering)
    max_voxels: int = 8192
    max_clusters: int = 128
    # azimuth sectors for capacity-bounded feature picks (0 = global top-k).
    # The reference keeps every point above the scan threshold (unbounded,
    # feature_extract.cpp:171-189); per-sector top-k keeps that spatial
    # breadth under static capacities — a global top-k clusters on the
    # flattest (nearest) wall and can lose all submap overlap.
    pick_sectors: int = 16
    # per-frame submap-class feature capacities (planar/sphere window frames)
    frame_planar_cap: int = 4096
    frame_sphere_cap: int = 1024
    # submap-class planar COVERAGE FILL: in addition to the flatness top-k
    # picks, each frame contributes `frame_planar_fill` extra slots holding
    # the flattest ORIGINAL point of each `frame_planar_voxel` cell over ALL
    # classified planar points. The reference submap keeps every classified
    # point (feature_extract.cpp:167-189 submap class; updateSubmap pushes
    # the full clouds); a flatness-ranked subset re-picks DIFFERENT parts of
    # the same walls each frame — measured (r5, route-a world 306 f18):
    # after two occlusion frames the scan's picks sat >= 2.2 m from every
    # submap planar point (both on the same facades), zero matches at the
    # TRUE pose, and the solve diverged. The fill is strictly ADDITIVE map
    # content (replacing the picks wholesale reshuffled the tuned matching
    # dynamics and regressed other worlds — measured r5). fill=0 disables.
    frame_planar_fill: int = 0
    frame_planar_voxel: float = 0.6

    @property
    def frame_planar_total(self) -> int:
        return self.frame_planar_cap + self.frame_planar_fill
    # compaction capacity for the object (non-ground) cloud right after
    # ground removal; 0 disables. DCVC, edge extraction, PCA and the feature
    # picks all inherit this capacity, halving every per-point scatter /
    # gather row count (only ~35-50% of raw capacity survives ground
    # removal). Overflow drops the valid tail. 49152 = ~1.6x headroom over
    # the measured 23-30k surviving objects on 64-ring town/urban scans
    # (measured r4; the cut is worth ~5 ms/frame across DCVC/edge/PCA).
    # r5 probed 40960: town frames exceed it (pose diffs appear), so the
    # extra 17% is NOT free — keep 49152.
    general_cap: int = 49152
    # dense edge-pick ring width (see models/edge.extract_edges): 2304 lanes
    # covers HDL-64's ~2200 max returns per ring at ~55% of the 4096 cost
    edge_ring_width: int = 2304
    # DCVC connected-components rounds (models/dcvc.dcvc_segment cc_iters):
    # hooking + pointer jumping converge O(log V); 8 is the conservative
    # ceiling, 6 suffices on urban scans (measured r4 A/B: identical
    # cluster counts on bench frames, ~1.9 ms/frame saved)
    dcvc_cc_iters: int = 6


class ScanFeatures(NamedTuple):
    """Everything one frame contributes downstream."""

    scan: FeatureSet  # solver inputs (downsampled / scan-class)
    planar_frame: Cloud  # submap-class planar features (sensor frame)
    sphere_frame: Cloud  # submap-class sphere features (sensor frame)
    edge_raw: Cloud  # full edge cloud (first-frame submap seed)
    ground_ds: Cloud  # ground at 0.3 voxels (submap accumulation input)
    edge_ds: Cloud  # edge at 0.1 voxels
    num_clusters: jax.Array
    # per-cluster AABBs in the sensor frame (the reference publishes these as
    # jsk BoundingBoxes, segmentation.cpp:1032-1078): (K,3), (K,3), (K,)
    box_min: jax.Array
    box_max: jax.Array
    box_valid: jax.Array


class SubmapState(NamedTuple):
    planar_frames: Cloud  # (Wp, cap) ring buffer, sensor frame
    sphere_frames: Cloud  # (Ws, cap)
    frame_poses: jax.Array  # (Wp,4,4) planar-window poses
    sphere_poses: jax.Array  # (Ws,4,4)
    frames_filled: jax.Array  # () int32
    edge_map: Cloud  # world frame, fixed capacity
    ground_map: Cloud  # world frame


class OdometryState(NamedTuple):
    submap: SubmapState
    pose: jax.Array  # (4,4) latest world_T_scan
    last_pose: jax.Array
    predict: jax.Array
    frame_idx: jax.Array  # () int32
    global_map: Cloud  # 1.0 m global map (capacity 1 when mapping_flag off)
    # consecutive degenerate/misaligned frames (submap health gate — see
    # OdometryConfig.submap_health_gate)
    unhealthy_streak: jax.Array = None  # () int32
    # consecutive frames whose solve was not VALIDATED (degenerate,
    # misaligned, or never-aligned) — drives the never-aligned push veto
    # (OdometryConfig.gate_never_aligned)
    nev_streak: jax.Array = None  # () int32
    # consecutive step-clamped frames (OdometryConfig.max_step_accel)
    imp_streak: jax.Array = None  # () int32


# ---------------------------------------------------------------------------
# Per-frame preprocessing (Segmentation + featureExtract + processCloud)
# ---------------------------------------------------------------------------


def preprocess_frame(raw: Cloud, cfg: PipelineConfig) -> ScanFeatures:
    od = cfg.odometry
    cloud = raw.remove_nonfinite().remove_close(cfg.sensor.near_dis)

    seg = segmentation.ground_remove(cloud, cfg.sensor, cfg.ground)
    objects, obj_ring = seg.objects, seg.ring
    # Compact the object cloud (plus its aligned ring ids) ONCE, right after
    # ground removal: only ~35-50% of raw capacity survives, and every
    # downstream per-point scatter/gather in DCVC, edge extraction, PCA and
    # the feature picks pays per ROW (~1 ms per 131k rows on TPU). The
    # compaction is stable, so scan order — which the reference's feature
    # caps and ring sequences depend on — is preserved.
    if cfg.general_cap and cfg.general_cap < objects.capacity:
        # stable payload-sort compaction (voxel.sort_with_payload): ONE
        # lax.sort carries all channels; the previous argsort + (N,6) take
        # paid ~1 ms of per-row gather at 131k rows (r5 HLO profile)
        key = (~objects.valid).astype(jnp.int32)
        _, sx, sy, sz, si, sv, sr = voxel.sort_with_payload(
            key, objects.xyz[:, 0], objects.xyz[:, 1], objects.xyz[:, 2],
            objects.intensity, objects.valid.astype(jnp.int32), obj_ring,
        )
        cap = cfg.general_cap
        objects = Cloud(
            xyz=jnp.stack([sx[:cap], sy[:cap], sz[:cap]], axis=1),
            intensity=si[:cap],
            valid=sv[:cap] > 0,
        )
        obj_ring = sr[:cap]

    clusters = dcvc.dcvc_segment(
        objects, cfg.dcvc, cfg.sensor, cfg.max_voxels, cfg.max_clusters,
        cc_iters=cfg.dcvc_cc_iters,
    )
    n = objects.capacity
    order_key = clusters.labels.astype(jnp.int32) * n + jnp.arange(n, dtype=jnp.int32)
    edges = edge_mod.extract_edges(
        clusters.segmented,
        obj_ring,
        order_key,
        sensor_model=cfg.sensor.sensor_model,
        ring_min_num=cfg.ground.ring_min_num,
        ring_width=cfg.edge_ring_width,
    )
    edge_cloud = clusters.segmented.mask(edges.edge_mask)
    general_cloud = clusters.segmented.mask(edges.general_mask)

    sel = features.extract_planar_sphere(
        general_cloud, cfg.feature, sphere_index_bug=cfg.sphere_index_bug
    )

    # solver scan features (processCloud, front_end.cpp:181-199)
    g_xyz, g_int, g_val = voxel.voxel_downsample(
        seg.ground.xyz, seg.ground.intensity, seg.ground.valid,
        od.ground_down_sample, od.scan_ground_cap,
    )
    e_xyz, e_int, e_val = voxel.voxel_downsample(
        edge_cloud.xyz, edge_cloud.intensity, edge_cloud.valid,
        od.edge_down_sample, od.scan_edge_cap,
    )
    flat = sel.pca.flatness
    S = cfg.pick_sectors
    scan = FeatureSet(
        edge=Cloud(e_xyz, e_int, e_val),
        sphere=features.gather_top(
            general_cloud, sel.sphere_scan, flat, od.scan_sphere_cap, sectors=S
        ),
        planar=features.gather_top(
            general_cloud, sel.planar_scan, flat, od.scan_planar_cap, sectors=S
        ),
        ground=Cloud(g_xyz, g_int, g_val),
    )
    planar_frame = features.gather_top(
        general_cloud, sel.planar_submap, flat, cfg.frame_planar_cap, sectors=S
    )
    if cfg.frame_planar_fill:
        # additive coverage fill (see PipelineConfig.frame_planar_fill):
        # flattest original point per frame_planar_voxel cell; duplicates
        # with the picks are harmless (they re-weight cells slightly)
        pf_mask = sel.planar_submap & general_cloud.valid
        fx, fi, fv = voxel.voxel_select_top(
            general_cloud.xyz, general_cloud.intensity, pf_mask, flat,
            cfg.frame_planar_voxel, cfg.frame_planar_fill,
        )
        planar_frame = planar_frame.concat(Cloud(fx, fi, fv))
    sphere_frame = features.gather_top(
        general_cloud, sel.sphere_submap, flat, cfg.frame_sphere_cap, sectors=S
    )
    return ScanFeatures(
        scan=scan,
        planar_frame=planar_frame,
        sphere_frame=sphere_frame,
        edge_raw=edge_cloud,
        ground_ds=Cloud(g_xyz, g_int, g_val),
        edge_ds=Cloud(e_xyz, e_int, e_val),
        num_clusters=clusters.num_clusters,
        box_min=clusters.box_min,
        box_max=clusters.box_max,
        box_valid=clusters.box_valid,
    )


# ---------------------------------------------------------------------------
# Submap management (updateSubmap, front_end.cpp:201-275)
# ---------------------------------------------------------------------------


def empty_submap(cfg: PipelineConfig, dtype=jnp.float32) -> SubmapState:
    od = cfg.odometry
    Wp, Ws = od.planar_frame_size, od.sphere_frame_size
    return SubmapState(
        planar_frames=Cloud.empty(cfg.frame_planar_total, dtype, batch=(Wp,)),
        sphere_frames=Cloud.empty(cfg.frame_sphere_cap, dtype, batch=(Ws,)),
        frame_poses=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (Wp, 4, 4)),
        sphere_poses=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (Ws, 4, 4)),
        frames_filled=jnp.asarray(0, jnp.int32),
        edge_map=Cloud.empty(od.submap_edge_cap, dtype),
        ground_map=Cloud.empty(od.submap_ground_cap, dtype),
    )


def _flatten_window(frames: Cloud, poses: jax.Array) -> Cloud:
    """Transform each window frame into the map frame and flatten (W,cap) ->
    (W*cap,)."""
    world = frames.transform(poses)
    return Cloud(
        xyz=world.xyz.reshape(-1, 3),
        intensity=world.intensity.reshape(-1),
        valid=world.valid.reshape(-1),
    )


def submap_features(state: SubmapState, cfg: PipelineConfig) -> FeatureSet:
    planar = _flatten_window(state.planar_frames, state.frame_poses)
    if cfg.sphere_submap_from_planar:
        sphere = planar  # reference quirk: both submaps from the planar deque
    else:
        sphere = _flatten_window(state.sphere_frames, state.sphere_poses)
    return FeatureSet(
        edge=state.edge_map,
        sphere=sphere,
        planar=planar,
        ground=state.ground_map,
    )


def update_submap(
    state: SubmapState, feats: ScanFeatures, pose: jax.Array, cfg: PipelineConfig
) -> SubmapState:
    od = cfg.odometry
    slot = state.frames_filled % od.planar_frame_size
    slot_s = state.frames_filled % od.sphere_frame_size

    def push(frames: Cloud, new: Cloud, at) -> Cloud:
        return jax.tree.map(
            lambda buf, x: jax.lax.dynamic_update_index_in_dim(buf, x, at, 0),
            frames,
            new,
        )

    planar_frames = push(state.planar_frames, feats.planar_frame, slot)
    sphere_frames = push(state.sphere_frames, feats.sphere_frame, slot_s)
    frame_poses = jax.lax.dynamic_update_index_in_dim(
        state.frame_poses, pose.astype(state.frame_poses.dtype), slot, 0
    )
    sphere_poses = jax.lax.dynamic_update_index_in_dim(
        state.sphere_poses, pose.astype(state.sphere_poses.dtype), slot_s, 0
    )

    # edge/ground: accumulate -> crop ±L around current position -> downsample
    pos = pose[:3, 3]

    def accumulate(map_cloud: Cloud, add: Cloud, crop_l: float, vs: float, cap: int):
        merged = map_cloud.concat(add.transform(pose))
        merged = merged.crop_aabb(pos - crop_l, pos + crop_l)
        xyz, inten, valid = voxel.voxel_downsample(
            merged.xyz, merged.intensity, merged.valid, vs, cap
        )
        return Cloud(xyz, inten, valid)

    edge_map = accumulate(
        state.edge_map, feats.edge_ds, od.edge_crop_box_length,
        od.edge_down_sample_submap, od.submap_edge_cap,
    )
    ground_map = accumulate(
        state.ground_map, feats.ground_ds, od.ground_crop_box_length,
        od.ground_down_sample_submap, od.submap_ground_cap,
    )
    return SubmapState(
        planar_frames=planar_frames,
        sphere_frames=sphere_frames,
        frame_poses=frame_poses,
        sphere_poses=sphere_poses,
        frames_filled=state.frames_filled + 1,
        edge_map=edge_map,
        ground_map=ground_map,
    )


def seed_submap(
    state: SubmapState, feats: ScanFeatures, cfg: PipelineConfig
) -> SubmapState:
    """First-frame initialisation (front_end.cpp:285-305): raw edge cloud,
    0.3-voxel ground, submap-class planar/sphere at identity pose."""
    od = cfg.odometry
    edge_xyz, edge_int, edge_val = voxel.voxel_downsample(
        feats.edge_raw.xyz, feats.edge_raw.intensity, feats.edge_raw.valid,
        1e-4, od.submap_edge_cap,  # effectively no downsample, just re-bucket
    )
    g = feats.ground_ds
    gx, gi, gv = voxel.voxel_downsample(
        g.xyz, g.intensity, g.valid, od.ground_down_sample, od.submap_ground_cap
    )
    state = update_submap_window_only(state, feats, jnp.eye(4, dtype=gx.dtype), cfg)
    return state._replace(
        edge_map=Cloud(edge_xyz, edge_int, edge_val),
        ground_map=Cloud(gx, gi, gv),
    )


def update_submap_window_only(
    state: SubmapState, feats: ScanFeatures, pose: jax.Array, cfg: PipelineConfig
) -> SubmapState:
    od = cfg.odometry
    slot = state.frames_filled % od.planar_frame_size
    slot_s = state.frames_filled % od.sphere_frame_size
    push = lambda frames, new, at: jax.tree.map(
        lambda buf, x: jax.lax.dynamic_update_index_in_dim(buf, x, at, 0),
        frames,
        new,
    )
    return state._replace(
        planar_frames=push(state.planar_frames, feats.planar_frame, slot),
        sphere_frames=push(state.sphere_frames, feats.sphere_frame, slot_s),
        frame_poses=jax.lax.dynamic_update_index_in_dim(
            state.frame_poses, pose.astype(state.frame_poses.dtype), slot, 0
        ),
        sphere_poses=jax.lax.dynamic_update_index_in_dim(
            state.sphere_poses, pose.astype(state.sphere_poses.dtype), slot_s, 0
        ),
        frames_filled=state.frames_filled + 1,
    )


# ---------------------------------------------------------------------------
# The per-frame odometry step (updateLidarOdometry, front_end.cpp:278-337)
# ---------------------------------------------------------------------------


def init_state(cfg: PipelineConfig, dtype=jnp.float32) -> OdometryState:
    # NB: three DISTINCT identity buffers — sharing one array across leaves
    # would make donate_argnums donate the same buffer multiple times
    # (Execute() rejects that with "donate the same buffer twice")
    map_cap = cfg.odometry.global_map_cap if cfg.odometry.mapping_flag else 1
    return OdometryState(
        submap=empty_submap(cfg, dtype),
        pose=jnp.eye(4, dtype=dtype),
        last_pose=jnp.eye(4, dtype=dtype),
        predict=jnp.eye(4, dtype=dtype),
        frame_idx=jnp.asarray(0, jnp.int32),
        global_map=Cloud.empty(map_cap, dtype),
        unhealthy_streak=jnp.asarray(0, jnp.int32),
        nev_streak=jnp.asarray(0, jnp.int32),
        imp_streak=jnp.asarray(0, jnp.int32),
    )


def _accumulate_global_map(
    state_map: Cloud, raw: Cloud, pose: jax.Array, cfg: PipelineConfig
) -> Cloud:
    """Optional 1.0 m global map accumulation (front_end.cpp:269-274)."""
    od = cfg.odometry
    world = raw.transform(pose)
    nx, ni, nv = voxel.voxel_downsample(
        world.xyz, world.intensity, world.valid, od.global_map_voxel,
        od.global_map_cap // 8,
    )
    merged = state_map.concat(Cloud(nx, ni, nv))
    mx, mi, mv = voxel.voxel_downsample(
        merged.xyz, merged.intensity, merged.valid, od.global_map_voxel,
        od.global_map_cap,
    )
    return Cloud(mx, mi, mv)


def _odometry_step_impl(
    state: OdometryState, raw: Cloud, cfg: PipelineConfig
) -> tuple[OdometryState, jax.Array, Diagnostics]:
    """Process one scan; returns (state', world_T_scan pose, diagnostics)."""
    feats = preprocess_frame(raw, cfg)

    def first_frame(st: OdometryState):
        submap = seed_submap(st.submap, feats, cfg)
        mi = cfg.odometry.tls.max_iterations
        diag = Diagnostics(
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0.0, raw.xyz.dtype),
            jnp.zeros(4, raw.xyz.dtype),
            jnp.zeros(4, jnp.int32),
            jnp.asarray(False),
            misaligned=jnp.asarray(False),
            never_aligned=jnp.asarray(False),
            corr_trace=jnp.zeros((mi, 4), jnp.int32),
            cost_trace=jnp.zeros(mi, raw.xyz.dtype),
            coarse_trace=jnp.zeros(mi, bool),
            aligned_trace=jnp.zeros(mi, bool),
        )
        gmap = (
            _accumulate_global_map(st.global_map, raw, st.pose, cfg)
            if cfg.odometry.mapping_flag
            else st.global_map
        )
        return (
            st._replace(submap=submap, frame_idx=st.frame_idx + 1, global_map=gmap),
            st.pose,
            diag,
        )

    def normal_frame(st: OdometryState):
        submap = submap_features(st.submap, cfg)
        # fallback veto: at frame 1 the motion model is identity with zero
        # velocity (nothing to dead-reckon from), and after 3 consecutive
        # fallbacks the prediction has drifted enough that a genuine
        # re-localization solve would look "implausible" against it — both
        # cases must trust the solver.
        allow_fb = (st.frame_idx > 1) & (st.unhealthy_streak < 3)
        pose, diag = scan_matching(
            feats.scan, submap, st.predict, cfg.odometry.tls,
            allow_fallback=allow_fb,
        )
        unhealthy = diag.degenerate | (
            diag.misaligned if diag.misaligned is not None else jnp.asarray(False)
        )
        nev = (
            diag.never_aligned
            if diag.never_aligned is not None
            else jnp.asarray(False)
        )
        # physical step clamp (OdometryConfig.max_step_accel): see config.py
        if cfg.odometry.max_step_accel:
            pred_speed = jnp.linalg.norm(
                (se3.inv(st.pose) @ st.predict)[:3, 3]
            )
            step_t = jnp.linalg.norm((se3.inv(st.last_pose) @ pose)[:3, 3])
            cap = pred_speed + cfg.odometry.max_step_accel * (
                1.0 + st.imp_streak.astype(pred_speed.dtype)
            )
            # startup exemption (same epistemics as allow_fb): at frame 1
            # the motion model has zero velocity — the first real step
            # always "exceeds" it, and clamping it dead-reckons from
            # identity (measured: 1.6 m of drift by frame 10 on the canary)
            implausible = (step_t > cap) & (st.frame_idx > 1)
            pose = jnp.where(implausible, st.predict.astype(pose.dtype), pose)
            unhealthy = unhealthy | implausible
            imp_streak = jnp.where(implausible, st.imp_streak + 1, 0)
        else:
            imp_streak = st.imp_streak
        # constant-velocity prediction (front_end.cpp:329-332). On unhealthy
        # frames the solved pose IS the prediction, so the same step would
        # re-apply verbatim — decay its rotation (see
        # OdometryConfig.fallback_rot_decay).
        step = se3.inv(st.last_pose) @ pose
        if cfg.odometry.fallback_rot_decay != 1.0:
            xi_step = se3.log(step)
            rot_scale = jnp.where(
                unhealthy, cfg.odometry.fallback_rot_decay, 1.0
            ).astype(xi_step.dtype)
            step = se3.exp(xi_step.at[3:].multiply(rot_scale))
        predict = pose @ step
        new_submap = update_submap(st.submap, feats, pose, cfg)
        # submap health gate (OdometryConfig.submap_health_gate): a frame
        # whose solve was degenerate or misaligned carries a motion-model
        # guess, not a measured pose — pushing its features would poison
        # every map. Skip the push, UNLESS this is the submap_gate_streak-th
        # consecutive unhealthy frame: then the world view genuinely changed
        # (occlusion flip) and re-mapping from the new view is the only
        # recovery.
        # streak advances unconditionally: the allow_fb "(streak < 3)" escape
        # above must fire even with the submap gate disabled (else misaligned
        # fallback / rotation damping can persist indefinitely in that config)
        streak = jnp.where(unhealthy, st.unhealthy_streak + 1, 0)
        # never-aligned push veto (OdometryConfig.gate_never_aligned): a
        # never-aligned-but-trusted solve may carry an undetected basin
        # error; its features must not extend the map while re-validation is
        # still plausible. The veto covers only the FIRST submap_gate_streak
        # consecutive unvalidated frames: on worlds where the alignment gate
        # is chronically unattainable (low structural match fraction —
        # route-a world 407 never passes it while tracking at 0.07 m drift),
        # a permanent veto would freeze the map, and treating such frames as
        # unhealthy (rot decay + fallback veto) dead-reckoned through whole
        # turns (measured r5: 20 deg of heading lost). nev frames therefore
        # do NOT touch rotation damping or the fallback streak.
        nev_streak = jnp.where(nev | unhealthy, st.nev_streak + 1, 0)
        if cfg.odometry.submap_health_gate:
            push = (~unhealthy) | (streak >= cfg.odometry.submap_gate_streak)
            if cfg.odometry.gate_never_aligned:
                push = push & ~(
                    nev & (nev_streak <= cfg.odometry.submap_gate_streak)
                )
            new_submap = jax.tree.map(
                lambda new, old: jnp.where(push, new, old),
                new_submap,
                st.submap,
            )
        gmap = (
            _accumulate_global_map(st.global_map, raw, pose, cfg)
            if cfg.odometry.mapping_flag
            else st.global_map
        )
        return (
            OdometryState(
                submap=new_submap,
                pose=pose,
                last_pose=pose,
                predict=predict,
                frame_idx=st.frame_idx + 1,
                global_map=gmap,
                unhealthy_streak=streak,
                nev_streak=nev_streak,
                imp_streak=imp_streak,
            ),
            pose,
            diag,
        )

    state, pose, diag = jax.lax.cond(
        state.frame_idx == 0, first_frame, normal_frame, state
    )
    diag = diag._replace(
        box_min=feats.box_min,
        box_max=feats.box_max,
        box_valid=feats.box_valid,
        num_clusters=feats.num_clusters,
    )
    return state, pose, diag


# The hot-loop entry DONATES the state pytree and the raw scan: their buffers
# are reused for the outputs (the submap ring buffers and global map dominate
# HBM traffic — without donation every frame round-trips them through fresh
# allocations). Callers must rebind `state` to the returned value and must
# not reuse `raw` after the call. `odometry_step_nodonate` keeps the
# re-invokable semantics for compile checks and ad-hoc experiments.
#
# The axon relay plugin (remote-tunneled TPU used in CI) rejects executables
# with input-output aliasing (runtime InvalidArgument), so donation is gated
# on the backend — decided lazily at first call so importing this module
# never initializes a JAX backend.
_odometry_step_jitted = None


def odometry_step(state, raw, cfg):
    global _odometry_step_jitted
    if _odometry_step_jitted is None:
        donate = (0, 1) if jax.default_backend() != "axon" else ()
        _odometry_step_jitted = jax.jit(
            _odometry_step_impl, static_argnums=2, donate_argnums=donate
        )
    return _odometry_step_jitted(state, raw, cfg)


odometry_step_nodonate = jax.jit(_odometry_step_impl, static_argnums=2)


# Packed-transfer hot path (Cloud.pack_scan / from_packed): the raw scan
# crosses the relay as ONE (cap,4) int16 array + a scalar count — 8 bytes
# per point instead of 17 — and dequantizes on device inside the step.
def _odometry_step_packed_impl(state, q_scan, n_valid, cfg):
    return _odometry_step_impl(
        state, Cloud.from_packed(q_scan, n_valid), cfg
    )


_odometry_step_packed_jitted = None


def odometry_step_packed(state, q_scan, n_valid, cfg):
    global _odometry_step_packed_jitted
    if _odometry_step_packed_jitted is None:
        donate = (0,) if jax.default_backend() != "axon" else ()
        _odometry_step_packed_jitted = jax.jit(
            _odometry_step_packed_impl, static_argnums=3, donate_argnums=donate
        )
    return _odometry_step_packed_jitted(state, q_scan, n_valid, cfg)


def run_sequence(
    scans, cfg: PipelineConfig, dtype=jnp.float32, raw_cap: int | None = None
):
    """Host driver: iterate (index, (xyz, intensity)) pairs through the
    jitted step. Returns (poses (M,4,4) np.ndarray, diagnostics list)."""
    cap = raw_cap or cfg.odometry.scan_ground_cap * 16
    state = init_state(cfg, dtype)
    poses, diags = [], []
    for _, (xyz, inten) in scans:
        raw = Cloud.from_numpy(xyz, inten, capacity=cap, dtype=dtype)
        state, pose, diag = odometry_step(state, raw, cfg)
        poses.append(np.asarray(pose))
        diags.append(jax.tree.map(np.asarray, diag))
    return np.stack(poses), diags
