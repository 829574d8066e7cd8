"""Tests for ring estimation, ground segmentation, DCVC clustering, edge
extraction, and PCA feature extraction on synthetic scans."""
import jax
import jax.numpy as jnp
import numpy as np

from tloam_tpu.cloud import Cloud
from tloam_tpu.config import DCVCConfig, FeatureConfig, GroundSegConfig, SensorConfig
from tloam_tpu.models import dcvc, edge, features, segmentation

SENSOR = SensorConfig()
GSEG = GroundSegConfig()


def synthetic_scan(rng, rings=16, pts_per_ring=720, with_objects=True):
    """Azimuth-ordered multi-ring scan over a ground plane (z=0, sensor at
    height 1.73) with optional box obstacles."""
    pts = []
    ring_ids = []
    h = SENSOR.sensor_height
    for r_id in range(rings):
        # ring radius: lower beams hit closer ground
        radius = 4.0 + r_id * 1.5
        az = np.linspace(0, 2 * np.pi, pts_per_ring, endpoint=False)
        x = radius * np.cos(az)
        y = radius * np.sin(az)
        z = np.full_like(x, -h) + rng.normal(size=x.shape) * 0.01
        p = np.stack([x, y, z], -1)
        if with_objects:
            # a box at (8, 0): points with |x-8|<1, |y|<1 get lifted
            in_box = (np.abs(x - 8) < 1.0) & (np.abs(y) < 1.0)
            p[in_box, 2] = rng.uniform(-h + 0.2, -h + 1.8, size=in_box.sum())
        pts.append(p)
        ring_ids.append(np.full(pts_per_ring, r_id))
    xyz = np.concatenate(pts)
    return xyz, np.concatenate(ring_ids)


def test_estimate_rings(rng):
    xyz, ring_true = synthetic_scan(rng, rings=8, with_objects=False)
    cloud = Cloud.from_numpy(xyz, capacity=len(xyz) + 64)
    ring, mean_h = segmentation.estimate_rings(
        cloud.xyz, cloud.valid, SENSOR.sensor_model
    )
    got = np.asarray(ring)[: len(xyz)]
    assert np.array_equal(got, ring_true)
    assert abs(float(mean_h) - xyz[:, 2].mean()) < 0.05


def test_estimate_rings_with_invalid_gaps(rng):
    xyz, ring_true = synthetic_scan(rng, rings=4, with_objects=False)
    cloud = Cloud.from_numpy(xyz, capacity=len(xyz))
    # punch holes: mask out every 7th point; ring ids of the REMAINING points
    # must be unchanged (invalid slots are transparent to wrap detection)
    keep = np.arange(len(xyz)) % 7 != 0
    cloud = cloud.mask(jnp.asarray(keep))
    ring, _ = segmentation.estimate_rings(cloud.xyz, cloud.valid, 64)
    got = np.asarray(ring)[keep]
    assert np.array_equal(got, ring_true[keep])


def test_ground_remove(rng):
    xyz, _ = synthetic_scan(rng, rings=16)
    cloud = Cloud.from_numpy(xyz, capacity=len(xyz))
    res = jax.jit(
        lambda c: segmentation.ground_remove(c, SENSOR, GSEG)
    )(cloud)
    g = np.asarray(res.ground.valid)
    o = np.asarray(res.objects.valid)
    # ground points are the z ~ -h ring points; object points are box hits
    z = xyz[:, 2]
    is_ground_true = z < -SENSOR.sensor_height + 0.15
    # most true-ground points classified ground
    recall = (g & is_ground_true).sum() / max(is_ground_true.sum(), 1)
    assert recall > 0.85, recall
    # no box point (z > -h + 0.2) classified ground
    # the algorithm's own ground gate is plane distance < 0.3 m, so only
    # points clearly above that band count as "must not be ground"
    hi = z > -SENSOR.sensor_height + 0.35
    assert (g & hi).sum() <= 0.02 * max(hi.sum(), 1)
    # object cloud contains the box points
    assert (o & hi).sum() / max(hi.sum(), 1) > 0.9
    # disjoint
    assert not np.any(g & o)


def test_weighted_axis_plane_matches_reference_formula(rng):
    # plane z = 0.1x - 0.2y + 3
    n_true = np.array([-0.1, 0.2, 1.0])
    n_true /= np.linalg.norm(n_true)
    pts = rng.normal(size=(200, 3)) * 5
    pts[:, 2] = (0.1 * pts[:, 0] - 0.2 * pts[:, 1] + 3) + rng.normal(size=200) * 1e-3
    feats = np.concatenate(
        [
            pts,
            (pts[:, 0] * pts[:, 0])[:, None],
            (pts[:, 0] * pts[:, 1])[:, None],
            (pts[:, 0] * pts[:, 2])[:, None],
            (pts[:, 1] * pts[:, 1])[:, None],
            (pts[:, 1] * pts[:, 2])[:, None],
            (pts[:, 2] * pts[:, 2])[:, None],
            np.ones((200, 1)),
        ],
        axis=1,
    ).sum(0)
    plane = np.asarray(segmentation.weighted_axis_plane(jnp.asarray(feats)))
    sgn = np.sign(plane[:3] @ n_true)
    assert np.allclose(sgn * plane[:3], n_true, atol=1e-3)


def test_dcvc_two_clusters(rng):
    # two well-separated blobs + sparse noise
    a = rng.normal(size=(300, 3)) * 0.3 + np.array([5.0, 0, 0])
    b = rng.normal(size=(300, 3)) * 0.3 + np.array([0.0, 7.0, 1.0])
    noise = rng.uniform(-20, 20, size=(40, 3))
    noise[:, 2] = np.abs(noise[:, 2])
    xyz = np.concatenate([a, b, noise])
    cloud = Cloud.from_numpy(xyz, capacity=1024)
    res = jax.jit(
        lambda c: dcvc.dcvc_segment(c, DCVCConfig(), SENSOR, max_voxels=4096)
    )(cloud)
    labels = np.asarray(res.labels)
    assert int(res.num_clusters) == 2
    la = labels[:300]
    lb = labels[300:600]
    # each blob gets one consistent nonzero label, and they differ
    assert len(set(la[la > 0])) == 1
    assert len(set(lb[lb > 0])) == 1
    assert la.max() != lb.max()
    assert (la > 0).mean() > 0.95 and (lb > 0).mean() > 0.95
    # noise dropped (clusters < min_seg)
    assert (labels[600:] == 0).mean() > 0.9
    # AABBs cover the blobs
    bm = np.asarray(res.box_min)[np.asarray(res.box_valid)]
    bM = np.asarray(res.box_max)[np.asarray(res.box_valid)]
    assert bm.shape[0] == 2
    assert np.all(bM - bm < 3.0)


def test_edge_extraction_picks_corners(rng):
    # one ring: smooth circle with four sharp corner spikes
    m = 720
    az = np.linspace(0, 2 * np.pi, m, endpoint=False)
    radius = np.full(m, 10.0)
    corner_pos = [90, 270, 450, 630]
    for cp in corner_pos:
        radius[cp] = 8.0  # sharp range discontinuity = high curvature
    xyz = np.stack(
        [radius * np.cos(az), radius * np.sin(az), np.zeros(m)], -1
    )
    cloud = Cloud.from_numpy(xyz, capacity=1024)
    ring = jnp.zeros(1024, jnp.int32)
    order_key = jnp.arange(1024)
    res = jax.jit(
        lambda c, r, o: edge.extract_edges(c, r, o, ring_min_num=131)
    )(cloud, ring, order_key)
    em = np.asarray(res.edge_mask)
    assert np.all(em[corner_pos]), "corner spikes must be picked as edges"
    # suppression: immediate neighbors of a pick with small gaps not picked
    # (neighbors of the spike have a big gap, so just sanity-check counts)
    assert em.sum() <= 6 * 20
    gm = np.asarray(res.general_mask)
    assert not np.any(em & gm)


def test_pca_features_planar_vs_sphere(rng):
    # dense vertical wall (planar, normal horizontal) + isolated tight blobs
    # isotropic ~0.08 m spacing: flatness=(lam1-lam0)/lam2 needs lam1~lam2,
    # i.e. roughly uniform in-plane sampling, to clear the 0.65 gate
    wy, wz = np.meshgrid(np.linspace(-3, 3, 75), np.linspace(0, 2, 26))
    wall = np.stack([np.zeros(wy.size), wy.ravel(), wz.ravel()], -1)
    wall += rng.normal(size=wall.shape) * 0.002
    blobs = []
    for i in range(6):
        c = np.array([3.0 + i, 0.0, 1.0])
        blobs.append(c + rng.normal(size=(25, 3)) * 0.05)
    blob_pts = np.concatenate(blobs)
    xyz = np.concatenate([wall, blob_pts])
    cloud = Cloud.from_numpy(xyz, capacity=4096)
    cfg = FeatureConfig()
    sel = jax.jit(
        lambda c: features.extract_planar_sphere(c, cfg)
    )(cloud)
    pm = np.asarray(sel.planar_submap)
    sm = np.asarray(sel.sphere_submap)
    nw = wall.shape[0]
    # wall points dominantly planar
    assert pm[:nw].mean() > 0.6
    assert sm[:nw].mean() < 0.05
    # blob points: some classified sphere, none planar
    assert pm[nw:].sum() == 0
    assert sm[nw:].sum() >= 3
    # scan masks are subsets of submap masks
    assert np.all(~np.asarray(sel.planar_scan) | pm)
    assert np.all(~np.asarray(sel.sphere_scan) | sm)


def test_gather_top(rng):
    xyz = rng.normal(size=(100, 3))
    cloud = Cloud.from_numpy(xyz, capacity=128)
    score = jnp.asarray(np.arange(128, dtype=np.float64))
    mask = jnp.asarray(np.arange(128) % 2 == 0) & cloud.valid
    out = features.gather_top(cloud, mask, score, 16)
    assert int(out.count()) == 16
    got = np.sort(np.asarray(out.xyz)[np.asarray(out.valid)][:, 0])
    want = np.sort(xyz[np.arange(100) % 2 == 0][-16:][:, 0])
    assert np.allclose(got, want)


def test_dcvc_matches_numpy_union_find(rng):
    """CC exactness: the hooking/jumping rounds must produce the SAME
    partition as an exact union-find over the 26-connected curved-voxel
    graph (with the reference's symmetrized azimuth wrap), on a realistic
    multi-object scene — guards the cc_iters/dense_passes budget."""
    from tloam_tpu.config import DCVCConfig

    # several elongated structures (walls spanning many azimuth bins) +
    # compact blobs + noise, far enough apart to be distinct clusters
    pts = []
    for k in range(4):  # four long arcs at different ranges/heights
        th = np.linspace(0.3 + 1.4 * k, 1.5 + 1.4 * k, 700)
        r = 8.0 + 3.0 * k + rng.normal(size=700) * 0.05
        z = 0.4 * k + rng.normal(size=700) * 0.05
        pts.append(np.stack([r * np.cos(th), r * np.sin(th), z], -1))
    for k in range(5):  # compact blobs
        c = np.array([6.0 + 2 * k, -4.0 - 2 * k, 0.5 * k])
        pts.append(rng.normal(size=(250, 3)) * 0.25 + c)
    pts.append(rng.uniform(-25, 25, size=(60, 3)))  # sparse noise
    xyz = np.concatenate(pts)
    cloud = Cloud.from_numpy(xyz, capacity=8192)
    cfg = DCVCConfig()

    coords, ok = jax.jit(
        lambda c: dcvc.curved_voxel_coords(c, cfg, SENSOR)
    )(cloud)
    coords = np.asarray(coords)
    ok = np.asarray(ok)
    res = jax.jit(
        lambda c: dcvc.dcvc_segment(c, cfg, SENSOR, max_voxels=8192,
                                    max_clusters=64)
    )(cloud)
    labels = np.asarray(res.labels)

    # exact union-find over occupied IN-RANGE voxels (the implementation
    # clusters on a dense grid bounded by (azim, polar, pitch) caps; voxels
    # beyond the caps are dropped from clustering on both sides)
    width = int(round(360.0 / cfg.delta_a)) + 1
    A = width + 1
    occ = {}
    for i in np.flatnonzero(ok):
        a, p, h = coords[i]
        if not (0 <= a < A and 0 <= p < dcvc._POLAR_CAP and 0 <= h < dcvc._PITCH_CAP):
            continue
        occ.setdefault(tuple(coords[i]), []).append(i)
    keys = list(occ)
    parent = {k: k for k in keys}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    kset = set(keys)
    for (a, p, h) in keys:
        for da in (-1, 0, 1):
            for dp in (-1, 0, 1):
                for dh in (-1, 0, 1):
                    na = a + da
                    # reference azimuth clamp quirk, symmetrized to a wrap
                    # over the `width` real columns (see dcvc.py)
                    na = na % width
                    nb = (na, p + dp, h + dh)
                    if nb in kset:
                        union((a, p, h), nb)

    # group points by union-find root; keep clusters with > min_seg points
    groups = {}
    for k in keys:
        groups.setdefault(find(k), []).extend(occ[k])
    kept = [set(v) for v in groups.values() if len(v) > cfg.min_seg]

    # our labeling must induce exactly the same partition
    ours = {}
    for i, l in enumerate(labels):
        if l > 0:
            ours.setdefault(l, set()).add(i)
    our_sets = list(ours.values())
    assert len(our_sets) == len(kept), (len(our_sets), len(kept))
    kept_frozen = {frozenset(s) for s in kept}
    for s in our_sets:
        assert frozenset(s) in kept_frozen


def test_edge_pallas_kernel_parity(rng, monkeypatch):
    """The Pallas pick-rounds kernel (run in interpreter mode on CPU) must
    produce bit-identical edge/general masks to the XLA fallback path."""
    m = 720
    az = np.linspace(0, 2 * np.pi, m, endpoint=False)
    pts = []
    rings_arr = []
    for r_id in range(8):
        radius = np.full(m, 6.0 + r_id) + rng.normal(size=m) * 0.02
        spikes = rng.choice(m, size=12, replace=False)
        radius[spikes] -= rng.uniform(0.5, 2.0, size=12)
        pts.append(np.stack(
            [radius * np.cos(az), radius * np.sin(az), np.full(m, 0.1 * r_id)], -1
        ))
        rings_arr.append(np.full(m, r_id))
    xyz = np.concatenate(pts)
    cloud = Cloud.from_numpy(xyz, capacity=8192)
    ring = jnp.asarray(np.pad(np.concatenate(rings_arr), (0, 8192 - len(xyz))))
    okey = jnp.arange(8192)

    def run():
        f = jax.jit(lambda c, r, o: edge.extract_edges(
            c, r, o, sensor_model=8, ring_min_num=131, ring_width=1024))
        out = f(cloud, ring, okey)
        return np.asarray(out.edge_mask), np.asarray(out.general_mask)

    e_xla, g_xla = run()
    monkeypatch.setattr(edge, "_PALLAS_INTERPRET", True)
    e_pal, g_pal = run()
    assert e_xla.sum() > 20  # the scene actually produces edges
    assert np.array_equal(e_xla, e_pal)
    assert np.array_equal(g_xla, g_pal)


def test_matmul_histogram_vs_bincount():
    from tloam_tpu.models.features import matmul_histogram

    rng = np.random.default_rng(3)
    key = rng.integers(-5, 1100, size=(5000,)).astype(np.int32)
    hist = np.asarray(jax.jit(lambda k: matmul_histogram(k, 1024))(jnp.asarray(key)))
    ref = np.bincount(key[(key >= 0) & (key < 1024)], minlength=1024)
    assert np.array_equal(hist, ref)
