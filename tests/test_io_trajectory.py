"""KITTI I/O (incl. native loader parity) + trajectory metrics tests."""
import subprocess
from pathlib import Path

import numpy as np
import pytest

from tloam_tpu.io import kitti
from tloam_tpu.utils import trajectory


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """Synthesize a miniature KITTI sequence tree."""
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("kitti")
    seq = root / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)
    scans = []
    for i in range(3):
        pts = rng.normal(size=(500, 4)).astype(np.float32)
        pts[5, 0] = np.nan  # one bad point to filter
        pts.tofile(seq / "velodyne" / f"{i:06d}.bin")
        scans.append(pts)
    Tr = np.eye(4)
    Tr[:3, 3] = [0.1, -0.05, -0.2]
    with open(seq / "calib.txt", "w") as f:
        for name in ["P0", "P1", "P2", "P3"]:
            f.write(f"{name}: " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in Tr[:3, :4].ravel()) + "\n")
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[1, 0, 3] = 1.0
    poses[2, 0, 3] = 2.0
    rows = poses[:, :3, :4].reshape(3, 12)
    np.savetxt(seq / "00.txt", rows)
    return root, scans, Tr, poses


def test_read_velodyne_numpy_and_native(kitti_tree):
    root, scans, _, _ = kitti_tree
    path = root / "sequences" / "00" / "velodyne" / "000000.bin"
    xyz, inten = kitti.read_velodyne(path)
    finite = np.all(np.isfinite(scans[0]), axis=1)
    want = scans[0][finite]
    assert xyz.shape == (finite.sum(), 3)
    assert np.allclose(xyz, want[:, :3])
    assert np.allclose(inten, want[:, 3])

    # native path parity (if built)
    so = Path(__file__).resolve().parents[1] / "native" / "libkitti_loader.so"
    if so.exists():
        lib = kitti._load_native()
        assert lib, "native loader should load"
        # read again (native path is tried first when lib present)
        xyz2, inten2 = kitti.read_velodyne(path)
        assert np.allclose(xyz2, xyz) and np.allclose(inten2, inten)


def test_sequence_open_and_gt(kitti_tree):
    root, _, Tr, cam_poses = kitti_tree
    seq = kitti.KittiSequence.open(root, "00")
    assert len(seq) == 3
    assert np.allclose(seq.calib, Tr)
    gt = seq.gt_velo()
    # T_map_velo = Tr^-1 T0 T_t Tr (kitti_reader.cpp:93-97); T0 = I here
    want = np.linalg.inv(Tr) @ cam_poses[2] @ Tr
    assert np.allclose(gt[2], want)


def test_prefetch_iterates_in_order(kitti_tree):
    root, _, _, _ = kitti_tree
    seq = kitti.KittiSequence.open(root, "00")
    seen = [i for i, _ in seq.prefetch()]
    assert seen == [0, 1, 2]


def test_kitti_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    from tloam_tpu.ops import se3
    import jax.numpy as jnp

    poses = np.asarray(se3.exp(jnp.asarray(rng.normal(size=(5, 6)) * 0.1)))
    trajectory.save_kitti(tmp_path / "p.txt", poses)
    back = trajectory.load_kitti(tmp_path / "p.txt")
    assert np.allclose(back, poses, atol=1e-15)


def test_metrics_zero_for_identical():
    t = np.linspace(0, 300, 400)
    poses = np.tile(np.eye(4), (400, 1, 1))
    poses[:, 0, 3] = t
    t_err, r_err = trajectory.kitti_odometry_errors(poses, poses)
    assert t_err == pytest.approx(0.0)
    assert r_err == pytest.approx(0.0)
    assert trajectory.ate_rmse(poses, poses) == pytest.approx(0.0)
    assert trajectory.rpe(poses, poses)[0] == pytest.approx(0.0)


def test_metrics_detect_drift():
    n = 400
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 300, n)
    est = poses.copy()
    est[:, 0, 3] *= 1.02  # 2% scale drift
    t_err, _ = trajectory.kitti_odometry_errors(poses, est)
    assert t_err == pytest.approx(2.0, rel=0.1)
    # reference golden file sanity: doc/tloam_00.txt parses as 4541 poses
    ref = Path("/root/reference/doc/tloam_00.txt")
    if ref.exists():
        golden = trajectory.load_kitti(ref)
        assert golden.shape == (4541, 4, 4)
        # path length of KITTI-00 is ~3.7 km
        L = trajectory.trajectory_distances(golden)[-1]
        assert 3000 < L < 4500
