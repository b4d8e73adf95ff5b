"""Tests for the procedural world simulator and the e2e harness pieces."""

import os

import numpy as np
import pytest

from overlapnet_tpu.sim import (
    loop_trajectory,
    make_world,
    scan_at_pose,
    write_kitti_sequence,
)


@pytest.fixture(scope="module")
def small_world():
    rng = np.random.default_rng(0)
    return make_world(rng, extent=60.0, n_walls=15, n_cylinders=20,
                      ground_step=1.2)


def test_world_shape(small_world):
    assert small_world.ndim == 2 and small_world.shape[1] == 4
    assert small_world.shape[0] > 10_000
    # intensities are albedos in [0, 1]
    assert small_world[:, 3].min() >= 0.0 and small_world[:, 3].max() <= 1.0


def test_loop_trajectory_revisits():
    poses = loop_trajectory(32, side=50.0, laps=2.0)
    assert poses.shape == (32, 4, 4)
    # lap 2 revisits lap 1: frame 16 == frame 0 (position AND heading)
    np.testing.assert_allclose(poses[16], poses[0], atol=1e-9)
    # consecutive frames are close; opposite corners are far
    d01 = np.linalg.norm(poses[1, :2, 3] - poses[0, :2, 3])
    d08 = np.linalg.norm(poses[8, :2, 3] - poses[0, :2, 3])
    assert d01 < 15.0 < d08
    # rotations are valid (orthonormal, det +1)
    for R in poses[:, :3, :3]:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.isclose(np.linalg.det(R), 1.0)


def test_scan_at_pose_range_gated(small_world):
    rng = np.random.default_rng(1)
    pose = loop_trajectory(8, side=40.0)[0]
    scan = scan_at_pose(small_world, pose, rng, max_range=50.0,
                        min_range=2.0, max_points=20_000)
    assert scan.shape[1] == 4 and scan.shape[0] <= 20_000
    depth = np.linalg.norm(scan[:, :3], axis=1)
    # range gate holds up to the 3-sigma of the added noise
    assert depth.min() > 1.8 and depth.max() < 50.3


def test_write_kitti_sequence_roundtrip(small_world, tmp_path):
    from overlapnet_tpu.geometry import kitti

    poses = loop_trajectory(4, side=40.0)
    files = write_kitti_sequence(
        str(tmp_path), small_world, poses, max_points=15_000
    )
    scans = kitti.load_files(files["scan_folder"])
    assert len(scans) == 4
    scan = kitti.load_scan(scans[0])
    assert scan.shape[1] == 4 and scan.shape[0] > 1000

    # poses roundtrip through the KITTI loader + identity calib conversion
    # (rebased on frame 0, and frame 0 is at the square's start corner)
    T = kitti.load_calib(files["calib_file"])
    np.testing.assert_allclose(T, np.eye(4), atol=1e-12)
    loaded = kitti.poses_cam_to_velo(kitti.load_poses(files["poses_file"]), T)
    expected = np.linalg.inv(poses[0]) @ poses
    np.testing.assert_allclose(loaded, expected, atol=1e-6)

    covs = kitti.load_covariances(files["covariance_file"])
    assert covs.shape == (4, 6, 6)
    # uncertainty grows with frame index
    assert covs[3, 0, 0] > covs[0, 0, 0]


def test_sim_gt_overlap_structure(small_world, tmp_path):
    """GT overlap from simulated scans behaves physically: self-overlap ~1,
    revisit (lap 2) overlap high, distant frames low."""
    from overlapnet_tpu.geometry import kitti
    from overlapnet_tpu.geometry.overlap import com_overlap_yaw

    poses = loop_trajectory(8, side=40.0, laps=2.0)
    files = write_kitti_sequence(str(tmp_path), small_world, poses,
                                 max_points=15_000)
    scan_paths = kitti.load_files(files["scan_folder"])
    velo_poses = kitti.poses_cam_to_velo(
        kitti.load_poses(files["poses_file"]), np.eye(4)
    )
    gt = com_overlap_yaw(scan_paths, velo_poses, frame_idx=0,
                         max_points=32_768)
    ov = gt[:, 2]
    assert ov[0] > 0.9  # self
    assert ov[4] > 0.5  # same place, lap 2 (frame 4 == frame 0 pose)
    assert ov[2] < ov[4]  # opposite corner is worse than the revisit
    # yaw bins: same heading at the revisit -> bin == center (zero yaw)
    assert int(gt[4, 3]) == 180


def test_com_overlap_yaw_all_matches_per_query(small_world, tmp_path):
    """The resident-points all-pairs GT path equals per-query calls row for
    row (overlaps bit-identical, yaw bins through the vectorized trunc equal
    the scalar reference formula)."""
    from overlapnet_tpu.geometry import kitti
    from overlapnet_tpu.geometry.overlap import com_overlap_yaw, com_overlap_yaw_all

    poses = loop_trajectory(6, side=40.0, laps=2.0)
    files = write_kitti_sequence(str(tmp_path), small_world, poses,
                                 max_points=15_000)
    scan_paths = kitti.load_files(files["scan_folder"])
    velo_poses = kitti.poses_cam_to_velo(
        kitti.load_poses(files["poses_file"]), np.eye(4)
    )
    gt_all = com_overlap_yaw_all(scan_paths, velo_poses, max_points=32_768,
                                 chunk_size=5)  # non-divisor: exercises tail pad
    assert gt_all.shape == (36, 4)
    for q in range(6):
        gt_q = com_overlap_yaw(scan_paths, velo_poses, frame_idx=q,
                               max_points=32_768)
        rows = gt_all[gt_all[:, 0] == q]
        np.testing.assert_array_equal(rows, gt_q)


def test_com_overlap_yaw_all_chunk_invariance(small_world, tmp_path):
    """Async chunked dispatch must be chunk-size invariant (guards the
    padded-tail + single-fetch rewrite)."""
    from overlapnet_tpu.geometry import kitti
    from overlapnet_tpu.geometry.overlap import com_overlap_yaw_all

    poses = loop_trajectory(5, side=40.0, laps=2.0)
    files = write_kitti_sequence(str(tmp_path), small_world, poses,
                                 max_points=15_000)
    scan_paths = kitti.load_files(files["scan_folder"])
    velo_poses = kitti.poses_cam_to_velo(
        kitti.load_poses(files["poses_file"]), np.eye(4)
    )
    a = com_overlap_yaw_all(scan_paths, velo_poses, max_points=32_768,
                            chunk_size=3)
    b = com_overlap_yaw_all(scan_paths, velo_poses, max_points=32_768,
                            chunk_size=25)  # = n_pairs: single chunk
    np.testing.assert_array_equal(a, b)
