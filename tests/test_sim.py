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


def test_pair_kernel_matches_full_zbuffer(small_world):
    """The GT pair kernel computes only the pass-1 min-depth z-buffer; its
    overlap count must be bit-equal to the full range_projection formulation
    (proj_range compare, reference com_overlap_yaw.py:44-46)."""
    import jax.numpy as jnp

    from overlapnet_tpu.geometry.overlap import _pair_chunk, _ranges_chunk
    from overlapnet_tpu.geometry.projection import (
        pad_points,
        range_projection,
        transform_points,
    )
    from overlapnet_tpu.sim.world import loop_trajectory, scan_at_pose

    poses = loop_trajectory(4, side=30.0, laps=1.0)
    rng = np.random.default_rng(3)
    pts = np.stack([
        pad_points(scan_at_pose(small_world, p, rng, max_points=12_000), 16_384)
        for p in poses
    ])
    pts_dev = jnp.asarray(pts)
    ranges, valids, radii = _ranges_chunk(pts_dev)
    # scan_at_pose range-gates at 50 m before adding noise
    assert float(jnp.max(radii)) <= 51.0

    inv = np.linalg.inv(poses)
    qc = np.array([0, 1, 2, 3], np.int32)
    rc = np.array([2, 3, 0, 1], np.int32)
    T = np.einsum("kij,kjl->kil", inv[qc], poses[rc]).astype(np.float32)
    got = np.asarray(_pair_chunk(
        pts_dev, ranges, valids, jnp.asarray(qc), jnp.asarray(rc),
        jnp.asarray(T),
    ))

    for k in range(4):
        cur = np.asarray(ranges[qc[k]])
        moved = transform_points(pts_dev[rc[k]], jnp.asarray(T[k]))
        ref_range = np.asarray(range_projection(moved)[0])
        # compare integer close-pixel counts (exact), not the float ratio —
        # host f64-then-cast division can differ from the device's f32
        # division in the last ulp (ADVICE r3)
        want_count = np.count_nonzero(
            (ref_range > 0) & (np.abs(ref_range - cur) < 1.0)
        )
        got_count = np.round(got[k] * float(valids[qc[k]]))
        np.testing.assert_equal(got_count, want_count)


def test_far_pair_gate_exact(small_world, tmp_path):
    """Pairs beyond max_range + scan radius are gated to overlap 0 without a
    device dispatch; the gated result must equal the computed one."""
    from overlapnet_tpu.geometry import kitti
    from overlapnet_tpu.geometry.overlap import com_overlap_yaw_all

    # two geometry clusters 400 m apart: cross-cluster pairs are gated
    near = loop_trajectory(3, side=20.0, laps=1.0)
    far = near.copy()
    far[:, 0, 3] += 400.0
    poses = np.concatenate([near, far])
    far_world = small_world.copy()
    far_world[:, 0] += 400.0
    world = np.concatenate([small_world, far_world])
    files = write_kitti_sequence(str(tmp_path), world, poses,
                                 max_points=10_000)
    scan_paths = kitti.load_files(files["scan_folder"])
    velo_poses = kitti.poses_cam_to_velo(
        kitti.load_poses(files["poses_file"]), np.eye(4)
    )
    gt = com_overlap_yaw_all(scan_paths, velo_poses, max_points=16_384)
    n = len(poses)
    table = gt[:, 2].reshape(n, n)
    cross = table[:3, 3:]
    assert np.all(cross == 0.0), cross
    # self-overlap of every frame is 1.0 in both halves (computed, not gated)
    np.testing.assert_allclose(np.diag(table), 1.0, atol=1e-6)
