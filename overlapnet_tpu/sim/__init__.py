"""Procedural LiDAR world simulation (KITTI-compatible synthetic sequences)."""

from overlapnet_tpu.sim.world import (
    loop_trajectory,
    make_world,
    scan_at_pose,
    write_kitti_sequence,
)

__all__ = [
    "loop_trajectory",
    "make_world",
    "scan_at_pose",
    "write_kitti_sequence",
]
