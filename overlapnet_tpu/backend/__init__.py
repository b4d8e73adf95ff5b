"""Pose-graph backend: turn loop-closure edges into optimized trajectories.

North-star extension with no reference counterpart (the reference's demo3
only visualizes detections, SURVEY.md §2): a JAX Gauss-Newton pose-graph
optimizer over SE(2) and trajectory-error evaluation.
"""

from overlapnet_tpu.backend.ate import absolute_trajectory_error
from overlapnet_tpu.backend.pose_graph import (
    PoseGraph,
    closures_to_edges,
    odometry_edges,
    optimize_pose_graph,
    relative_pose_edges,
)

__all__ = [
    "PoseGraph",
    "odometry_edges",
    "closures_to_edges",
    "relative_pose_edges",
    "optimize_pose_graph",
    "absolute_trajectory_error",
]
