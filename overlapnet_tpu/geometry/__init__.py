from overlapnet_tpu.geometry.kitti import (
    load_calib,
    load_files,
    load_poses,
    load_scan,
    load_vertex,
    poses_cam_to_velo,
)
from overlapnet_tpu.geometry.projection import (
    PROJ_H,
    PROJ_W,
    normal_map,
    pad_points,
    range_projection,
    semantic_projection,
)
from overlapnet_tpu.geometry.rotations import (
    euler_angles_from_rotation_matrix,
    yaw_to_bin,
)

__all__ = [
    "PROJ_H",
    "PROJ_W",
    "euler_angles_from_rotation_matrix",
    "load_calib",
    "load_files",
    "load_poses",
    "load_scan",
    "load_vertex",
    "normal_map",
    "pad_points",
    "poses_cam_to_velo",
    "range_projection",
    "semantic_projection",
    "yaw_to_bin",
]
