"""Ground-truth overlap / yaw computation.

TPU re-design of reference src/utils/com_overlap_yaw.py: for a query frame,
every reference scan is transformed into the query frame, re-projected, and
overlap = |{px : r_ref > 0 and |r_ref - r_cur| < 1 m}| / |{px : r_cur > 0}|
(com_overlap_yaw.py:44-45). The reference loops frames in Python, one
projection per iteration; here frames are batched on-device via vmap (the
projection is the deterministic sort-based z-buffer from
``geometry.projection``) while a thread pool streams scans from disk.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from overlapnet_tpu.geometry import kitti
from overlapnet_tpu.geometry.projection import (
    DEFAULT_MAX_POINTS,
    pad_points,
    range_projection,
    transform_points,
)
from overlapnet_tpu.geometry.rotations import relative_yaw, yaw_to_bin


@jax.jit
def _overlap_chunk(
    ref_points: jax.Array,  # (K, N, 4) reference scans, padded
    transforms: jax.Array,  # (K, 4, 4) inv(pose_cur) @ pose_ref
    current_range: jax.Array,  # (H, W)
    valid_num: jax.Array,  # () number of valid pixels in the query projection
) -> jax.Array:
    """Overlap of K reference scans against one query range image."""

    def one(points, T):
        pts = transform_points(points, T)
        ref_range, _, _, _ = range_projection(pts)
        close = (ref_range > 0) & (jnp.abs(ref_range - current_range) < 1.0)
        return jnp.sum(close) / valid_num

    return jax.vmap(one)(ref_points, transforms)


def com_overlap_yaw(
    scan_paths: Sequence[str],
    poses: np.ndarray,
    frame_idx: int,
    leg_output_width: int = 360,
    chunk_size: int = 8,
    max_points: int = DEFAULT_MAX_POINTS,
    io_workers: int = 8,
) -> np.ndarray:
    """Ground truth overlap and yaw of one frame vs. all frames.

    Same contract as reference com_overlap_yaw.py:10-68. Returns an (n, 4)
    array with rows [current_frame_idx, reference_frame_idx, overlap, yaw_bin].
    """
    n = len(scan_paths)
    current_points = pad_points(
        kitti.load_scan(scan_paths[frame_idx]).astype(np.float32), max_points
    )
    current_range, _, _, _ = range_projection(jnp.asarray(current_points))
    valid_num = jnp.sum(current_range > 0).astype(jnp.float32)
    current_pose = poses[frame_idx]
    inv_current = np.linalg.inv(current_pose)

    def load(i):
        return pad_points(kitti.load_scan(scan_paths[i]).astype(np.float32), max_points)

    overlaps = np.zeros(n, dtype=np.float64)
    with ThreadPoolExecutor(max_workers=io_workers) as pool:
        loaded = pool.map(load, range(n))
        chunk_pts, chunk_T, chunk_ids = [], [], []

        def flush():
            if not chunk_ids:
                return
            vals = _overlap_chunk(
                jnp.asarray(np.stack(chunk_pts)),
                jnp.asarray(np.stack(chunk_T, dtype=np.float32)),
                current_range,
                valid_num,
            )
            overlaps[np.array(chunk_ids)] = np.asarray(vals)
            chunk_pts.clear()
            chunk_T.clear()
            chunk_ids.clear()

        for i, pts in enumerate(loaded):
            chunk_pts.append(pts)
            chunk_T.append(inv_current @ poses[i])
            chunk_ids.append(i)
            if len(chunk_ids) == chunk_size:
                flush()
        flush()

    yaw_bins = np.array(
        [
            yaw_to_bin(relative_yaw(current_pose, poses[i]), leg_output_width)
            for i in range(n)
        ],
        dtype=np.float64,
    )

    gt = np.zeros((n, 4))
    gt[:, 0] = frame_idx
    gt[:, 1] = np.arange(n)
    gt[:, 2] = overlaps
    gt[:, 3] = yaw_bins
    return gt
