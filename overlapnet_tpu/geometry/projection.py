"""Jittable spherical (range-image) projection kernels.

TPU-first re-design of the reference's numpy geometry core
(reference: src/utils/utils.py:59-175):

- ``range_projection``: the reference sorts points by depth descending and
  scatters so the nearest point wins each pixel (utils.py:107-132). Unordered
  scatter on TPU is nondeterministic under duplicate indices, and a full
  multi-key sort of 140k points compiles pathologically slowly on TPU, so the
  z-buffer is two associative scatter-mins: (1) per-pixel min depth, (2) among
  the points matching that depth, the min original index. Both reductions are
  order-independent => bit-deterministic, and the semantics are identical to
  the reference (nearest point wins; depth ties resolve to the lowest point
  index, exactly like the reference's descending-sort overwrite order).
- ``normal_map``: the reference's O(H*W) double Python loop (utils.py:149-173)
  becomes shifted-array cross products on the full image.

All functions are shape-static (fixed max point count via ``pad_points``) and
jit/vmap-compatible; rows of zeros act as padding (depth 0 => dropped, the
same filter the reference applies at utils.py:76).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PROJ_H = 64
PROJ_W = 900
FOV_UP_DEG = 3.0
FOV_DOWN_DEG = -25.0
MAX_RANGE = 50.0

# KITTI HDL-64 scans have ~120-130k points; fixed capacity keeps shapes static
# for XLA. Points beyond capacity are dropped (never happens on KITTI).
DEFAULT_MAX_POINTS = 140_000


def pad_points(points: np.ndarray, max_points: int = DEFAULT_MAX_POINTS) -> np.ndarray:
    """Pad/truncate an (N, C) point array to (max_points, C) with zero rows.

    Zero rows have depth 0 and are dropped by ``range_projection`` exactly like
    the reference drops [0, 0, 0] points (utils.py:76).
    """
    n, c = points.shape
    out = np.zeros((max_points, c), dtype=points.dtype)
    out[: min(n, max_points)] = points[:max_points]
    return out


def project_pixels(
    points: jax.Array,
    *,
    proj_h: int = PROJ_H,
    proj_w: int = PROJ_W,
    fov_up: float = FOV_UP_DEG,
    fov_down: float = FOV_DOWN_DEG,
    max_range: float = MAX_RANGE,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Spherical pixel mapping only: (N, 4) points -> (pix, depth, valid).

    The shared coordinate core of ``range_projection`` (identical expression
    sequence, so values are bit-equal): pix is the flat ``v * W + u`` pixel id
    with invalid points routed to the overflow bucket ``H * W`` (dropped by
    ``mode='drop'`` scatters). Used stand-alone by the GT overlap engine
    (geometry/overlap.py), which needs only the pass-1 min-depth z-buffer.
    """
    fov_up_rad = fov_up / 180.0 * jnp.pi
    fov_down_rad = fov_down / 180.0 * jnp.pi
    fov = abs(fov_down_rad) + abs(fov_up_rad)

    xyz = points[:, :3].astype(jnp.float32)
    depth = jnp.linalg.norm(xyz, axis=1)
    valid = (depth > 0) & (depth < max_range)

    safe_depth = jnp.where(depth > 0, depth, 1.0)
    yaw = -jnp.arctan2(xyz[:, 1], xyz[:, 0])
    pitch = jnp.arcsin(jnp.clip(xyz[:, 2] / safe_depth, -1.0, 1.0))

    proj_x = jnp.floor(0.5 * (yaw / jnp.pi + 1.0) * proj_w)
    proj_x = jnp.clip(proj_x, 0, proj_w - 1).astype(jnp.int32)
    proj_y = jnp.floor((1.0 - (pitch + abs(fov_down_rad)) / fov) * proj_h)
    proj_y = jnp.clip(proj_y, 0, proj_h - 1).astype(jnp.int32)

    pix = jnp.where(valid, proj_y * proj_w + proj_x, proj_h * proj_w)
    return pix, depth, valid


@functools.partial(
    jax.jit,
    static_argnames=("proj_h", "proj_w", "fov_up", "fov_down", "max_range"),
)
def range_projection(
    points: jax.Array,
    *,
    proj_h: int = PROJ_H,
    proj_w: int = PROJ_W,
    fov_up: float = FOV_UP_DEG,
    fov_down: float = FOV_DOWN_DEG,
    max_range: float = MAX_RANGE,
):
    """Project a point cloud into a spherical range image.

    Args:
      points: (N, 4) array: x, y, z, intensity (or homogeneous 1s). Zero rows
        are treated as padding.

    Returns:
      proj_range: (H, W) float32 depth, -1 where empty.
      proj_vertex: (H, W, 4) float32 (x, y, z, 1), -1 where empty.
      proj_intensity: (H, W) float32 4th column of the winning point, -1 empty.
      proj_idx: (H, W) int32 index of the winning point, -1 where empty.

    Pixel mapping matches reference utils.range_projection (utils.py:59-134):
    u = floor(0.5*(-atan2(y,x)/pi + 1) * W), v = floor((1 - (pitch +
    |fov_down|)/fov) * H), clamped; valid iff 0 < depth < max_range.
    """
    xyz = points[:, :3].astype(jnp.float32)
    intensity = points[:, 3].astype(jnp.float32)
    pix, depth, valid = project_pixels(
        points,
        proj_h=proj_h,
        proj_w=proj_w,
        fov_up=fov_up,
        fov_down=fov_down,
        max_range=max_range,
    )
    n_pix = proj_h * proj_w

    # Deterministic z-buffer via two associative scatter-mins (a multi-key
    # sort of 140k points compiles pathologically slowly on TPU):
    #   pass 1: nearest depth per pixel; pass 2: lowest original index among
    #   the points at exactly that depth (the reference's tie-break).
    idx = jnp.arange(points.shape[0], dtype=jnp.int32)
    win_depth = (
        jnp.full((n_pix,), jnp.inf, jnp.float32)
        .at[pix]
        .min(jnp.where(valid, depth, jnp.inf), mode="drop")
    )
    is_winner = valid & (depth == win_depth[jnp.minimum(pix, n_pix - 1)])
    big = jnp.int32(points.shape[0])
    win_idx = (
        jnp.full((n_pix,), big, jnp.int32)
        .at[pix]
        .min(jnp.where(is_winner, idx, big), mode="drop")
    )

    hit = win_idx < big
    safe_idx = jnp.where(hit, win_idx, 0)
    proj_range = jnp.where(hit, win_depth, -1.0).reshape(proj_h, proj_w)
    vertex_rows = jnp.concatenate(
        [xyz[safe_idx], jnp.ones((n_pix, 1), jnp.float32)], axis=1
    )
    proj_vertex = jnp.where(hit[:, None], vertex_rows, -1.0).reshape(
        proj_h, proj_w, 4
    )
    proj_intensity = jnp.where(hit, intensity[safe_idx], -1.0).reshape(
        proj_h, proj_w
    )
    proj_idx = jnp.where(hit, win_idx, -1).reshape(proj_h, proj_w)
    return proj_range, proj_vertex, proj_intensity, proj_idx


@jax.jit
def normal_map(proj_range: jax.Array, proj_vertex: jax.Array) -> jax.Array:
    """Per-pixel surface normals from a range projection.

    Vectorized equivalent of reference utils.gen_normal_map (utils.py:137-175):
    normal = normalize(cross(v_norm, u_norm)) where u is the width-wrapped
    right neighbor and v the downward neighbor; -1 where the pixel, either
    neighbor, or the cross-product norm is invalid; the last row is always -1
    (the reference loops y over range(H-1)).
    """
    p = proj_vertex[..., :3]
    depth = proj_range

    u = jnp.roll(p, -1, axis=1)  # right neighbor, wrapped in width
    u_depth = jnp.roll(depth, -1, axis=1)
    v = jnp.roll(p, -1, axis=0)  # down neighbor (row y+1)
    v_depth = jnp.roll(depth, -1, axis=0)

    du = u - p
    dv = v - p
    du_norm = jnp.linalg.norm(du, axis=-1, keepdims=True)
    dv_norm = jnp.linalg.norm(dv, axis=-1, keepdims=True)
    u_unit = du / jnp.where(du_norm > 0, du_norm, 1.0)
    v_unit = dv / jnp.where(dv_norm > 0, dv_norm, 1.0)

    w = jnp.cross(v_unit, u_unit)
    w_norm = jnp.linalg.norm(w, axis=-1, keepdims=True)
    normal = w / jnp.where(w_norm > 0, w_norm, 1.0)

    h = proj_range.shape[0]
    row_ok = (jnp.arange(h) < h - 1)[:, None]
    valid = (
        (depth > 0)
        & (u_depth > 0)
        & (v_depth > 0)
        & (w_norm[..., 0] > 0)
        & row_ok
    )
    return jnp.where(valid[..., None], normal, -1.0).astype(jnp.float32)


def semantic_projection(
    probs: jax.Array,
    proj_idx: jax.Array,
    num_classes: int = 20,
) -> jax.Array:
    """Project per-point class probabilities into the image.

    Equivalent of reference gen_semantic_data (gen_semantic_data.py:42-46):
    pixels take the probability row of their winning point, -1 where empty.

    Args:
      probs: (N, num_classes) per-point probabilities.
      proj_idx: (H, W) winning point index from ``range_projection`` (computed
        with max_range=inf in the reference's semantic path).
    """
    gathered = probs[jnp.clip(proj_idx, 0, probs.shape[0] - 1)]
    return jnp.where(
        (proj_idx >= 0)[..., None],
        gathered,
        jnp.full_like(gathered, -1.0),
    ).astype(jnp.float32)


def transform_points(points: jax.Array, T: jax.Array) -> jax.Array:
    """Apply a 4x4 rigid transform to (N, 4)-homogeneous points.

    Zero rows (the padding convention of ``pad_points``) stay zero so they
    remain invalid after the transform; the 4th output column is
    homogeneous-1 for real points.
    """
    xyz = points[:, :3]
    valid = jnp.any(xyz != 0, axis=1, keepdims=True)
    xyz1 = jnp.concatenate(
        [xyz, jnp.ones((points.shape[0], 1), points.dtype)], axis=1
    )
    out = xyz1 @ T.T.astype(points.dtype)
    return jnp.where(valid, out, 0.0)
