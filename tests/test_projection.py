"""Golden tests: the JAX projection kernels vs. the reference's committed
preprocessed images (data/preprocess_data_demo), plus z-buffer semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from overlapnet_tpu.geometry import kitti
from overlapnet_tpu.geometry.projection import (
    normal_map,
    pad_points,
    range_projection,
    semantic_projection,
)


@pytest.fixture(scope="module")
def projected(bundled_scan_paths):
    scan = kitti.load_scan(bundled_scan_paths[0])
    pts = pad_points(scan)
    r, v, inten, idx = range_projection(jnp.asarray(pts))
    return tuple(np.asarray(a) for a in (r, v, inten, idx))


def test_depth_golden(projected, golden_depth):
    proj_range, *_ = projected
    assert proj_range.shape == golden_depth.shape == (64, 900)
    both_valid = (proj_range > 0) & (golden_depth > 0)
    same_validity = (proj_range > 0) == (golden_depth > 0)
    # Allow a tiny fraction of boundary-pixel disagreements from float
    # associativity; the bulk must match the committed reference output.
    assert same_validity.mean() > 0.999
    # Near-tie z-buffer pixels can flip winners from float-norm differences;
    # allow a handful of such pixels but demand bulk exactness.
    assert np.abs(proj_range[both_valid] - golden_depth[both_valid]).max() < 0.5
    mismatch = np.abs(proj_range[both_valid] - golden_depth[both_valid]) > 1e-4
    assert mismatch.mean() < 1e-3


def test_intensity_golden(projected, golden_intensity):
    _, _, proj_intensity, _ = projected
    both_valid = (proj_intensity >= 0) & (golden_intensity >= 0)
    close = np.isclose(
        proj_intensity[both_valid], golden_intensity[both_valid], atol=1e-4
    )
    assert close.mean() > 0.999


def test_normal_golden(projected, golden_normal):
    proj_range, proj_vertex, *_ = projected
    normals = np.asarray(normal_map(jnp.asarray(proj_range), jnp.asarray(proj_vertex)))
    assert normals.shape == golden_normal.shape == (64, 900, 3)
    ours_valid = np.any(normals != -1, axis=-1)
    ref_valid = np.any(golden_normal != -1, axis=-1)
    assert (ours_valid == ref_valid).mean() > 0.995
    both = ours_valid & ref_valid
    diff = np.abs(normals[both] - golden_normal[both])
    # normals are unit vectors; demand close agreement on the shared support
    assert np.quantile(diff, 0.999) < 5e-2
    assert diff.mean() < 1e-3


def test_zbuffer_nearest_point_wins():
    # Two points projecting to the same pixel; the nearer one must win,
    # reproducing the reference's descending-depth overwrite (utils.py:107-132).
    pts = np.zeros((8, 4), np.float32)
    pts[0] = [10.0, 0.0, 0.0, 0.5]
    pts[1] = [5.0, 0.0, 0.0, 0.9]  # same direction, nearer
    r, v, inten, idx = map(
        np.asarray, range_projection(jnp.asarray(pts))
    )
    yx = np.argwhere(r > 0)
    assert len(yx) == 1
    y, x = yx[0]
    assert np.isclose(r[y, x], 5.0)
    assert np.isclose(inten[y, x], 0.9)
    assert idx[y, x] == 1
    assert np.allclose(v[y, x], [5.0, 0.0, 0.0, 1.0])


def test_zbuffer_tie_lowest_index_wins():
    pts = np.zeros((4, 4), np.float32)
    pts[1] = [7.0, 0.0, 0.0, 0.1]
    pts[2] = [7.0, 0.0, 0.0, 0.2]  # identical point, higher index
    r, _, inten, idx = map(np.asarray, range_projection(jnp.asarray(pts)))
    y, x = np.argwhere(r > 0)[0]
    assert idx[y, x] == 1
    assert np.isclose(inten[y, x], 0.1)


def test_max_range_filter():
    pts = np.zeros((2, 4), np.float32)
    pts[0] = [60.0, 0.0, 0.0, 1.0]  # beyond 50 m
    r, *_ = range_projection(jnp.asarray(pts))
    assert not np.any(np.asarray(r) > 0)


def test_padding_rows_ignored():
    pts = np.zeros((100, 4), np.float32)
    r, *_ = range_projection(jnp.asarray(pts))
    assert np.all(np.asarray(r) == -1)


def test_semantic_projection():
    pts = np.zeros((4, 4), np.float32)
    pts[2] = [7.0, 0.0, 0.0, 0.0]
    _, _, _, idx = range_projection(jnp.asarray(pts))
    probs = np.arange(4 * 20, dtype=np.float32).reshape(4, 20)
    sem = np.asarray(semantic_projection(jnp.asarray(probs), idx))
    y, x = np.argwhere(np.asarray(idx) >= 0)[0]
    assert np.allclose(sem[y, x], probs[2])
    empty = np.asarray(idx) < 0
    assert np.all(sem[empty] == -1)


def test_projection_determinism(bundled_scan_paths):
    pts = jnp.asarray(pad_points(kitti.load_scan(bundled_scan_paths[0])))
    r1, _, _, i1 = range_projection(pts)
    r2, _, _, i2 = range_projection(pts)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(i1), np.asarray(i2))
