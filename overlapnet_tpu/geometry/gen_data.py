"""Offline preprocessing: scan folders -> projected channel images (.npy).

Batch equivalents of reference src/utils/gen_{depth,normal,intensity,
semantic}_data.py. The reference projects one scan at a time in numpy with a
Python normal-map double loop; here scans are padded to a fixed point count,
chunked, and projected on-device via a vmapped jitted kernel, with a thread
pool streaming the .bin files from disk. Output file layout and values match
the reference (same names, same -1 empty-pixel convention):

  <dst>/depth/<name>.npy      (H, W)      float32 range, -1 empty
  <dst>/normal/<name>.npy     (H, W, 3)   float32 normals, -1 invalid
  <dst>/intensity/<name>.npy  (H, W)      float32 remission, -1 empty
  <dst>/semantic/<name>.npy   (H, W, 20)  float32 probabilities, -1 empty

Naming: depth/normal/intensity use the running index like gen_depth_data.py
(:41); semantic uses the scan basename (gen_semantic_data.py:48-50) — both
agree on standard KITTI folders (files are already %06d-ordered).
"""

from __future__ import annotations

import functools
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from overlapnet_tpu.geometry.kitti import load_files, load_scan
from overlapnet_tpu.geometry.projection import (
    DEFAULT_MAX_POINTS,
    normal_map,
    pad_points,
    range_projection,
    semantic_projection,
)


@functools.partial(jax.jit, static_argnames=("max_range",))
def _project_chunk(points: jax.Array, max_range: float = 50.0):
    """(K, N, 4) padded scans -> (range (K,H,W), normal (K,H,W,3),
    intensity (K,H,W), idx (K,H,W))."""

    def one(pts):
        r, v, inten, idx = range_projection(pts, max_range=max_range)
        return r, normal_map(r, v), inten, idx

    return jax.vmap(one)(points)


def _run_batched(
    scan_paths: Sequence[str],
    consume: Callable[[int, np.ndarray, np.ndarray, np.ndarray, np.ndarray], None],
    chunk_size: int = 8,
    max_points: int = DEFAULT_MAX_POINTS,
    io_workers: int = 8,
    max_range: float = 50.0,
) -> None:
    """Stream scans from disk, project on device in chunks, hand each frame's
    host results to ``consume(idx, range, normal, intensity, proj_idx)``."""

    def load(path):
        return pad_points(load_scan(path).astype(np.float32), max_points)

    with ThreadPoolExecutor(max_workers=io_workers) as pool:
        loaded = pool.map(load, scan_paths)
        chunk, ids = [], []

        def flush():
            if not ids:
                return
            k = len(chunk)
            batch = np.stack(chunk)
            if k < chunk_size:  # pad to the static chunk shape
                batch = np.concatenate(
                    [batch, np.zeros((chunk_size - k,) + batch.shape[1:], batch.dtype)]
                )
            r, n, inten, idx = _project_chunk(jnp.asarray(batch), max_range=max_range)
            r, n, inten, idx = (np.asarray(a)[:k] for a in (r, n, inten, idx))
            for j, i in enumerate(ids):
                consume(i, r[j], n[j], inten[j], idx[j])
            chunk.clear()
            ids.clear()

        for i, pts in enumerate(loaded):
            chunk.append(pts)
            ids.append(i)
            if len(ids) == chunk_size:
                flush()
        flush()


def _dst(dst_folder: str, kind: str) -> str:
    out = os.path.join(dst_folder, kind)
    os.makedirs(out, exist_ok=True)
    return out


def gen_depth_data(
    scan_folder: str, dst_folder: str, normalize: bool = False, **kw
) -> list[str]:
    """Range images for every scan (reference gen_depth_data.py:10-47)."""
    out = _dst(dst_folder, "depth")
    scan_paths = load_files(scan_folder)
    written = []

    def consume(i, r, n, inten, idx):
        img = r / np.max(r) if normalize else r
        path = os.path.join(out, str(i).zfill(6))
        np.save(path, img)
        written.append(path + ".npy")

    _run_batched(scan_paths, consume, **kw)
    return written


def gen_normal_data(scan_folder: str, dst_folder: str, **kw) -> list[str]:
    """Normal maps for every scan (reference gen_normal_data.py:10-44)."""
    out = _dst(dst_folder, "normal")
    scan_paths = load_files(scan_folder)
    written = []

    def consume(i, r, n, inten, idx):
        path = os.path.join(out, str(i).zfill(6))
        np.save(path, n)
        written.append(path + ".npy")

    _run_batched(scan_paths, consume, **kw)
    return written


def gen_intensity_data(scan_folder: str, dst_folder: str, **kw) -> list[str]:
    """Remission images for every scan (reference gen_intensity_data.py:10-41)."""
    out = _dst(dst_folder, "intensity")
    scan_paths = load_files(scan_folder)
    written = []

    def consume(i, r, n, inten, idx):
        path = os.path.join(out, str(i).zfill(6))
        np.save(path, inten)
        written.append(path + ".npy")

    _run_batched(scan_paths, consume, **kw)
    return written


def gen_semantic_data(
    semantic_folder: str, scan_folder: str, dst_folder: str, num_classes: int = 20, **kw
) -> list[str]:
    """Semantic probability images (reference gen_semantic_data.py:11-57):
    per-point (N, 20) probabilities gathered through the projection's winning
    point index, with max_range=inf."""
    out = _dst(dst_folder, "semantic")
    prob_paths = load_files(semantic_folder)
    scan_paths = load_files(scan_folder)
    written = []

    def consume(i, r, n, inten, idx):
        probs = np.fromfile(prob_paths[i], dtype=np.float32).reshape(
            (-1, num_classes)
        )
        img = np.asarray(
            semantic_projection(jnp.asarray(probs), jnp.asarray(idx), num_classes)
        )
        base = os.path.basename(scan_paths[i]).replace(".bin", "")
        path = os.path.join(out, base)
        np.save(path, img)
        written.append(path + ".npy")

    _run_batched(scan_paths, consume, max_range=float("inf"), **kw)
    return written
