"""Host-side input pipeline: pair-image batches for training/eval.

Re-design of the reference's keras Sequence generators (reference:
src/two_heads/ImagePairOverlapOrientationSequence.py:87-212,
ImagePairOverlapSequenceFeatureVolume.py:9-47). Differences, TPU-first:

- the reference ``np.load``s every channel image from disk for every pair in
  every epoch; here scans are assembled once into an in-host-RAM cache (a
  KITTI sequence is ~1 GB at 64x900x4 fp32) or memory-mapped from a per-
  sequence pack file (``pack.py``), and pairs index into it;
- batches are materialized by a background thread (double buffering) so the
  accelerator never waits on IO;
- the random right-image circular-shift augmentation (rotate_data 0/1/2,
  reference :42-53, 75-80, 209-212) is reproduced exactly — including the
  reference quirk that the yaw label is NOT adjusted for the shift (documented
  in SURVEY.md §2; the legs are VALID convs, so an input-column shift has no
  exact label-space equivalent).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Iterator, Mapping, Sequence

import numpy as np

from overlapnet_tpu.core.config import ChannelConfig
from overlapnet_tpu.data.gt_files import PairList


def load_channel_image(
    image_root: str, seq_dir: str, kind: str, name: str
) -> np.ndarray:
    """Load one channel image ``<root>/<seq>/<kind>/<name>.npy`` (.npz
    fallback like the reference's probability/intensity paths)."""
    base = os.path.join(image_root, seq_dir, kind, name)
    if os.path.exists(base + ".npy"):
        return np.load(base + ".npy")
    return np.load(base + ".npz")["arr_0"]


def assemble_scan_image(
    image_root: str,
    seq_dir: str,
    name: str,
    channels: ChannelConfig,
    height: int,
    width: int,
) -> np.ndarray:
    """Stack the configured channels into one (H, W, C) float32 image, in the
    reference's channel order (ImagePairOverlapOrientationSequence.py:142-207)."""
    out = np.zeros((height, width, channels.num_channels), np.float32)
    c = 0
    for kind, nch in channels.channel_kinds():
        img = load_channel_image(image_root, seq_dir, kind, name)
        if img.ndim == 2:
            img = img[..., None]
        out[:, :, c : c + nch] = img[:height, :width, :nch]
        c += nch
    return out


class _ScanCache:
    """Thread-safe cache of assembled (H, W, C) scan images keyed by
    (seq_dir, name); backed by per-image files or a pack memmap."""

    def __init__(self, image_root, channels, height, width, packs=None):
        self._root = image_root
        self._channels = channels
        self._h, self._w = height, width
        self._packs = packs or {}
        self._cache: dict[tuple[str, str], np.ndarray] = {}
        self._lock = threading.Lock()

    def get(self, seq_dir: str, name: str) -> np.ndarray:
        key = (seq_dir, name)
        with self._lock:
            img = self._cache.get(key)
        if img is not None:
            return img
        if seq_dir in self._packs:
            img = self._packs[seq_dir].image(name)
        else:
            img = assemble_scan_image(
                self._root, seq_dir, name, self._channels, self._h, self._w
            )
        with self._lock:
            self._cache[key] = img
        return img


class PairImageDataset:
    """Batches of (x1, x2, overlap, orientation) for a list of scan pairs.

    Args mirror the reference generator's (ImagePairOverlapOrientation
    Sequence.py:17-55); ``orientation`` stays an integer yaw-bin per pair
    (the trainer builds the target vector on device, train/losses.py).
    """

    def __init__(
        self,
        image_root: str,
        pairs: PairList,
        channels: ChannelConfig,
        height: int = 64,
        width: int = 900,
        rotate_data: int = 0,
        seed: int = 1234,
        packs: Mapping[str, "SequencePack"] | None = None,
        adjust_yaw_labels: bool = False,
        leg_output_width: int = 360,
    ):
        self.pairs = pairs
        self.width = width
        self.rotate_data = rotate_data
        # Reference quirk: rotate_data rolls the right image but leaves the
        # yaw label untouched (SURVEY.md §2), so the aug only serves overlap
        # robustness. adjust_yaw_labels=True moves the label by
        # -round(shift * W'/W) leg-output bins — rolling fb by +s' shifts the
        # circular-correlation peak to argmax - s' (tests/test_models.py
        # property test) — turning the same aug into yaw training signal.
        self.adjust_yaw_labels = adjust_yaw_labels
        self.leg_output_width = leg_output_width
        self._packs = packs or {}
        self._cache = _ScanCache(image_root, channels, height, width, packs)
        self._rng = random.Random(seed)
        self._shifts = self._draw_shifts()
        # Precompute pack row indices per pair side (-1 = not packed); packed
        # sides batch-gather through the native library (data/native.py).
        def rows(dirs, names):
            out = np.full(len(names), -1, np.int64)
            for i, (d, n) in enumerate(zip(dirs, names)):
                pack = self._packs.get(d)
                if pack is not None and n in pack._index:
                    out[i] = pack._index[n]
            return out

        self._rows1 = rows(pairs.dir1, pairs.imgf1)
        self._rows2 = (
            rows(pairs.dir2, pairs.imgf2) if pairs.imgf2 else np.zeros(0, np.int64)
        )

    def _draw_shifts(self) -> np.ndarray:
        # randint(0, width) inclusive, like the reference (:51-53).
        return np.array(
            [self._rng.randint(0, self.width) for _ in range(len(self.pairs))]
        )

    def __len__(self) -> int:
        return len(self.pairs)

    def _adjusted_orientation(self, idx: np.ndarray) -> np.ndarray:
        """Yaw labels for pair indices ``idx``, shift-corrected when
        ``adjust_yaw_labels`` is on (leg-output-bin space, see __init__)."""
        ori = np.asarray(self.pairs.orientation[idx], np.int32)
        if self.rotate_data > 0 and self.adjust_yaw_labels:
            wp = self.leg_output_width
            s_bins = np.round(
                self._shifts[idx] * (wp / self.width)
            ).astype(np.int32)
            ori = np.mod(ori - s_bins, wp).astype(np.int32)
        return ori

    def _example(self, i: int) -> tuple[np.ndarray, np.ndarray, float, int]:
        p = self.pairs
        x1 = self._cache.get(p.dir1[i], p.imgf1[i])
        x2 = self._cache.get(p.dir2[i], p.imgf2[i])
        if self.rotate_data > 0:
            x2 = np.roll(x2, int(self._shifts[i]), axis=1)
        ori = int(self._adjusted_orientation(np.asarray([i]))[0])
        return x1, x2, float(p.overlap[i]), ori

    def batches(
        self,
        batch_size: int,
        epoch: int = 0,
        shuffle: bool = False,
        drop_remainder: bool = False,
        prefetch: int = 2,
        max_batches: int | None = None,
        input_dtype: str = "float32",
    ) -> Iterator[dict]:
        """Yield batch dicts {x1, x2, overlap, orientation} (host numpy),
        assembled by a background thread.

        ``input_dtype='bfloat16'`` casts the image tensors on the host —
        halves the host->device transfer (the training bottleneck over a
        remote-TPU link) at ~3 significant digits of range precision."""
        if input_dtype == "bfloat16":
            import ml_dtypes

            image_dtype = np.dtype(ml_dtypes.bfloat16)
        else:
            image_dtype = np.dtype(np.float32)
        if self.rotate_data == 2 and epoch > 0:
            self._shifts = self._draw_shifts()

        order = np.arange(len(self.pairs))
        if shuffle:
            np.random.default_rng(hash(("epoch", epoch)) % (2**32)).shuffle(order)

        n = len(order)
        starts = list(range(0, n, batch_size))
        if drop_remainder:
            starts = [s for s in starts if s + batch_size <= n]
        if max_batches is not None:
            starts = starts[:max_batches]

        q: queue.Queue = queue.Queue(maxsize=prefetch)
        stop = threading.Event()

        def gather_side(idx, dirs, names, pack_rows, shifts):
            """Assemble one side of the batch; packed scans go through the
            native multi-threaded gather (fused roll), the rest through the
            scan cache."""
            from overlapnet_tpu.data.native import gather_batch

            out = None
            packed = pack_rows[idx] >= 0
            by_seq: dict[str, list[int]] = {}
            for k, i in enumerate(idx):
                if packed[k]:
                    by_seq.setdefault(dirs[i], []).append(k)
            for seq, ks in by_seq.items():
                rows = pack_rows[idx[ks]]
                sh = shifts[idx[ks]] if shifts is not None else None
                got = gather_batch(self._packs[seq].data, rows, sh)
                if out is None:
                    out = np.empty((len(idx),) + got.shape[1:], np.float32)
                out[ks] = got
            for k, i in enumerate(idx):
                if not packed[k]:
                    img = self._cache.get(dirs[i], names[i])
                    if shifts is not None:
                        img = np.roll(img, int(shifts[i]), axis=1)
                    if out is None:
                        out = np.empty((len(idx),) + img.shape, np.float32)
                    out[k] = img
            return out

        def make_batch(start: int) -> dict:
            idx = order[start : start + batch_size]
            p = self.pairs
            shifts = self._shifts if self.rotate_data > 0 else None
            x1 = gather_side(idx, p.dir1, p.imgf1, self._rows1, None)
            x2 = gather_side(idx, p.dir2, p.imgf2, self._rows2, shifts)
            if image_dtype != np.float32:
                x1 = x1.astype(image_dtype)
                x2 = x2.astype(image_dtype)
            return {
                "x1": x1,
                "x2": x2,
                "overlap": np.asarray(p.overlap[idx], np.float32),
                "orientation": self._adjusted_orientation(idx),
            }

        def worker():
            try:
                for s in starts:
                    if stop.is_set():
                        return
                    q.put(make_batch(s))
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
            # Drain so the worker's blocked put() can observe the stop flag.
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class ResidentPairs:
    """Device-resident training store (no reference counterpart).

    The host pipeline ships ~2 full images per pair per step; over a
    remote-TPU link that transfer IS the training bottleneck. Here the
    deduplicated scan images are put on the accelerator ONCE (replicated
    over the mesh) and each step ships only integer pair indices, rotation
    shifts and labels — O(bytes) per step. Pair gathers and the rotate_data
    circular-shift augmentation happen on device inside the jitted train
    step (trainer.make_resident_train_step).

    Augmentation/shuffle semantics match PairImageDataset exactly (same
    shift draws, same epoch shuffle streams), so the two paths are
    interchangeable — asserted by tests/test_train.py.
    """

    def __init__(self, ds: PairImageDataset, mesh=None, input_dtype: str = "float32"):
        import jax.numpy as jnp

        self._ds = ds
        scans, self.idx1, self.idx2 = unique_scans(ds.pairs)
        imgs = np.stack([ds._cache.get(d, n) for d, n in scans])
        if input_dtype == "bfloat16":
            import ml_dtypes

            imgs = imgs.astype(ml_dtypes.bfloat16)
        if mesh is not None:
            from overlapnet_tpu.parallel.mesh import put_replicated

            self.images = put_replicated(mesh, imgs)
        else:
            self.images = jnp.asarray(imgs)
        self.n_scans = imgs.shape[0]

    def __len__(self) -> int:
        return len(self._ds.pairs)

    def batches(
        self,
        batch_size: int,
        epoch: int = 0,
        shuffle: bool = False,
        drop_remainder: bool = False,
        max_batches: int | None = None,
    ) -> Iterator[dict]:
        """Yield index batches {i1, i2, shift, overlap, orientation} (host
        numpy, tiny). Shift semantics = PairImageDataset._example: right
        image np.roll(+shift) when rotate_data > 0, else shift 0."""
        ds = self._ds
        if ds.rotate_data == 2 and epoch > 0:
            ds._shifts = ds._draw_shifts()
        order = np.arange(len(ds.pairs))
        if shuffle:
            np.random.default_rng(hash(("epoch", epoch)) % (2**32)).shuffle(order)
        starts = list(range(0, len(order), batch_size))
        if drop_remainder:
            starts = [s for s in starts if s + batch_size <= len(order)]
        if max_batches is not None:
            starts = starts[:max_batches]
        p = ds.pairs
        shifts = (
            ds._shifts if ds.rotate_data > 0 else np.zeros(len(p), np.int32)
        )
        for s in starts:
            idx = order[s : s + batch_size]
            yield {
                "i1": np.asarray(self.idx1[idx], np.int32),
                "i2": np.asarray(self.idx2[idx], np.int32),
                "shift": np.asarray(shifts[idx], np.int32),
                "overlap": np.asarray(p.overlap[idx], np.float32),
                "orientation": ds._adjusted_orientation(idx),
            }


class FeatureVolumePairs:
    """Pair batches over precomputed leg feature volumes — the descriptor-
    reuse path of evaluation/serving (reference
    ImagePairOverlapSequenceFeatureVolume.py:9-47)."""

    def __init__(
        self,
        feature_volumes: np.ndarray,  # (N, W', C)
        idx1: np.ndarray,
        idx2: np.ndarray,
        overlap: np.ndarray | None = None,
        orientation: np.ndarray | None = None,
    ):
        self.fv = feature_volumes
        self.idx1 = np.asarray(idx1, np.int64)
        self.idx2 = np.asarray(idx2, np.int64)
        self.overlap = overlap
        self.orientation = orientation

    def __len__(self) -> int:
        return len(self.idx1)

    def batches(self, batch_size: int) -> Iterator[dict]:
        for s in range(0, len(self), batch_size):
            sl = slice(s, s + batch_size)
            batch = {
                "fa": self.fv[self.idx1[sl]],
                "fb": self.fv[self.idx2[sl]],
            }
            if self.overlap is not None:
                batch["overlap"] = np.asarray(self.overlap[sl], np.float32)
            if self.orientation is not None:
                batch["orientation"] = np.asarray(self.orientation[sl], np.int32)
            yield batch


def unique_scans(pairs: PairList) -> tuple[list[tuple[str, str]], np.ndarray, np.ndarray]:
    """Deduplicate the scans referenced by a pair list.

    Returns (scans, idx1, idx2): ``scans`` is the sorted unique list of
    (seq_dir, name); idx1/idx2 map each pair's left/right scan into it — the
    argsort/searchsorted indexing of reference testing.py:237-248, so each
    scan's embedding is computed exactly once.
    """
    keys = sorted(
        set(zip(pairs.dir1, pairs.imgf1)) | set(zip(pairs.dir2, pairs.imgf2))
    )
    lookup = {k: i for i, k in enumerate(keys)}
    idx1 = np.array([lookup[k] for k in zip(pairs.dir1, pairs.imgf1)], np.int64)
    idx2 = np.array([lookup[k] for k in zip(pairs.dir2, pairs.imgf2)], np.int64)
    return keys, idx1, idx2
