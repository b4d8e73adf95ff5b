"""Tests for the data layer: GT npz schema, balancing, split, pipeline."""

import os

import numpy as np
import pytest

from overlapnet_tpu.core.config import ChannelConfig
from overlapnet_tpu.data import (
    PairImageDataset,
    PairList,
    load_gt_pairs,
    normalize_overlap_distribution,
    save_gt_files,
    split_train_val,
)
from overlapnet_tpu.data.dataset import FeatureVolumePairs, unique_scans
from overlapnet_tpu.data.pack import SequencePack, open_packs


def _fake_gt(n=200, seed=0):
    rng = np.random.default_rng(seed)
    gt = np.zeros((n, 4))
    gt[:, 0] = 0
    gt[:, 1] = np.arange(n)
    gt[:, 2] = rng.uniform(0, 1, n)
    gt[:, 3] = rng.integers(0, 360, n)
    return gt


def test_gt_npz_roundtrip_new_format(tmp_path):
    gt = _fake_gt()
    train, val = split_train_val(gt)
    paths = save_gt_files(str(tmp_path), "07", gt, train, val)
    pairs = load_gt_pairs([paths["ground_truth_overlap_yaw"]], shuffle=False)
    assert len(pairs) == len(gt)
    assert pairs.dir1[0] == "07" and pairs.dir2[0] == "07"
    assert pairs.imgf2[5] == "%06d" % int(gt[5, 1])
    np.testing.assert_allclose(pairs.overlap, gt[:, 2])
    np.testing.assert_allclose(pairs.orientation, gt[:, 3])


def test_gt_npz_old_format(tmp_path):
    gt = _fake_gt(50)
    path = str(tmp_path / "old.npz")
    np.savez(path, gt)  # single unnamed array = old format
    pairs = load_gt_pairs([path], shuffle=False)
    assert len(pairs) == 50
    assert pairs.dir1[0] == ""
    np.testing.assert_allclose(pairs.overlap, gt[:, 2])


def test_gt_shuffle_is_consistent(tmp_path):
    gt = _fake_gt(80)
    path = str(tmp_path / "f.npz")
    np.savez(path, overlaps=gt, seq=np.asarray([["07", "07"]] * 80))
    rng = np.random.default_rng(7)
    pairs = load_gt_pairs([path], shuffle=True, rng=rng)
    # rows stay intact under shuffling: overlap must still match its imgf2
    for i in range(0, 80, 13):
        j = int(pairs.imgf2[i])
        assert pairs.overlap[i] == gt[j, 2]


def test_normalize_overlap_distribution():
    rng = np.random.default_rng(1)
    # heavily imbalanced: 1000 low-overlap, 50 mid, 20 high
    gt = np.concatenate(
        [
            np.column_stack([np.zeros(1000), np.arange(1000), rng.uniform(0, 0.1, 1000), np.zeros(1000)]),
            np.column_stack([np.zeros(50), np.arange(50), rng.uniform(0.4, 0.5, 50), np.zeros(50)]),
            np.column_stack([np.zeros(20), np.arange(20), rng.uniform(0.9, 1.0, 20), np.zeros(20)]),
        ]
    )
    out = normalize_overlap_distribution(gt, rng)
    ov = out[:, 2]
    n_low = np.sum(ov < 0.1)
    n_mid = np.sum((ov >= 0.4) & (ov < 0.5))
    n_high = np.sum(ov >= 0.9)
    assert n_low == n_mid == 50  # resampled down to the [0.4,0.5) count
    assert n_high == 20  # upper deciles untouched


def test_split_train_val_sizes():
    gt = _fake_gt(100)
    train, val = split_train_val(gt)
    assert len(val) == 10 and len(train) == 90
    # no overlap between the two (rows are unique by construction)
    val_ids = set(val[:, 1])
    assert not val_ids & set(train[:, 1])


@pytest.fixture
def image_tree(tmp_path):
    """A tiny on-disk image tree in the reference layout:
    <root>/<seq>/{depth,normal}/NNNNNN.npy, 8x12 images."""
    rng = np.random.default_rng(3)
    root = tmp_path / "imgs"
    h, w = 8, 12
    for seq in ["07"]:
        for kind, ch in [("depth", None), ("normal", 3)]:
            os.makedirs(root / seq / kind)
            for i in range(6):
                shape = (h, w) if ch is None else (h, w, ch)
                np.save(
                    root / seq / kind / f"{i:06d}.npy",
                    rng.normal(size=shape).astype(np.float32),
                )
    return str(root), h, w


def _pairs(n=10, seq="07", n_scans=6, seed=5):
    rng = np.random.default_rng(seed)
    i1 = rng.integers(0, n_scans, n)
    i2 = rng.integers(0, n_scans, n)
    return PairList(
        ["%06d" % i for i in i1],
        ["%06d" % i for i in i2],
        [seq] * n,
        [seq] * n,
        rng.uniform(0, 1, n),
        rng.integers(0, 360, n).astype(np.float64),
    )


def test_pair_image_dataset_batches(image_tree):
    root, h, w = image_tree
    pairs = _pairs()
    ds = PairImageDataset(root, pairs, ChannelConfig(), height=h, width=w)
    batches = list(ds.batches(batch_size=4))
    assert len(batches) == 3  # 10 pairs -> 4+4+2
    b = batches[0]
    assert b["x1"].shape == (4, h, w, 4)
    assert b["x2"].shape == (4, h, w, 4)
    assert b["overlap"].shape == (4,) and b["orientation"].dtype == np.int32
    # content check: x1 of pair 0 == depth+normal stack of imgf1[0]
    expected = np.concatenate(
        [
            np.load(os.path.join(root, "07", "depth", pairs.imgf1[0] + ".npy"))[..., None],
            np.load(os.path.join(root, "07", "normal", pairs.imgf1[0] + ".npy")),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(batches[0]["x1"][0], expected)


def test_rotation_augmentation(image_tree):
    root, h, w = image_tree
    pairs = _pairs(4)
    ds0 = PairImageDataset(root, pairs, ChannelConfig(), height=h, width=w, rotate_data=0)
    ds1 = PairImageDataset(root, pairs, ChannelConfig(), height=h, width=w, rotate_data=1)
    b0 = next(ds0.batches(4))
    b1 = next(ds1.batches(4))
    # left images identical; right images are column-rolls of the unaugmented
    np.testing.assert_allclose(b0["x1"], b1["x1"])
    for i in range(4):
        x0, x1 = b0["x2"][i], b1["x2"][i]
        found = any(
            np.allclose(np.roll(x0, s, axis=1), x1) for s in range(w + 1)
        )
        assert found, f"pair {i}: augmented image is not a roll of the original"
    # rotate_data=1: same shifts every epoch
    b1b = next(ds1.batches(4, epoch=1))
    np.testing.assert_allclose(b1["x2"], b1b["x2"])


def test_sequence_pack_matches_per_image(image_tree, tmp_path):
    root, h, w = image_tree
    ch = ChannelConfig()
    pack = SequencePack.build(root, "07", ch, str(tmp_path / "packs"), h, w)
    assert len(pack) == 6
    packs = open_packs(str(tmp_path / "packs"), ["07", "08"])
    assert set(packs) == {"07"}

    pairs = _pairs(6)
    ds_file = PairImageDataset(root, pairs, ch, height=h, width=w)
    ds_pack = PairImageDataset(root, pairs, ch, height=h, width=w, packs=packs)
    bf = next(ds_file.batches(6))
    bp = next(ds_pack.batches(6))
    np.testing.assert_allclose(bf["x1"], bp["x1"])
    np.testing.assert_allclose(bf["x2"], bp["x2"])

    # with rotation aug: the native fused-roll gather must equal the
    # per-image np.roll path (same seed -> same shifts)
    ds_file_r = PairImageDataset(root, pairs, ch, height=h, width=w, rotate_data=1)
    ds_pack_r = PairImageDataset(
        root, pairs, ch, height=h, width=w, rotate_data=1, packs=packs
    )
    bfr = next(ds_file_r.batches(6))
    bpr = next(ds_pack_r.batches(6))
    np.testing.assert_allclose(bfr["x2"], bpr["x2"])


def test_unique_scans_dedup():
    pairs = _pairs(20, n_scans=4)
    scans, idx1, idx2 = unique_scans(pairs)
    assert len(scans) <= 4
    for k, (d, n) in enumerate(scans):
        assert d == "07"
    # mapping reconstructs the original names
    for i in range(20):
        assert scans[idx1[i]][1] == pairs.imgf1[i]
        assert scans[idx2[i]][1] == pairs.imgf2[i]


def test_feature_volume_pairs():
    rng = np.random.default_rng(0)
    fv = rng.normal(size=(5, 9, 4)).astype(np.float32)
    fvp = FeatureVolumePairs(fv, [0, 1, 2], [2, 1, 0], overlap=np.ones(3))
    batches = list(fvp.batches(2))
    assert len(batches) == 2
    np.testing.assert_allclose(batches[0]["fa"], fv[[0, 1]])
    np.testing.assert_allclose(batches[1]["fb"], fv[[0]])


def test_rotate_adjust_yaw_labels(image_tree):
    """adjust_yaw_labels moves the yaw label by -round(shift * W'/W) bins
    (mod W') for every pair, identically in host batches, _example, and the
    resident index stream."""
    root, h, w = image_tree
    pairs = _pairs()
    wp = 5  # arbitrary label space for the tiny 12-col images
    ds = PairImageDataset(
        root, pairs, ChannelConfig(), height=h, width=w,
        rotate_data=1, seed=7, adjust_yaw_labels=True, leg_output_width=wp,
    )
    ref = PairImageDataset(
        root, pairs, ChannelConfig(), height=h, width=w,
        rotate_data=1, seed=7,
    )
    (b,) = list(ds.batches(len(pairs)))
    (b_ref,) = list(ref.batches(len(pairs)))
    shifts = ds._shifts
    expected = np.mod(
        b_ref["orientation"] - np.round(shifts * (wp / w)).astype(np.int32), wp
    )
    np.testing.assert_array_equal(b["orientation"], expected)
    # images themselves are identical (only the label moves)
    np.testing.assert_array_equal(b["x2"], b_ref["x2"])
    # _example agrees with the batch path
    for i in range(len(pairs)):
        assert ds._example(i)[3] == expected[i]
    # resident stream agrees
    from overlapnet_tpu.data.dataset import ResidentPairs

    res = ResidentPairs(ds)
    (rb,) = list(res.batches(len(pairs)))
    np.testing.assert_array_equal(rb["orientation"], expected)
    np.testing.assert_array_equal(rb["shift"], shifts)
