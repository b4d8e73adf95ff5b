"""End-to-end CLI pipeline test on a synthetic mini-dataset.

Exercises the full user journey of the reference demos (gen-data -> gen-gt ->
train -> evaluate -> lcd) through the CLI entry points, with tiny shapes.
"""

import os

import numpy as np
import pytest
import yaml

from overlapnet_tpu.cli.__main__ import main as cli_main

SCANS = "/root/reference/data/scans"


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    """A synthetic KITTI-style sequence '07' with 4 scans (the two bundled
    scans, duplicated), identity-ish poses, calib, covariances, plus
    preprocessed images and GT npz files."""
    if not os.path.isdir(SCANS):
        pytest.skip("bundled scans not available")
    root = tmp_path_factory.mktemp("mini")
    seq_dir = root / "07"
    velo = seq_dir / "velodyne"
    os.makedirs(velo)
    import shutil

    src = sorted(os.listdir(SCANS))[:2]
    for i in range(4):
        shutil.copy(os.path.join(SCANS, src[i % 2]), velo / f"{i:06d}.bin")

    # poses: frames 0/1 at origin-ish, 2/3 nearby (a loop), camera frame ~ identity calib
    poses = np.tile(np.eye(4), (4, 1, 1))
    poses[1, 0, 3] = 1.0
    poses[2, 0, 3] = 120.0
    poses[3, 0, 3] = 0.5
    with open(seq_dir / "poses.txt", "w") as f:
        for p in poses:
            f.write(" ".join(str(v) for v in p[:3].ravel()) + "\n")
    with open(seq_dir / "calib.txt", "w") as f:
        f.write("Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")
    covs = np.tile(np.eye(6).ravel() * 25.0, (4, 1))
    np.savetxt(seq_dir / "covariance.txt", covs)
    return root


@pytest.fixture(scope="module")
def preprocessed(mini_dataset):
    rc = cli_main([
        "gen-data",
        "--scan-folder", str(mini_dataset / "07" / "velodyne"),
        "--dst-folder", str(mini_dataset / "07"),
    ])
    assert rc == 0
    return mini_dataset


def test_gen_data_matches_golden(preprocessed):
    golden = "/root/reference/data/preprocess_data_demo/depth/000000.npy"
    if not os.path.exists(golden):
        pytest.skip("golden not available")
    ours = np.load(preprocessed / "07" / "depth" / "000000.npy")
    # allow a couple of isolated z-buffer tie flips from float rounding
    mismatches = np.sum(np.abs(ours - np.load(golden)) > 1e-3)
    assert mismatches <= 2, f"{mismatches} mismatched pixels"
    normal = np.load(preprocessed / "07" / "normal" / "000000.npy")
    assert normal.shape == (64, 900, 3)
    intensity = np.load(preprocessed / "07" / "intensity" / "000000.npy")
    assert intensity.shape == (64, 900)


@pytest.fixture(scope="module")
def gt_generated(preprocessed):
    rc = cli_main([
        "gen-gt",
        "--scan-folder", str(preprocessed / "07" / "velodyne"),
        "--poses-file", str(preprocessed / "07" / "poses.txt"),
        "--calib-file", str(preprocessed / "07" / "calib.txt"),
        "--dst-folder", str(preprocessed / "07"),
        "--seq", "07",
    ])
    assert rc == 0
    gt_dir = preprocessed / "07" / "ground_truth"
    assert (gt_dir / "ground_truth_overlap_yaw.npz").exists()
    assert (gt_dir / "train_set.npz").exists()
    assert (gt_dir / "validation_set.npz").exists()
    return preprocessed


def test_gt_contents(gt_generated):
    h = np.load(gt_generated / "07" / "ground_truth" / "ground_truth_overlap_yaw.npz",
                allow_pickle=True)
    gt = h["overlaps"]
    assert gt.shape[1] == 4
    # frame 0 vs frame 0: perfect overlap, zero yaw bin offset from center
    self_row = gt[gt[:, 1] == 0][0]
    assert self_row[2] > 0.99
    assert int(self_row[3]) == 180
    # frame 0 vs frame 2 (120 m away): low overlap
    far_row = gt[gt[:, 1] == 2][0]
    assert far_row[2] < 0.2


@pytest.fixture(scope="module")
def net_yml(gt_generated, tmp_path_factory):
    exp = tmp_path_factory.mktemp("exp")
    cfg = {
        "data_root_folder": str(gt_generated),
        "experiments_path": str(exp),
        "testname": "mini",
        "training_seqs": "07",
        "testing_seqs": "07",
        "batch_size": 2,
        "no_epochs": 1,
        "no_batches_in_epoch": 2,
        "no_test_pairs": 4,
        "learning_rate": 0.001,
        "model": {
            "modelType": "SiameseNetworkTemplate",
            "legsType": "360OutputkLegs",
            "overlap_head": "DeltaLayerConv1NetworkHead",
            "orientation_head": "CorrelationHead",
            "inputShape": [64, 900, 4],
            "leg_output_width": 360,
            "strides_layer1": [2, 2],
            "additional_unsymmetric_layer3a": True,
        },
        "use_depth": True,
        "use_normals": True,
        "infer_seqs": "07",
    }
    path = exp / "network.yml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path), str(exp)


def test_train_cli(net_yml):
    path, exp = net_yml
    rc = cli_main(["train", path, "--single-device"])
    assert rc == 0
    assert os.path.exists(os.path.join(exp, "mini", "params.npz"))
    assert os.path.exists(os.path.join(exp, "mini", "metrics.jsonl"))
    ckpts = os.path.join(exp, "mini", "checkpoints")
    assert os.path.isdir(ckpts) and os.listdir(ckpts)


def test_evaluate_cli(net_yml):
    path, exp = net_yml
    rc = cli_main([
        "evaluate", path,
        "--weights", os.path.join(exp, "mini", "params.npz"),
        "--max-pairs", "4",
    ])
    assert rc == 0
    results = np.load(os.path.join(exp, "mini", "validation_results.npz"))
    assert "pred_overlap" in results and len(results["pred_overlap"]) > 0
    assert np.all((results["pred_overlap"] >= 0) & (results["pred_overlap"] <= 1))


def test_lcd_cli(net_yml, gt_generated, tmp_path):
    path, exp = net_yml
    demo_yml = tmp_path / "demo.yml"
    with open(demo_yml, "w") as f:
        yaml.safe_dump({
            "Demo3": {
                "network_config": path,
                "poses_file": str(gt_generated / "07" / "poses.txt"),
                "calib_file": str(gt_generated / "07" / "calib.txt"),
                "covariance_file": str(gt_generated / "07" / "covariance.txt"),
                "infer_seqs": "07",
            }
        }, f)
    out = str(tmp_path / "loops.npz")
    # default on the 8-device test pool: the sharded descriptor map
    rc = cli_main(["lcd", str(demo_yml), "--out", out])
    assert rc == 0
    loops = np.load(out)
    assert "frame" in loops  # ran to completion (tiny seq: likely no loops)
    # explicit mesh size + demo3-style animation output
    gif = str(tmp_path / "lcd.gif")
    rc = cli_main(["lcd", str(demo_yml), "--out", out, "--mesh", "2",
                   "--animate", gif, "--animate-frames", "3"])
    assert rc == 0
    import os
    assert os.path.getsize(gif) > 0
