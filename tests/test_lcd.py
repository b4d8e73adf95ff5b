"""Tests for the LCD layer: descriptor DB, gating, Infer API, online loop."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from overlapnet_tpu.core.config import (
    ChannelConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OverlapNetConfig,
    TrainConfig,
)
from overlapnet_tpu.lcd.descriptor_db import DescriptorDB, ShardedDescriptorDB
from overlapnet_tpu.lcd.gating import (
    CovarianceEllipse,
    candidate_mask,
    trajectory_lengths,
)
from overlapnet_tpu.models import init_params, leg_output_width, make_head_apply


@pytest.fixture(scope="module")
def head_setup(small_model_cfg_module):
    cfg = small_model_cfg_module
    params = init_params(cfg, num_channels=4, rng=0)
    return cfg, params, make_head_apply(cfg)


@pytest.fixture(scope="module")
def small_model_cfg_module():
    return ModelConfig(input_width=360)


def test_descriptor_db_matches_direct_head(head_setup):
    cfg, params, head_apply = head_setup
    w = leg_output_width(cfg)
    rng = np.random.default_rng(0)
    fvs = rng.normal(size=(5, w, 128)).astype(np.float32)
    db = DescriptorDB(head_apply, params, capacity=8, width=w)
    db.add(fvs)
    assert len(db) == 5

    idx1, idx2 = np.array([0, 2, 4]), np.array([1, 3, 0])
    ov, yaw, conf = db.score_pairs(idx1, idx2)
    direct_ov, direct_logits = head_apply(
        params, fvs[idx1], fvs[idx2]
    )
    np.testing.assert_allclose(ov, np.asarray(direct_ov).ravel(), rtol=1e-4, atol=1e-5)
    # yaw is the sub-bin parabolic peak: within half a bin of the argmax
    argmax = np.argmax(np.asarray(direct_logits), axis=-1)
    assert np.all(np.abs(yaw - argmax) <= 0.5), (yaw, argmax)


def test_descriptor_db_query_left_right_convention(head_setup):
    cfg, params, head_apply = head_setup
    w = leg_output_width(cfg)
    rng = np.random.default_rng(1)
    fvs = rng.normal(size=(4, w, 128)).astype(np.float32)
    db = DescriptorDB(head_apply, params, capacity=8, width=w)
    db.add(fvs)
    ov, yaw, conf = db.query(fvs[3], np.array([0, 1, 2]))
    # candidates are the left leg, query the right (reference infer.py:186-190)
    direct_ov, _ = head_apply(params, fvs[[0, 1, 2]], np.stack([fvs[3]] * 3))
    np.testing.assert_allclose(ov, np.asarray(direct_ov).ravel(), rtol=1e-4, atol=1e-5)


def test_descriptor_db_capacity_error(head_setup):
    cfg, params, head_apply = head_setup
    w = leg_output_width(cfg)
    db = DescriptorDB(head_apply, params, capacity=2, width=w)
    db.add(np.zeros((2, w, 128), np.float32))
    with pytest.raises(ValueError, match="capacity"):
        db.add(np.zeros((w, 128), np.float32))


def test_sharded_descriptor_db(head_setup):
    cfg, params, head_apply = head_setup
    w = leg_output_width(cfg)
    from overlapnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, devices=jax.devices("cpu"))
    rng = np.random.default_rng(2)
    fvs = rng.normal(size=(6, w, 128)).astype(np.float32)

    sdb = ShardedDescriptorDB(head_apply, params, mesh, capacity=16, width=w)
    sdb.add(fvs)
    assert len(sdb) == 6
    query = fvs[5]
    mask = np.array([True, True, False, True, False, False])
    ov, yaw, conf = sdb.query_all(query, mask)

    ref_db = DescriptorDB(head_apply, params, capacity=16, width=w)
    ref_db.add(fvs)
    ref_ov, ref_yaw, _ = ref_db.query(query, np.array([0, 1, 3]))
    np.testing.assert_allclose(ov[[0, 1, 3]], ref_ov, rtol=1e-4, atol=1e-5)
    # masked and empty rows score -1
    assert np.all(ov[[2, 4, 5]] == -1.0) and np.all(ov[6:] == -1.0)


def test_sharded_descriptor_db_topk(head_setup):
    """On-device global top-k: O(k) host transfer, parity with query_all."""
    cfg, params, head_apply = head_setup
    w = leg_output_width(cfg)
    from overlapnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, devices=jax.devices("cpu"))
    rng = np.random.default_rng(7)
    fvs = rng.normal(size=(11, w, 128)).astype(np.float32)
    sdb = ShardedDescriptorDB(head_apply, params, mesh, capacity=64, width=w)
    sdb.add(fvs)

    ov_all, yaw_all, conf_all = sdb.query_all(fvs[4])
    vals, ids, yaws, confs = sdb.query_topk(fvs[4], k=3)
    assert vals.shape == (3,) and ids.shape == (3,)  # O(k) results
    order = np.argsort(ov_all)[::-1][:3]
    np.testing.assert_array_equal(np.sort(ids), np.sort(order))
    np.testing.assert_allclose(np.sort(vals), np.sort(ov_all[order]), rtol=1e-5)
    for v, i, y, c in zip(vals, ids, yaws, confs):
        assert np.isclose(v, ov_all[i], rtol=1e-5)
        assert y == yaw_all[i]
        assert np.isclose(c, conf_all[i], rtol=1e-5)

    # candidate mask respected: only rows 0..2 eligible
    mask = np.zeros(11, bool)
    mask[:3] = True
    vals_m, ids_m, _, _ = sdb.query_topk(fvs[4], k=3, candidate_mask=mask)
    assert set(ids_m[vals_m > -1.0]) <= {0, 1, 2}


def test_descriptor_db_save_restore(head_setup, tmp_path):
    cfg, params, head_apply = head_setup
    w = leg_output_width(cfg)
    rng = np.random.default_rng(3)
    fvs = rng.normal(size=(5, w, 128)).astype(np.float32)
    db = DescriptorDB(head_apply, params, capacity=8, width=w)
    db.add(fvs)
    path = str(tmp_path / "db.npz")
    db.save(path)

    db2 = DescriptorDB(head_apply, params, capacity=8, width=w)
    assert db2.restore(path) == 5
    np.testing.assert_array_equal(db2.feature_volumes, fvs)
    ov1, _, _ = db.query(fvs[4], np.array([0, 1, 2]))
    ov2, _, _ = db2.query(fvs[4], np.array([0, 1, 2]))
    np.testing.assert_allclose(ov1, ov2, rtol=1e-5)

    # capacity guard
    tiny = DescriptorDB(head_apply, params, capacity=2, width=w)
    with pytest.raises(ValueError, match="capacity"):
        tiny.restore(path)


def test_sharded_descriptor_db_save_restore(head_setup, tmp_path):
    cfg, params, head_apply = head_setup
    w = leg_output_width(cfg)
    from overlapnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, devices=jax.devices("cpu"))
    rng = np.random.default_rng(5)
    fvs = rng.normal(size=(6, w, 128)).astype(np.float32)
    sdb = ShardedDescriptorDB(head_apply, params, mesh, capacity=16, width=w)
    sdb.add(fvs)
    path = str(tmp_path / "sdb.npz")
    sdb.save(path)

    sdb2 = ShardedDescriptorDB(head_apply, params, mesh, capacity=16, width=w)
    assert sdb2.restore(path) == 6
    ov1, _, _ = sdb.query_all(fvs[0])
    ov2, _, _ = sdb2.query_all(fvs[0])
    np.testing.assert_allclose(ov1, ov2, rtol=1e-5)


def test_covariance_ellipse_axes():
    # diagonal covariance: axes aligned, width = 2*nstd*sigma_major
    cov = np.diag([4.0, 1.0])
    e = CovarianceEllipse.from_covariance(cov, nstd=3.0)
    assert np.isclose(e.width, 12.0) and np.isclose(e.height, 6.0)
    inside = e.contains(np.array([5.9, 0.0, 0.0]), np.array([0.0, 2.9, 3.1]))
    np.testing.assert_array_equal(inside, [True, True, False])


def test_candidate_mask_gates():
    n = 300
    # straight-line trajectory, 1 m per frame
    positions = np.column_stack([np.arange(n, dtype=float), np.zeros(n)])
    traj = trajectory_lengths(positions)
    big = CovarianceEllipse(1e9, 1e9, 0.0)

    # too-early frame: nothing
    assert not candidate_mask(50, positions, traj, big).any()

    mask = candidate_mask(299, positions, traj, big, inactive_time=100, inactive_dist=50.0)
    idx = np.flatnonzero(mask)
    # candidates must be older than 100 frames and >50 m away along the path
    assert idx.max() < 199
    assert np.all(traj[299] - traj[idx] > 50.0)

    # small ellipse excludes spatially-distant frames entirely
    small = CovarianceEllipse(2.0, 2.0, 0.0)
    assert not candidate_mask(299, positions, traj, small).any()


@pytest.fixture
def infer_tree(tmp_path):
    """Preprocessed-image tree for Infer: 3 tiny scans, depth+normal."""
    rng = np.random.default_rng(4)
    h, w = 64, 360
    root = tmp_path / "data"
    for kind, ch in [("depth", None), ("normal", 3)]:
        os.makedirs(root / "07" / kind)
        for i in range(3):
            shape = (h, w) if ch is None else (h, w, ch)
            np.save(root / "07" / kind / f"{i:06d}.npy",
                    rng.normal(size=shape).astype(np.float32))
    return str(root)


@pytest.fixture
def infer_cfg(infer_tree):
    return OverlapNetConfig(
        channels=ChannelConfig(),
        model=ModelConfig(input_width=360),
        train=TrainConfig(batch_size=2),
        data=DataConfig(data_root_folder=infer_tree, infer_seqs="07"),
        experiment=ExperimentConfig(pretrained_weightsfilename=""),
    )


def test_infer_api(infer_cfg):
    from overlapnet_tpu.lcd.infer import Infer

    infer = Infer(infer_cfg, db_capacity=16)
    w = leg_output_width(infer_cfg.model)

    overlap, yaw = infer.infer_one("000000.bin", "000001.bin")
    assert 0.0 <= overlap <= 1.0
    assert -w // 2 <= int(np.atleast_1d(yaw)[0]) <= w // 2

    # incremental LCD path: embedding cache stays frame-aligned
    assert infer.infer_multiple(0, []) is None
    out = infer.infer_multiple(1, [0])
    assert out is not None and len(out[0]) == 1
    out = infer.infer_multiple(2, [0, 1])
    assert len(out[0]) == 2
    assert len(infer.feature_volumes) == 3

    # many-vs-many
    overlaps, yaws = infer.infer_multiple_vs_multiple(
        ["000000", "000001", "000002.bin"], [0, 1, 2], [2, 1, 1]
    )
    assert len(overlaps) == 3
    # self-pair (1,1) correlates maximally at zero shift
    assert int(np.atleast_1d(yaws)[1]) == 0

    # consistency: infer_one(a, b) == many-vs-many pair (a vs b)
    ov1, _ = infer.infer_one("000000.bin", "000002.bin")
    ovm, _ = infer.infer_multiple_vs_multiple(
        ["000000", "000002"], [0], [1]
    )
    np.testing.assert_allclose(ov1, np.atleast_1d(ovm)[0], rtol=1e-4, atol=1e-5)


def test_infer_no_retrace_across_calls(infer_cfg):
    """infer_one / infer_multiple_vs_multiple must share one scorer jit
    cache — a fresh trace per call was the round-2 serving regression."""
    from overlapnet_tpu.lcd.infer import Infer

    infer = Infer(infer_cfg, db_capacity=16)
    infer.infer_one("000000.bin", "000001.bin")
    infer.infer_multiple_vs_multiple(["000000", "000001"], [0], [1])
    n_entries = len(infer._scorer._jit_cache)
    for _ in range(3):
        infer.infer_one("000000.bin", "000002.bin")
        infer.infer_multiple_vs_multiple(["000001", "000002"], [0], [1])
    assert len(infer._scorer._jit_cache) == n_entries


def test_online_loop_closer(infer_cfg):
    """Synthetic square loop: frame t returns near frame 0; with relaxed
    gating thresholds the engine must evaluate candidates in order and only
    accept above the overlap threshold."""
    from overlapnet_tpu.lcd.infer import Infer
    from overlapnet_tpu.lcd.online import OnlineLoopCloser

    # 3 frames cycling through the same 3 scans; forged poses: frame 2 near 0
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[1, 0, 3] = 100.0
    poses[2, 0, 3] = 1.0

    infer = Infer(infer_cfg, db_capacity=16)
    closer = OnlineLoopCloser(
        infer,
        poses,
        covariances=None,
        inactive_time=1,  # relaxed for the tiny sequence
        inactive_dist=50.0,
        overlap_threshold=-1.0,  # accept anything that gets scored
    )
    closures = closer.run()
    # frame 2: candidates = frames older than 2 with traj gap > 50 -> frame 0
    assert len(closures) == 1
    assert closures[0].frame == 2 and closures[0].match == 0
    assert len(infer.feature_volumes) == 3  # cache stayed aligned


def test_online_loop_closer_crash_resume(infer_cfg, tmp_path):
    """Fault injection: checkpoint mid-sequence, 'crash' (fresh engine),
    resume, and finish — results must match the uninterrupted run exactly
    and no scan may be re-embedded."""
    from overlapnet_tpu.lcd.infer import Infer
    from overlapnet_tpu.lcd.online import OnlineLoopCloser

    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[1, 0, 3] = 100.0
    poses[2, 0, 3] = 1.0
    kwargs = dict(
        covariances=None, inactive_time=1, inactive_dist=50.0,
        overlap_threshold=-1.0,
    )

    # uninterrupted reference run
    full = OnlineLoopCloser(Infer(infer_cfg, db_capacity=16), poses, **kwargs)
    expected = full.run()

    # interrupted run: process 2 frames, checkpoint, crash
    closer = OnlineLoopCloser(Infer(infer_cfg, db_capacity=16), poses, **kwargs)
    closer.step(0)
    closer.step(1)
    ckpt = str(tmp_path / "lcd_session.npz")
    closer.save_checkpoint(ckpt)
    del closer

    # resume in a brand-new engine and finish
    resumed = OnlineLoopCloser(Infer(infer_cfg, db_capacity=16), poses, **kwargs)
    assert resumed.resume(ckpt) == 2
    assert len(resumed.infer.feature_volumes) == 2  # cache restored, not rebuilt
    closures = resumed.run()

    assert [(c.frame, c.match) for c in closures] == [
        (c.frame, c.match) for c in expected
    ]
    np.testing.assert_allclose(
        [c.overlap for c in closures], [c.overlap for c in expected], rtol=1e-5
    )
    np.testing.assert_array_equal(
        resumed.infer.feature_volumes, full.infer.feature_volumes
    )


def test_sharded_query_topk_batch_matches_single(head_setup):
    """One Q-query dispatch == Q single-query dispatches (per-query masks)."""
    cfg, params, head_apply = head_setup
    w = leg_output_width(cfg)
    from overlapnet_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, devices=jax.devices("cpu"))
    rng = np.random.default_rng(9)
    fvs = rng.normal(size=(10, w, 128)).astype(np.float32)
    sdb = ShardedDescriptorDB(head_apply, params, mesh, capacity=32, width=w)
    sdb.add(fvs)

    queries = fvs[[3, 7, 9]]
    masks = np.zeros((3, 10), bool)
    masks[0, :5] = True
    masks[1, 2:9] = True
    masks[2, :] = True
    vals_b, ids_b, yaws_b, confs_b = sdb.query_topk_batch(
        queries, k=2, candidate_mask=masks
    )
    assert vals_b.shape == (3, 2)
    for qi in range(3):
        vals, ids, yaws, confs = sdb.query_topk(
            queries[qi], k=2, candidate_mask=masks[qi]
        )
        np.testing.assert_allclose(vals_b[qi], vals, rtol=1e-5)
        np.testing.assert_array_equal(ids_b[qi], ids)
        np.testing.assert_allclose(yaws_b[qi], yaws, rtol=1e-5, atol=1e-4)


def test_online_loop_closer_mesh_matches_single(infer_cfg):
    """The wired serving path on a mesh (ShardedDescriptorDB inside Infer,
    device-side top-1) must produce the same closures as the single-device
    engine."""
    from overlapnet_tpu.lcd.infer import Infer
    from overlapnet_tpu.lcd.online import OnlineLoopCloser
    from overlapnet_tpu.parallel.mesh import make_mesh

    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[1, 0, 3] = 100.0
    poses[2, 0, 3] = 1.0
    kwargs = dict(
        covariances=None, inactive_time=1, inactive_dist=50.0,
        overlap_threshold=-1.0,
    )

    single = OnlineLoopCloser(Infer(infer_cfg, db_capacity=16), poses, **kwargs)
    expected = single.run()

    mesh = make_mesh(8, devices=jax.devices("cpu"))
    meshed = OnlineLoopCloser(
        Infer(infer_cfg, db_capacity=16, mesh=mesh), poses, **kwargs
    )
    got = meshed.run()

    assert len(got) == len(expected) == 1
    for a, b in zip(got, expected):
        assert (a.frame, a.match) == (b.frame, b.match)
        np.testing.assert_allclose(a.overlap, b.overlap, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(a.yaw_deg, b.yaw_deg, rtol=1e-3, atol=1e-3)


def test_fused_frame_step_matches_sequential_path():
    """The fused single-dispatch serving step (embed + insert + masked
    top-1, ShardedDescriptorDB.frame_step) must match the sequential
    embed-then-query path frame for frame (VERDICT r5 ask #2)."""
    import jax as _jax

    from overlapnet_tpu.lcd.infer import Infer
    from overlapnet_tpu.models import make_leg_apply
    from overlapnet_tpu.parallel.mesh import make_mesh

    cfg = OverlapNetConfig()
    cfg.model = ModelConfig(input_width=360)
    rng = np.random.default_rng(0)
    n = 8
    imgs = rng.normal(size=(n, 64, 360, 4)).astype(np.float32) * 0.1

    fused = Infer(cfg, db_capacity=32, mesh=make_mesh(2))
    seq = Infer(cfg, params=fused.params, db_capacity=32)
    leg = _jax.jit(make_leg_apply(cfg.model))

    pend, expected = [], []
    for i in range(n):
        cands = list(range(max(0, i - 6), max(0, i - 2)))
        pend.append(fused.dispatch_frame(i, cands, image=imgs[i]))
        fvi = np.asarray(leg(seq.params, imgs[i][None]))[0]
        expected.append(seq.query_best(i, cands, fv=fvi))
    for p, b in zip(pend, expected):
        a = p.result
        if a is None or b is None:
            assert a == b, (a, b)
            continue
        assert a[0] == b[0], (a, b)
        np.testing.assert_allclose(a[1], b[1], atol=2e-5)
        np.testing.assert_allclose(a[2], b[2], atol=1e-3)
        np.testing.assert_allclose(a[3], b[3], atol=2e-5)


def test_pipelined_run_matches_sequential_steps(infer_cfg):
    """run(pipeline_depth=4) == one step() per frame: pipelining only
    overlaps device round trips, never changes results."""
    from overlapnet_tpu.lcd.infer import Infer
    from overlapnet_tpu.lcd.online import OnlineLoopCloser
    from overlapnet_tpu.parallel.mesh import make_mesh

    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[1, 0, 3] = 100.0
    poses[2, 0, 3] = 1.0
    kwargs = dict(
        covariances=None, inactive_time=1, inactive_dist=50.0,
        overlap_threshold=-1.0,
    )

    stepped = OnlineLoopCloser(
        Infer(infer_cfg, db_capacity=16, mesh=make_mesh(2)), poses, **kwargs
    )
    for i in range(3):
        stepped.step(i)

    piped = OnlineLoopCloser(
        Infer(infer_cfg, db_capacity=16, mesh=make_mesh(2)), poses, **kwargs
    )
    got = piped.run(pipeline_depth=4)

    assert [(c.frame, c.match) for c in got] == [
        (c.frame, c.match) for c in stepped.closures
    ]
    np.testing.assert_allclose(
        [c.overlap for c in got], [c.overlap for c in stepped.closures],
        rtol=1e-5,
    )
