"""Training-step tests: loss oracles, optimizer/schedule parity, SPMD step on
the 8-device virtual mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from overlapnet_tpu.core.config import OverlapNetConfig
from overlapnet_tpu.train.losses import (
    combined_loss,
    orientation_target,
    sigmoid_overlap_loss,
    weighted_orientation_entropy,
)
from overlapnet_tpu.train.schedule import reference_lr_schedule


def small_cfg(batch_size=4):
    cfg = OverlapNetConfig()
    cfg.model.input_width = 360
    cfg.train.batch_size = batch_size
    # Mechanism-parity tests (DP vs single device, resident vs host) compare
    # numeric paths at float32 tolerances; the bf16 leg default is gated
    # separately by test_golden's serving-tolerance check.
    cfg.model = dataclasses.replace(cfg.model, leg_dtype="float32")
    return cfg


def make_batch(cfg, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    b = cfg.train.batch_size
    return {
        "x1": rng.normal(size=(b, 64, cfg.model.input_width, 4)).astype(np.float32),
        "x2": rng.normal(size=(b, 64, cfg.model.input_width, 4)).astype(np.float32),
        "overlap": rng.uniform(size=(b,)).astype(np.float32),
        "orientation": rng.integers(0, 90, size=(b,)).astype(np.int32),
    }


def test_sigmoid_loss_oracle():
    # 1/(1+exp(-((|d|+0.25)*24-12))) (training.py:77-81)
    pred = jnp.asarray([0.5, 0.9])
    true = jnp.asarray([0.5, 0.1])
    # d=0 -> sigmoid(-6); d=0.8 -> sigmoid(13.2)
    expected = np.mean([1 / (1 + np.exp(6.0)), 1 / (1 + np.exp(-13.2))])
    got = float(sigmoid_overlap_loss(pred, true))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_orientation_target_oracle():
    tgt = np.asarray(orientation_target(jnp.asarray([2, 0]), jnp.asarray([0.9, 0.3]), 4))
    expected = np.zeros((2, 4), np.float32)
    expected[0, 2] = 0.9
    expected[1, 0] = 0.3
    np.testing.assert_allclose(tgt, expected)


def test_weighted_entropy_oracle():
    """Match tf.nn.weighted_cross_entropy_with_logits semantics via the
    unstable textbook formula on safe values."""
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 8)).astype(np.float32)
    target = rng.uniform(size=(3, 8)).astype(np.float32)
    pw = 8.0
    z = (target > 0.7).astype(np.float64)
    x = logits.astype(np.float64)
    # textbook: -[pw * z * log(sig(x)) + (1-z) * log(1 - sig(x))]
    sig = 1 / (1 + np.exp(-x))
    expected = -(pw * z * np.log(sig) + (1 - z) * np.log(1 - sig))
    got = float(weighted_orientation_entropy(jnp.asarray(logits), jnp.asarray(target), pw))
    np.testing.assert_allclose(got, expected.mean(), rtol=1e-5)


def test_lr_schedule_oracle():
    sched = reference_lr_schedule(0.001, 0.99, steps_per_epoch=10)
    assert np.isclose(float(sched(0)), 0.0001)  # epoch 0: 0.1x
    assert np.isclose(float(sched(9)), 0.0001)
    assert np.isclose(float(sched(10)), 0.001)  # epoch 1: alpha^0
    assert np.isclose(float(sched(25)), 0.001 * 0.99)  # epoch 2
    assert np.isclose(float(sched(105)), 0.001 * 0.99**9)


def test_train_step_single_device_decreases_loss():
    cfg = small_cfg()
    from overlapnet_tpu.train.trainer import create_train_state, make_train_step

    state, tx = create_train_state(cfg, steps_per_epoch=100, rng=0)
    step = make_train_step(cfg, tx)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_train_step_multichip_mesh():
    """The full DP train step must compile and run on the 8-device CPU mesh."""
    cfg = small_cfg(batch_size=8)
    from overlapnet_tpu.parallel.mesh import make_mesh, shard_batch
    from overlapnet_tpu.train.trainer import create_train_state, make_train_step

    mesh = make_mesh(8)
    state, tx = create_train_state(cfg, steps_per_epoch=10, rng=0)
    step = make_train_step(cfg, tx, mesh)
    with mesh:
        batch = shard_batch(mesh, make_batch(cfg))
        state = jax.device_put(
            state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        )
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_dp_matches_single_device():
    """Data-parallel gradients must equal single-device gradients."""
    cfg = small_cfg(batch_size=8)
    from overlapnet_tpu.parallel.mesh import make_mesh, shard_batch
    from overlapnet_tpu.train.trainer import create_train_state, make_train_step

    batch_np = make_batch(cfg, rng_seed=3)

    state1, tx1 = create_train_state(cfg, steps_per_epoch=10, rng=0)
    step1 = make_train_step(cfg, tx1)
    s1, m1 = step1(state1, {k: jnp.asarray(v) for k, v in batch_np.items()})

    mesh = make_mesh(8)
    state8, tx8 = create_train_state(cfg, steps_per_epoch=10, rng=0)
    step8 = make_train_step(cfg, tx8, mesh)
    with mesh:
        s8, m8 = step8(state8, shard_batch(mesh, batch_np))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    k1 = np.asarray(s1.params["params"]["legs"]["s_conv1"]["kernel"])
    k8 = np.asarray(s8.params["params"]["legs"]["s_conv1"]["kernel"])
    np.testing.assert_allclose(k1, k8, rtol=1e-4, atol=1e-6)


def test_frozen_legs_do_not_update():
    cfg = small_cfg()
    cfg.model.legs_trainable = False
    from overlapnet_tpu.train.trainer import create_train_state, make_train_step

    state, tx = create_train_state(cfg, steps_per_epoch=10, rng=0)
    before = np.asarray(state.params["params"]["legs"]["s_conv1"]["kernel"]).copy()
    head_before = np.asarray(
        state.params["params"]["overlap_head"]["c_conv2"]["kernel"]
    ).copy()
    step = make_train_step(cfg, tx)
    state, _ = step(state, {k: jnp.asarray(v) for k, v in make_batch(cfg).items()})
    after = np.asarray(state.params["params"]["legs"]["s_conv1"]["kernel"])
    head_after = np.asarray(state.params["params"]["overlap_head"]["c_conv2"]["kernel"])
    np.testing.assert_array_equal(before, after)
    assert not np.array_equal(head_before, head_after)


def test_checkpoint_save_restore_roundtrip(tmp_path):
    """orbax checkpoint: state survives save -> restore (params, opt_state,
    step) — the restart-safety the reference lacks (training.py:346-349)."""
    from overlapnet_tpu.train.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from overlapnet_tpu.train.trainer import create_train_state, make_train_step

    cfg = small_cfg()
    state, tx = create_train_state(cfg, steps_per_epoch=2, rng=0)
    step_fn = make_train_step(cfg, tx)
    state, _ = step_fn(state, make_batch(cfg))
    state, _ = step_fn(state, make_batch(cfg, 1))

    ckpt = str(tmp_path / "ckpt")
    saved_step = save_checkpoint(ckpt, state)
    assert saved_step == 2
    assert latest_step(ckpt) == 2

    fresh, _ = create_train_state(cfg, steps_per_epoch=2, rng=123)
    restored = restore_checkpoint(ckpt, fresh)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # training continues identically from the restored state
    b3 = make_batch(cfg, 2)
    s1, m1 = step_fn(state, b3)
    s2, m2 = step_fn(restored, b3)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)


def test_params_npz_roundtrip(tmp_path):
    from overlapnet_tpu.models import init_params
    from overlapnet_tpu.train.checkpoint import load_params_npz, save_params_npz

    cfg = small_cfg()
    params = init_params(cfg.model, 4, rng=0)
    path = str(tmp_path / "params.npz")
    save_params_npz(path, params)
    other = init_params(cfg.model, 4, rng=9)
    loaded = load_params_npz(path, other)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)


def test_train_step_bfloat16_inputs():
    """bf16 image batches (host transfer optimization) must train: finite
    loss, close to the f32 loss at init."""
    import ml_dtypes

    cfg = small_cfg()
    from overlapnet_tpu.train.trainer import create_train_state, make_train_step

    state, tx = create_train_state(cfg, steps_per_epoch=100, rng=0)
    step = make_train_step(cfg, tx)
    batch = make_batch(cfg)
    bf16 = {
        **batch,
        "x1": batch["x1"].astype(ml_dtypes.bfloat16),
        "x2": batch["x2"].astype(ml_dtypes.bfloat16),
    }
    state_f32, m_f32 = step(state, {k: jnp.asarray(v) for k, v in batch.items()})

    state2, _ = create_train_state(cfg, steps_per_epoch=100, rng=0)
    state_bf, m_bf = step(state2, {k: jnp.asarray(v) for k, v in bf16.items()})
    assert np.isfinite(float(m_bf["loss"]))
    np.testing.assert_allclose(
        float(m_bf["loss"]), float(m_f32["loss"]), rtol=0.05
    )


def test_dataset_bfloat16_batches(tmp_path):
    """PairImageDataset input_dtype='bfloat16' yields bf16 image tensors."""
    import ml_dtypes
    import os

    from overlapnet_tpu.core.config import ChannelConfig
    from overlapnet_tpu.data.dataset import PairImageDataset
    from overlapnet_tpu.data.gt_files import PairList

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "07" / "depth")
    os.makedirs(tmp_path / "07" / "normal")
    for i in range(2):
        np.save(tmp_path / "07" / "depth" / f"{i:06d}.npy",
                rng.normal(size=(64, 360)).astype(np.float32))
        np.save(tmp_path / "07" / "normal" / f"{i:06d}.npy",
                rng.normal(size=(64, 360, 3)).astype(np.float32))
    pairs = PairList(["000000"], ["000001"], ["07"], ["07"],
                     np.array([0.5]), np.array([10.0]))
    ds = PairImageDataset(str(tmp_path), pairs, channels=ChannelConfig(),
                          height=64, width=360)
    (b,) = list(ds.batches(1, input_dtype="bfloat16"))
    assert b["x1"].dtype == ml_dtypes.bfloat16
    assert b["overlap"].dtype == np.float32
    (b32,) = list(ds.batches(1))
    np.testing.assert_allclose(
        b["x1"].astype(np.float32), b32["x1"], rtol=0.01, atol=0.01
    )


def test_resident_step_matches_host_step():
    """Device-resident gather+roll train step == host-assembled-batch step
    (same params, same math, only the data path differs)."""
    from overlapnet_tpu.train.trainer import (
        create_train_state,
        make_resident_train_step,
        make_train_step,
    )

    cfg = small_cfg(batch_size=4)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(6, 64, cfg.model.input_width, 4)).astype(np.float32)
    i1 = np.array([0, 2, 4, 1], np.int32)
    i2 = np.array([1, 3, 5, 0], np.int32)
    shift = np.array([0, 5, 359, 123], np.int32)
    overlap = rng.uniform(size=4).astype(np.float32)
    orientation = rng.integers(0, 90, size=4).astype(np.int32)

    host_batch = {
        "x1": images[i1],
        "x2": np.stack([np.roll(images[i2[k]], int(shift[k]), axis=1)
                        for k in range(4)]),
        "overlap": overlap,
        "orientation": orientation,
    }
    res_batch = {"i1": i1, "i2": i2, "shift": shift,
                 "overlap": overlap, "orientation": orientation}

    state_h, tx = create_train_state(cfg, steps_per_epoch=4, rng=0)
    state_r, _ = create_train_state(cfg, steps_per_epoch=4, rng=0)
    step_h = make_train_step(cfg, tx)
    step_r = make_resident_train_step(cfg, tx)
    state_h, mh = step_h(state_h, host_batch)
    state_r, mr = step_r(state_r, jnp.asarray(images), res_batch)
    np.testing.assert_allclose(float(mh["loss"]), float(mr["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state_h.params), jax.tree.leaves(state_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_resident_pairs_reconstruct_host_batches(tmp_path):
    """ResidentPairs index batches must reconstruct PairImageDataset's host
    batches exactly (same shuffle stream, same shift draws)."""
    import os

    from overlapnet_tpu.core.config import ChannelConfig
    from overlapnet_tpu.data.dataset import PairImageDataset, ResidentPairs
    from overlapnet_tpu.data.gt_files import PairList

    rng = np.random.default_rng(3)
    root = tmp_path / "imgs"
    h, w = 8, 12
    for kind, ch in [("depth", None), ("normal", 3)]:
        os.makedirs(root / "07" / kind)
        for i in range(6):
            shape = (h, w) if ch is None else (h, w, ch)
            np.save(root / "07" / kind / f"{i:06d}.npy",
                    rng.normal(size=shape).astype(np.float32))

    n = 10
    i1 = rng.integers(0, 6, n)
    i2 = rng.integers(0, 6, n)
    pairs = PairList(["%06d" % i for i in i1], ["%06d" % i for i in i2],
                     ["07"] * n, ["07"] * n,
                     rng.uniform(0, 1, n), rng.integers(0, 360, n).astype(float))
    ch = ChannelConfig()
    ds = PairImageDataset(str(root), pairs, ch, height=h, width=w,
                          rotate_data=1, seed=7)
    resident = ResidentPairs(ds)
    imgs = np.asarray(resident.images)

    host = list(ds.batches(4, epoch=0, shuffle=True, drop_remainder=True))
    res = list(resident.batches(4, epoch=0, shuffle=True, drop_remainder=True))
    assert len(host) == len(res)
    for hb, rb in zip(host, res):
        np.testing.assert_allclose(hb["x1"], imgs[rb["i1"]], rtol=1e-6)
        x2 = np.stack([
            np.roll(imgs[rb["i2"][k]], int(rb["shift"][k]), axis=1)
            for k in range(len(rb["i2"]))
        ])
        np.testing.assert_allclose(hb["x2"], x2, rtol=1e-6)
        np.testing.assert_allclose(hb["overlap"], rb["overlap"])
        np.testing.assert_array_equal(hb["orientation"], rb["orientation"])


def test_correlation_release_epoch_gates_leg_gradient():
    """Staged yaw training: with correlation_stop_gradient on, the
    orientation CE reaches the legs only from correlation_release_epoch on."""
    from overlapnet_tpu.train.trainer import Trainer

    cfg = small_cfg(batch_size=4)
    cfg.model = dataclasses.replace(
        cfg.model, correlation_stop_gradient=True,
        correlation_normalize="cosine",
    )
    cfg.train.overlap_loss_weight = 0.0  # orientation CE is the only loss
    cfg.train.orientation_loss_weight = 1.0
    cfg.train.correlation_release_epoch = 1
    cfg.train.optimizer = "adam"

    trainer = Trainer(cfg, steps_per_epoch=1)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg).items()}

    k0 = np.asarray(trainer.state.params["params"]["legs"]["s_conv1"]["kernel"]).copy()
    trainer.run_epoch(iter([batch]), epoch=0)
    k1 = np.asarray(trainer.state.params["params"]["legs"]["s_conv1"]["kernel"])
    np.testing.assert_array_equal(k0, k1)  # stop-gradient active

    trainer.run_epoch(iter([batch]), epoch=1)
    k2 = np.asarray(trainer.state.params["params"]["legs"]["s_conv1"]["kernel"])
    assert not np.array_equal(k1, k2)  # released: CE now trains the legs


def test_mesh_eval_matches_single_device():
    """Sharded evaluation (mesh 'data' axis, padded ragged batches) must
    reproduce the host-path metrics exactly."""
    from overlapnet_tpu.parallel.mesh import make_mesh
    from overlapnet_tpu.train.trainer import Trainer

    cfg = small_cfg(batch_size=5)  # 5 rows: ragged vs the 8-device mesh
    batch = make_batch(cfg, rng_seed=11)
    batch["overlap"] = np.clip(batch["overlap"] + 0.5, 0, 1)  # some >0.7

    t1 = Trainer(cfg, steps_per_epoch=1)
    m1 = t1.evaluate([batch])

    t8 = Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(8))
    m8 = t8.evaluate([batch])

    assert set(m1) == set(m8)
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_multi_step_dispatch_matches_single():
    """K fused steps per dispatch (lax.scan) must produce exactly the same
    parameters and losses as K sequential single-step dispatches."""
    from overlapnet_tpu.data.dataset import ResidentPairs
    from overlapnet_tpu.train.trainer import Trainer

    class FakeResident:
        """Minimal ResidentPairs stand-in: fixed images + index stream."""

        def __init__(self, images, batches):
            self.images = jnp.asarray(images)
            self._batches = batches

        def batches(self, batch_size, epoch=0, shuffle=True, drop_remainder=True):
            return iter(self._batches)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(6, 64, 360, 4)).astype(np.float32)
    bs = 4
    batches = []
    for i in range(6):  # 6 steps: one full K=4 group + 2 tail singles
        r = np.random.default_rng(i)
        batches.append({
            "i1": r.integers(0, 6, bs).astype(np.int32),
            "i2": r.integers(0, 6, bs).astype(np.int32),
            "shift": r.integers(0, 360, bs).astype(np.int32),
            "overlap": r.uniform(size=bs).astype(np.float32),
            "orientation": r.integers(0, 90, bs).astype(np.int32),
        })
    res = FakeResident(images, batches)

    cfg1 = small_cfg(batch_size=bs)
    cfg1.train.steps_per_dispatch = 1
    t1 = Trainer(cfg1, steps_per_epoch=6)
    m1 = t1.run_epoch_resident(res, bs)

    cfgk = small_cfg(batch_size=bs)
    cfgk.train.steps_per_dispatch = 4
    tk = Trainer(cfgk, steps_per_epoch=6)
    mk = tk.run_epoch_resident(res, bs)

    # rtol 1e-5: the scanned body may fuse slightly differently than the
    # standalone jit (same math, different op order in the last ulp)
    np.testing.assert_allclose(m1["epoch_loss"], mk["epoch_loss"], rtol=1e-5)
    # params: the scanned body fuses slightly differently than the
    # standalone jit, and adagrad's 1/sqrt(accum) amplifies last-ulp
    # differences over steps — identical step SEQUENCE is what we assert,
    # at a tolerance far below one optimizer step's magnitude.
    for a, b in zip(jax.tree.leaves(t1.state.params), jax.tree.leaves(tk.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=3e-4)
    assert int(t1.state.step) == int(tk.state.step) == 6


def test_soft_yaw_supervision_ramp():
    """soft_overlap_min replaces the hard binarization with a linear ramp:
    band pairs (soft < overlap < hard) get a positive CE target at their
    yaw bin, sub-soft pairs stay all-negative, and soft=-1 reproduces the
    reference cutoff exactly."""
    import jax.numpy as jnp

    from overlapnet_tpu.train.losses import (
        orientation_target,
        weighted_orientation_entropy,
    )

    rng = np.random.default_rng(0)
    w = 36
    logits = jnp.asarray(rng.normal(size=(3, w)).astype(np.float32))
    bins = jnp.asarray([4, 9, 20])
    overlaps = jnp.asarray([0.5, 0.8, 0.2])  # band, above-hard, below-soft
    target = orientation_target(bins, overlaps, w)

    hard = float(
        weighted_orientation_entropy(logits, target, pos_weight=float(w))
    )
    soft_off = float(
        weighted_orientation_entropy(
            logits, target, pos_weight=float(w), soft_overlap_min=-1.0
        )
    )
    assert hard == soft_off  # default disabled == reference parity

    # manual oracle for the soft ramp
    z = np.clip((np.asarray(target) - 0.3) / (0.7 - 0.3), 0.0, 1.0)
    x = np.asarray(logits)
    lw = 1.0 + (w - 1.0) * z
    expect = np.mean(
        (1.0 - z) * x + lw * (np.log1p(np.exp(-np.abs(x))) + np.maximum(-x, 0))
    )
    got = float(
        weighted_orientation_entropy(
            logits, target, pos_weight=float(w), soft_overlap_min=0.3
        )
    )
    np.testing.assert_allclose(got, expect, rtol=1e-5)

    # the band pair's z at its bin is the ramp value, not 0/1
    assert abs(z[0, 4] - 0.5) < 1e-6
    assert z[1, 9] == 1.0
    assert z[2, 20] == 0.0


def test_soft_yaw_band_trains_yaw_where_hard_cutoff_does_not():
    """With soft supervision, a band pair's (overlap 0.5) yaw bin logit
    rises under gradient descent; with the hard cutoff it is pushed DOWN
    (all-negative target) — the mechanism behind the r04 yaw cliff."""
    import jax

    from overlapnet_tpu.train.losses import (
        orientation_target,
        weighted_orientation_entropy,
    )

    w = 36
    logits = jnp.zeros((1, w))
    target = orientation_target(jnp.asarray([7]), jnp.asarray([0.5]), w)

    def g(soft):
        return jax.grad(
            lambda l: weighted_orientation_entropy(
                l, target, pos_weight=float(w), soft_overlap_min=soft
            )
        )(logits)

    assert float(g(-1.0)[0, 7]) > 0.0  # hard cutoff: bin treated as negative
    assert float(g(0.3)[0, 7]) < 0.0  # soft ramp: bin pushed up
