"""pjit training loop.

Replaces the reference's single-GPU keras ``fit_generator`` epoch loop
(reference: training.py:336-420) with an SPMD train step jitted over an
explicit device mesh: parameters and optimizer state replicated, the pair
batch sharded over the 'data' axis. XLA inserts the gradient psum.

Optimizer parity: keras Adagrad(lr) with zero-initialized accumulator and
eps=1e-7 (training.py:253) == optax.adagrad(initial_accumulator_value=0.0,
eps=1e-7); LR schedule from train.schedule. Loss weights 5:1
(training.py:257). The 'Fixed' legs variant (generateNet.py:222-324) is a
gradient mask here instead of a duplicate frozen module.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from overlapnet_tpu.core.config import OverlapNetConfig
from overlapnet_tpu.models import build_model, init_params, leg_output_width
from overlapnet_tpu.ops.yaw import peak_to_degrees, ref_bins_to_degrees, target_bins
from overlapnet_tpu.train.losses import combined_loss, orientation_target
from overlapnet_tpu.train.schedule import reference_lr_schedule

Params = Any


class TrainState(struct.PyTreeNode):
    params: Params
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(cfg: OverlapNetConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = reference_lr_schedule(
        cfg.train.learning_rate, cfg.train.lr_alpha, steps_per_epoch
    )
    if cfg.train.optimizer == "adam":
        tx = optax.adam(learning_rate=schedule)
    elif cfg.train.optimizer == "adagrad":
        tx = optax.adagrad(
            learning_rate=schedule, initial_accumulator_value=0.0, eps=1e-7
        )
    else:
        raise ValueError(
            f"unknown optimizer {cfg.train.optimizer!r} (adagrad|adam)"
        )
    if cfg.train.grad_clip_norm > 0:
        # Group-wise clip: the orientation head's few params (the learnable
        # correlation scale) see CE gradients orders of magnitude larger
        # than the conv stack's, especially with the soft yaw band; a single
        # global norm would let that one gradient scale DOWN the leg/overlap
        # gradients every step (measured: overlap RMS stuck above untrained
        # at miniature scale). Clipping each group by its own norm keeps the
        # heads' training dynamics independent.
        def clip_label_fn(params):
            return jax.tree.map_with_path(
                lambda path, _: "orient"
                if any(
                    getattr(k, "key", None) == "orientation_head"
                    for k in path
                )
                else "main",
                params,
            )

        clip = optax.clip_by_global_norm(cfg.train.grad_clip_norm)
        tx = optax.chain(
            optax.multi_transform(
                {"main": clip,
                 "orient": optax.clip_by_global_norm(cfg.train.grad_clip_norm)},
                clip_label_fn,
            ),
            tx,
        )
    if not cfg.model.legs_trainable:
        # Freeze the legs: zero their updates (360OutputkLegsFixed semantics).
        def label_fn(params):
            return jax.tree.map_with_path(
                lambda path, _: "frozen"
                if any(getattr(k, "key", None) == "legs" for k in path)
                else "trained",
                params,
            )

        tx = optax.multi_transform(
            {"trained": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx


def create_train_state(
    cfg: OverlapNetConfig, steps_per_epoch: int, rng: int | jax.Array = 0
) -> tuple[TrainState, optax.GradientTransformation]:
    params = init_params(cfg.model, cfg.num_input_channels, rng)
    tx = make_optimizer(cfg, steps_per_epoch)
    return (
        TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)),
        tx,
    )


def make_train_step(
    cfg: OverlapNetConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
) -> Callable[[TrainState, Mapping[str, jax.Array]], tuple[TrainState, dict]]:
    """Build the jitted SPMD train step.

    Batch dict: x1, x2 (B, H, W, C) range-image pairs; overlap (B,);
    orientation (B,) integer yaw bins.
    """
    model = build_model(cfg.model)
    output_size = leg_output_width(cfg.model)
    pos_weight = float(output_size)  # network_output_size (training.py:243)

    def loss_fn(params, batch):
        overlap_pred, orient_logits = model.apply(params, batch["x1"], batch["x2"])
        target_vec = orientation_target(
            target_bins(batch["orientation"], cfg.model),
            batch["overlap"],
            output_size,
        )
        return combined_loss(
            overlap_pred,
            orient_logits,
            batch["overlap"],
            target_vec,
            pos_weight=pos_weight,
            min_overlap_for_angle=cfg.train.min_overlap_for_angle,
            overlap_weight=cfg.train.overlap_loss_weight,
            orientation_weight=cfg.train.orientation_loss_weight,
            mask_zero_orientation=cfg.train.mask_zero_orientation,
            soft_overlap_min=cfg.train.yaw_soft_overlap_min,
        )

    def step_fn(state: TrainState, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {**metrics, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {"x1": data, "x2": data, "overlap": data, "orientation": data}
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def _resident_step_fn(cfg: OverlapNetConfig, tx: optax.GradientTransformation):
    """Raw (un-jitted) resident train step (state, images, batch) ->
    (state, metrics); shared by the single-step and scanned-multi-step
    wrappers."""
    model = build_model(cfg.model)
    output_size = leg_output_width(cfg.model)
    pos_weight = float(output_size)

    def loss_fn(params, images, batch):
        x1 = images[batch["i1"]]
        x2 = images[batch["i2"]]
        w = x2.shape[2]

        def roll_one(img, s):
            # np.roll(img, +s, axis=1): out[:, j] = img[:, (j - s) % w]
            cols = jnp.mod(jnp.arange(w) - s, w)
            return jnp.take(img, cols, axis=1)

        x2 = jax.vmap(roll_one)(x2, batch["shift"])
        overlap_pred, orient_logits = model.apply(params, x1, x2)
        target_vec = orientation_target(
            target_bins(batch["orientation"], cfg.model),
            batch["overlap"],
            output_size,
        )
        return combined_loss(
            overlap_pred,
            orient_logits,
            batch["overlap"],
            target_vec,
            pos_weight=pos_weight,
            min_overlap_for_angle=cfg.train.min_overlap_for_angle,
            overlap_weight=cfg.train.overlap_loss_weight,
            orientation_weight=cfg.train.orientation_loss_weight,
            mask_zero_orientation=cfg.train.mask_zero_orientation,
            soft_overlap_min=cfg.train.yaw_soft_overlap_min,
        )

    def step_fn(state: TrainState, images, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, images, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )
        metrics = {**metrics, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return step_fn


def make_resident_train_step(
    cfg: OverlapNetConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
):
    """Train step over a device-resident scan store (data.dataset.
    ResidentPairs): signature (state, images (N, H, W, C) on device,
    batch {i1, i2, shift, overlap, orientation}). Pair gathers and the
    rotate_data circular shift (host semantics: np.roll(x2, +shift, axis=1))
    run inside the jitted step, so only O(batch) integers cross the link."""
    step_fn = _resident_step_fn(cfg, tx)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {
        k: data for k in ("i1", "i2", "shift", "overlap", "orientation")
    }
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_resident_multi_step(
    cfg: OverlapNetConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
):
    """K train steps per dispatch: ``lax.scan`` over stacked index batches.

    On a remote-TPU link every dispatch costs ~the link latency, which at
    small step times dominates the epoch (measured: 29 ms/step wall vs
    ~9 ms compute at batch 32). Signature: (state, images,
    batches {each (K, B, ...)}) -> (state, {losses (K,), grad_norm (K,)}).
    Semantically identical to K sequential make_resident_train_step calls
    (parity test in tests/test_train.py)."""
    step_fn = _resident_step_fn(cfg, tx)

    def multi_fn(state: TrainState, images, batches):
        def body(s, batch):
            s2, metrics = step_fn(s, images, batch)
            return s2, (metrics["loss"], metrics["grad_norm"])

        state, (losses, gnorms) = jax.lax.scan(body, state, batches)
        return state, {"loss": losses, "grad_norm": gnorms}

    if mesh is None:
        return jax.jit(multi_fn, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data"))
    batch_shardings = {
        k: data for k in ("i1", "i2", "shift", "overlap", "orientation")
    }
    return jax.jit(
        multi_fn,
        in_shardings=(repl, repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: OverlapNetConfig, mesh: Mesh | None = None):
    """Jitted forward producing (overlap (B,), yaw peak (B,) float sub-bin
    positions) for the validation metrics of the reference epoch loop
    (training.py:352-416). The sub-bin parabolic peak replaces the raw
    argmax (same convention as serving, ops.correlation.subbin_peak)."""
    from overlapnet_tpu.ops.correlation import subbin_peak

    model = build_model(cfg.model)

    def eval_fn(params, batch):
        overlap_pred, orient_logits = model.apply(params, batch["x1"], batch["x2"])
        return jnp.reshape(overlap_pred, (-1,)), subbin_peak(orient_logits)

    if mesh is None:
        return jax.jit(eval_fn)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {"x1": data, "x2": data}
    return jax.jit(
        eval_fn,
        in_shardings=(repl, {**batch_shardings}),
        out_shardings=(data, data),
    )


@dataclasses.dataclass
class Trainer:
    """Epoch-driven trainer mirroring the reference loop: per-epoch training,
    checkpoint save, validation metrics (overlap mean/max/RMS; yaw RMS at
    overlap thresholds 0.3-0.9, reference training.py:336-420)."""

    cfg: OverlapNetConfig
    steps_per_epoch: int
    mesh: Mesh | None = None

    def __post_init__(self):
        if (
            self.cfg.train.rotate_adjust_yaw_labels
            and self.cfg.train.rotate_training_data > 0
            and self.cfg.model.yaw_space == "reference"
        ):
            raise ValueError(
                "rotate_adjust_yaw_labels=True requires yaw_space="
                "'calibrated' (shift-adjusted labels are contradictory "
                "supervision in the reference yaw space)"
            )
        self.state, self.tx = create_train_state(self.cfg, self.steps_per_epoch, self.cfg.train.seed)
        if self.mesh is not None:
            # explicit replicated placement (required in multi-process mode,
            # where jit cannot auto-put host-local arrays onto a global mesh)
            from overlapnet_tpu.parallel.mesh import put_replicated

            self.state = jax.tree.map(
                lambda x: put_replicated(self.mesh, x), self.state
            )
        self.train_step = make_train_step(self.cfg, self.tx, self.mesh)
        self.eval_step = make_eval_step(self.cfg, self.mesh)

    def _released_cfg(self) -> OverlapNetConfig:
        """Config copy with the correlation stop-gradient lifted (staged yaw
        training, TrainConfig.correlation_release_epoch)."""
        return dataclasses.replace(
            self.cfg,
            model=dataclasses.replace(
                self.cfg.model, correlation_stop_gradient=False
            ),
        )

    def _release_active(self, epoch: int) -> bool:
        r = self.cfg.train.correlation_release_epoch
        return (
            r >= 0
            and epoch >= r
            and self.cfg.model.correlation_stop_gradient
        )

    # cap on dispatched-but-unfetched steps: bounds device memory held by
    # in-flight batches without paying a host<->device round trip per step
    # (on a remote-TPU link a per-step sync costs ~the link latency and
    # dominates the epoch — the round-2 trainer did exactly that)
    pipeline_depth: int = 32

    def run_epoch(self, batches, epoch: int = 0) -> dict:
        if self._release_active(epoch):
            if getattr(self, "_train_step_released", None) is None:
                self._train_step_released = make_train_step(
                    self._released_cfg(), self.tx, self.mesh
                )
            step = self._train_step_released
        else:
            step = self.train_step
        return self._run_loop(batches, lambda b: step(self.state, b))

    def _resident_fns(self, released: bool, fused: bool):
        """(single-step, K-step-or-None) jitted fns for the given release
        state, cached per state (each compiled at most once)."""
        cache = getattr(self, "_fn_cache", None)
        if cache is None:
            cache = self._fn_cache = {}
        cfg = self._released_cfg() if released else self.cfg
        k1 = ("resident", released)
        if k1 not in cache:
            cache[k1] = make_resident_train_step(cfg, self.tx, self.mesh)
        if not fused:
            return cache[k1], None
        k2 = ("resident_multi", released)
        if k2 not in cache:
            cache[k2] = make_resident_multi_step(cfg, self.tx, self.mesh)
        return cache[k1], cache[k2]

    def run_epoch_resident(
        self, resident, batch_size: int, epoch: int = 0, shuffle: bool = True
    ) -> dict:
        """Epoch over a data.dataset.ResidentPairs store: per-step host
        traffic is O(batch) integers and K = TrainConfig.steps_per_dispatch
        optimizer steps ride each dispatch (lax.scan); images never leave
        the device."""
        import numpy as np

        k = max(1, self.cfg.train.steps_per_dispatch)
        single, multi = self._resident_fns(self._release_active(epoch), k > 1)
        from overlapnet_tpu.parallel.mesh import shard_batch

        def put(b, stacked: bool):
            if self.mesh is None:
                return b
            if not stacked:
                return shard_batch(self.mesh, b)
            from overlapnet_tpu.parallel.mesh import put_sharded_dim

            # (K, B, ...) leaves: shard the batch dim, mp-safe
            return jax.tree.map(
                lambda x: put_sharded_dim(self.mesh, x, dim=1), b
            )

        def grouped():
            group = []
            for b in resident.batches(
                batch_size, epoch=epoch, shuffle=shuffle, drop_remainder=True
            ):
                if k == 1:  # no fusing: plain single-step dispatches
                    yield ("single", put(b, False))
                    continue
                group.append(b)
                if len(group) == k:
                    stacked = {
                        key: np.stack([g[key] for g in group])
                        for key in group[0]
                    }
                    yield ("multi", put(stacked, True))
                    group = []
            for b in group:  # tail: single-step dispatches
                yield ("single", put(b, False))

        def step(item):
            kind, b = item
            fn = multi if kind == "multi" else single
            return fn(self.state, resident.images, b)

        return self._run_loop(grouped(), step)

    def _run_loop(self, batches, step) -> dict:
        """Drive dispatches from ``batches``; items may be plain batch dicts
        (one step each) or ("multi", stacked-dict) tuples whose leaves have
        a (K, B) leading shape (K fused steps)."""
        import time

        import numpy as np

        losses = []  # device scalars/vectors; fetched once at epoch end
        last_metrics = {}
        count = 0
        n_items = 0
        t0 = time.perf_counter()
        for batch in batches:
            payload = batch[1] if isinstance(batch, tuple) else batch
            fused = isinstance(batch, tuple) and batch[0] == "multi"
            leaf = jax.tree.leaves(payload)[0]
            n_items += int(np.prod(leaf.shape[:2]) if fused else leaf.shape[0])
            self.state, metrics = step(batch)
            losses.append(metrics["loss"])
            last_metrics = metrics
            count += 1
            if count % self.pipeline_depth == 0:
                # real barrier: fetch. On remote-relay backends (axon)
                # block_until_ready returns without draining the client
                # queue, so an epoch's worth of dispatched batches piles up
                # in host RAM (observed: OOM at ~130 GB).
                losses[-1] = np.asarray(losses[-1])
        if count:
            flat = np.concatenate(
                [np.atleast_1d(np.asarray(v)) for v in jax.device_get(losses)]
            )
            dt = time.perf_counter() - t0
            last_metrics = {
                k: np.asarray(v).ravel()[-1] for k, v in last_metrics.items()
            }
            last_metrics.update(
                epoch_loss=float(flat.mean()),
                train_pairs_per_sec=n_items / dt,
                sec_per_dispatch=dt / count,
            )
        return {k: float(v) for k, v in last_metrics.items()}

    def evaluate(self, batches, orientations=None, overlaps=None) -> dict:
        """Validation metrics over an iterable of eval batches (each with
        x1, x2, overlap, orientation host arrays). With a mesh, evaluation
        is sharded over the 'data' axis like training (ragged batches are
        padded to the mesh size and trimmed after; parity with the
        single-device path is test-asserted)."""
        import numpy as np

        pred_overlap, pred_yaw, true_overlap, true_yaw = [], [], [], []
        for batch in batches:
            x1, x2 = np.asarray(batch["x1"]), np.asarray(batch["x2"])
            n = x1.shape[0]
            if self.mesh is not None:
                from overlapnet_tpu.parallel.mesh import (
                    pad_to_multiple,
                    shard_batch,
                )

                d = self.mesh.shape["data"]
                x1, _ = pad_to_multiple(x1, d)
                x2, _ = pad_to_multiple(x2, d)
                eval_in = shard_batch(self.mesh, {"x1": x1, "x2": x2})
            else:
                eval_in = {"x1": x1, "x2": x2}
            ov, yaw = self.eval_step(self.state.params, eval_in)
            pred_overlap.append(np.asarray(ov)[:n])
            pred_yaw.append(np.asarray(yaw)[:n])
            true_overlap.append(np.asarray(batch["overlap"]))
            true_yaw.append(np.asarray(batch["orientation"]))
        pred_overlap = np.concatenate(pred_overlap)
        pred_yaw = np.concatenate(pred_yaw)
        true_overlap = np.concatenate(true_overlap)
        true_yaw = np.concatenate(true_yaw)

        from overlapnet_tpu.train.evaluate import overlap_metrics, yaw_metrics

        # yaw metrics in physical degrees: predictions decode through the
        # model's yaw_space (sub-bin peak -> degrees), GT bins through the
        # reference npz convention. Circular wrap at 360 degrees.
        pred_deg = np.asarray(peak_to_degrees(pred_yaw, self.cfg.model))
        true_deg = np.asarray(ref_bins_to_degrees(true_yaw, self.cfg.model))
        metrics = overlap_metrics(pred_overlap, true_overlap)
        for thr in [0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]:
            m = yaw_metrics(
                pred_deg, true_deg, pred_overlap, 360, overlap_threshold=thr
            )
            if m:
                metrics[f"yaw_rms@{thr}"] = m["rms_error"]
        return metrics
