"""Scaling-efficiency harness: throughput vs device count.

BASELINE.md sets ">= 80% scaling efficiency at 2+ hosts". This harness
measures the two scaling axes on an n-device mesh for every feasible n
(1, 2, 4, ... up to the visible device count):

- DP training: pjit train step, batch sharded over the 'data' axis
  (overlapnet_tpu.train.trainer.make_train_step);
- descriptor-map serving: ShardedDescriptorDB query_all, DB rows sharded
  over the mesh (SURVEY.md §5 descriptor-map sharding).

Prints one JSON line per device count with throughput and efficiency
relative to n=1 (efficiency_n = throughput_n / (n * throughput_1)).

On this environment only one real TPU chip is visible, so run on the
virtual CPU mesh to validate the *mechanism*:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py --cpu
(virtual CPU devices share physical cores — efficiency numbers are only
meaningful on real multi-chip hardware; the harness is hardware-agnostic.)
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU device pool")
    ap.add_argument("--batch-per-device", type=int, default=16)
    ap.add_argument("--db-rows-per-device", type=int, default=256)
    ap.add_argument("--width", type=int, default=360)
    ap.add_argument("--iters", type=int, nargs=2, default=(4, 20),
                    metavar=("LO", "HI"),
                    help="chained-loop lengths for the slope timing")
    ap.add_argument("--skip-train", action="store_true",
                    help="skip the DP train-step scaling section (virtual CPU "
                    "devices share physical cores, making grad-step timings "
                    "both slow and meaningless there)")
    args = ap.parse_args()

    import os

    if args.cpu and "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from overlapnet_tpu.core.jax_setup import (
        enable_persistent_cache,
        maybe_initialize_distributed,
    )

    enable_persistent_cache()
    # 2-process mode: launch one copy per rank with OVERLAPNET_COORDINATOR /
    # _NUM_PROCESSES / _PROCESS_ID set (same env-gated bootstrap as the CLIs)
    maybe_initialize_distributed()

    import jax.numpy as jnp

    from bench import time_chained
    from overlapnet_tpu.core.config import OverlapNetConfig
    from overlapnet_tpu.models import leg_output_width, make_head_apply
    from overlapnet_tpu.parallel.mesh import (
        make_mesh,
        put_replicated,
        put_sharded,
    )
    from overlapnet_tpu.train.losses import combined_loss, orientation_target
    from overlapnet_tpu.train.trainer import create_train_state
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = jax.devices()
    # multi-process mode (env-gated jax.distributed bootstrap, same as the
    # CLIs): every process runs this script with identical arguments; only
    # full-mesh device counts are measured and placement goes through the
    # mp-safe helpers.
    multiproc = jax.process_count() > 1
    if multiproc:
        counts = [len(devices)]
    else:
        counts = [n for n in [1, 2, 4, 8, 16] if n <= len(devices)]
    print(f"# platform={devices[0].platform} devices={len(devices)}",
          file=sys.stderr)

    cfg = OverlapNetConfig()
    cfg.model.input_width = args.width
    w = leg_output_width(cfg.model)
    head = make_head_apply(cfg.model)
    state, _ = create_train_state(cfg, steps_per_epoch=4, rng=0)
    params = state.params
    rng = np.random.default_rng(0)

    base_train = base_query = None
    for n in counts:
        print(f"# measuring n={n}", file=sys.stderr, flush=True)
        mesh = make_mesh(n, devices=devices[:n])
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        params_d = jax.tree.map(lambda a: put_replicated(mesh, a), params)

        # --- DP train-step throughput (per-device batch held fixed) ------
        train_tput = None
        b = args.batch_per_device * n
        batch = {
            "x1": put_sharded(mesh, rng.normal(
                size=(b, 64, args.width, 4)).astype(np.float32)),
            "x2": put_sharded(mesh, rng.normal(
                size=(b, 64, args.width, 4)).astype(np.float32)),
            "overlap": put_sharded(
                mesh, rng.uniform(size=(b,)).astype(np.float32)),
            "orientation": put_sharded(
                mesh, rng.integers(0, w, size=(b,)).astype(np.int32)),
        }

        from overlapnet_tpu.models import build_model

        model = build_model(cfg.model)

        def loss_only(p, bt):
            ov, logits = model.apply(p, bt["x1"], bt["x2"])
            tgt = orientation_target(bt["orientation"], bt["overlap"], w)
            loss, _ = combined_loss(ov, logits, bt["overlap"], tgt,
                                    pos_weight=float(w))
            return loss

        grad_fn = jax.grad(loss_only)

        def train_body(carry):
            p, bt = carry
            g = grad_fn(p, bt)
            p2 = jax.tree.map(lambda a, b_: a - 1e-6 * b_, p, g)
            return (p2, bt)

        if not args.skip_train:
            t_train = time_chained(train_body, (params_d, batch),
                                   iters_lo=args.iters[0], iters_hi=args.iters[1])
            train_tput = b / t_train

        # --- sharded descriptor-DB query throughput ----------------------
        rows = args.db_rows_per_device * n
        fv = put_sharded(mesh, rng.normal(size=(rows, w, 128)).astype(np.float32))
        q = put_replicated(mesh, rng.normal(size=(w, 128)).astype(np.float32))

        def query_body(carry):
            fv_c, q_c, acc = carry
            fb = jnp.broadcast_to(q_c[None], fv_c.shape)
            ov, logits = head(params_d, fv_c, fb)
            acc = acc + jnp.sum(ov) + jnp.sum(jnp.argmax(logits, -1))
            # data-dependent chain: perturb the query by the result
            q2 = q_c * (1.0 + 1e-12 * jnp.sum(ov))
            return (fv_c, q2, acc)

        t_query = time_chained(
            query_body, (fv, q, jnp.zeros((), jnp.float32)),
            iters_lo=args.iters[0], iters_hi=args.iters[1],
        )
        query_tput = rows / t_query

        if n == counts[0]:
            base_train = (train_tput / n) if train_tput else None
            base_query = query_tput / n
        line = {
            "metric": "scaling",
            "devices": n,
            "db_pairs_per_sec": round(query_tput, 1),
            "db_efficiency": round(query_tput / (n * base_query), 3),
            "unit": "pairs/s",
            "platform": devices[0].platform,
        }
        if devices[0].platform == "cpu":
            line["note"] = (
                "virtual devices share physical host cores: total compute is "
                "fixed, so efficiency cannot approach 1 here by construction "
                "— this validates the sharded mechanism, not ICI scaling"
            )
        if train_tput:
            line["train_pairs_per_sec"] = round(train_tput, 1)
            line["train_efficiency"] = round(train_tput / (n * base_train), 3)
        if jax.process_index() == 0:
            line["processes"] = jax.process_count()
            print(json.dumps(line))

    # --- capacity flatness: query cost must track live rows, not capacity --
    # (round-2 regression: query_all scored all `capacity` rows and shipped
    # three full-capacity arrays to host; now only the live power-of-two slot
    # bucket is scored and query_topk returns k-sized arrays)
    import time as _time

    from overlapnet_tpu.lcd.descriptor_db import ShardedDescriptorDB

    mesh = make_mesh(len(devices), devices=devices)
    live = 64
    sweep = []
    for capacity in (1024, 4096, 16384):
        sdb = ShardedDescriptorDB(
            make_head_apply(cfg.model), params, mesh,
            capacity=capacity, width=w,
        )
        sdb.add(rng.normal(size=(live, w, 128)).astype(np.float32))
        q = rng.normal(size=(w, 128)).astype(np.float32)
        sdb.query_topk(q, k=8)  # compile
        t0 = _time.perf_counter()
        reps = 20
        for _ in range(reps):
            vals, ids, yaws, confs = sdb.query_topk(q, k=8)
        dt = (_time.perf_counter() - t0) / reps
        assert vals.shape == (8,), "host transfer must be O(k)"
        sweep.append({"capacity": capacity, "live_rows": live,
                      "ms_per_query": round(dt * 1e3, 3)})
        print(f"# capacity sweep: {sweep[-1]}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "query_capacity_flatness",
        "devices": len(devices),
        "platform": devices[0].platform,
        "sweep": sweep,
        "flat": bool(sweep[-1]["ms_per_query"] < 3 * sweep[0]["ms_per_query"]),
    }))

    # --- multi-query amortization: per-query cost vs Q (SURVEY hard part
    # #4) — one query_topk_batch dispatch scores Q queries x live rows, so
    # the ~fixed dispatch/transfer overhead of a single query is split
    # across Q. ---------------------------------------------------------
    live = 256
    sdb = ShardedDescriptorDB(
        make_head_apply(cfg.model), params, mesh, capacity=1024, width=w
    )
    sdb.add(rng.normal(size=(live, w, 128)).astype(np.float32))
    qsweep = []
    for qn in (1, 4, 16, 32):
        queries = rng.normal(size=(qn, w, 128)).astype(np.float32)
        sdb.query_topk_batch(queries, k=8)  # compile
        reps = 10
        t0 = _time.perf_counter()
        for _ in range(reps):
            vals, _, _, _ = sdb.query_topk_batch(queries, k=8)
        dt = (_time.perf_counter() - t0) / reps
        assert vals.shape == (qn, 8)
        qsweep.append({
            "q": qn,
            "ms_per_dispatch": round(dt * 1e3, 3),
            "ms_per_query": round(dt * 1e3 / qn, 3),
        })
        print(f"# multi-query sweep: {qsweep[-1]}", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "multi_query_amortization",
        "devices": len(devices),
        "platform": devices[0].platform,
        "live_rows": live,
        "sweep": qsweep,
        "amortization_q32": round(
            qsweep[0]["ms_per_query"] / qsweep[-1]["ms_per_query"], 2
        ),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
