"""Training-throughput tuning bench: the device-resident fused train loop.

Measures train pairs/s/chip of the production resident path
(train.trainer.make_resident_multi_step: K optimizer steps per dispatch over
a device-resident scan store) across batch sizes, on synthetic data shaped
like the flagship config — the loop that replaces the reference's
single-GPU ``fit_generator`` epoch (reference training.py:336-342).

Timing: E dispatches of K fused steps each are queued back-to-back and the
final state is fetched once; pairs/s = E*K*B / wall. The first dispatch per
variant is excluded (compile). VERDICT r4 ask #8: >= 5k pairs/s/chip at the
training defaults, or a committed profile of where the time goes.

Usage: python bench_train.py [--scans 256] [--steps 8] [--out TRAIN_TUNE.json]
Prints one JSON line -> commit as TRAIN_TUNE_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def note(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scans", type=int, default=256,
                    help="synthetic resident-store size (unique scans)")
    ap.add_argument("--steps", type=int, default=8,
                    help="K fused optimizer steps per dispatch")
    ap.add_argument("--dispatches", type=int, default=6,
                    help="timed dispatches per variant")
    ap.add_argument("--batches", default="32,64,128,256",
                    help="comma-separated batch sizes to sweep")
    ap.add_argument("--input-width", type=int, default=0,
                    help="override ModelConfig.input_width (CPU smoke only; "
                    "0 = flagship 900)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from overlapnet_tpu.core.jax_setup import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import numpy as np

    from overlapnet_tpu.core.config import OverlapNetConfig
    from overlapnet_tpu.sim.e2e import make_config
    from overlapnet_tpu.train.trainer import (
        create_train_state,
        make_resident_multi_step,
    )

    # flagship training config (sim.e2e.make_config): adam + clip + cosine
    # correlation + bf16 legs; model/channel defaults
    cfg = make_config("/tmp")
    cfg.train.steps_per_dispatch = args.steps
    if args.input_width:
        import dataclasses

        cfg.model = dataclasses.replace(cfg.model, input_width=args.input_width)
    h, w, c = cfg.model.input_height, cfg.model.input_width, cfg.num_input_channels

    rng = np.random.default_rng(0)
    images = (rng.normal(size=(args.scans, h, w, c)).astype(np.float32) * 0.1)
    images_dev = jax.device_put(images)
    note(f"resident store: {args.scans} scans, "
         f"{images.nbytes / 1e6:.0f} MB, device {jax.devices()[0]}")

    k = args.steps
    results = {}
    for b in [int(x) for x in args.batches.split(",")]:
        state, tx = create_train_state(cfg, steps_per_epoch=100)
        fn = make_resident_multi_step(cfg, tx)

        def batch(kb: int):
            return {
                "i1": rng.integers(0, args.scans, (kb, b)).astype(np.int32),
                "i2": rng.integers(0, args.scans, (kb, b)).astype(np.int32),
                "shift": np.zeros((kb, b), np.int32),
                "overlap": rng.uniform(0, 1, (kb, b)).astype(np.float32),
                "orientation": rng.integers(0, 360, (kb, b)).astype(np.int32),
            }

        state, m = fn(state, images_dev, batch(k))  # compile
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.dispatches):
            state, m = fn(state, images_dev, batch(k))
        final = float(np.asarray(m["loss"])[-1])  # real fetch barrier
        dt = time.perf_counter() - t0
        pps = args.dispatches * k * b / dt
        results[f"B{b}"] = {
            "pairs_per_sec": round(pps, 1),
            "ms_per_step": round(dt * 1e3 / (args.dispatches * k), 2),
            "final_loss": round(final, 4),
        }
        note(f"B={b}: {pps:,.0f} pairs/s ({results[f'B{b}']['ms_per_step']} ms/step)")

    best = max(results, key=lambda kk: results[kk]["pairs_per_sec"])
    out = {
        "metric": "train_pairs_per_sec_per_chip",
        "value": results[best]["pairs_per_sec"],
        "unit": "pairs/s",
        "best_batch": int(best[1:]),
        "steps_per_dispatch": k,
        "leg_dtype": cfg.model.leg_dtype,
        "sweep": results,
        "device": str(jax.devices()[0]),
        "note": ("synthetic resident store, production fused multi-step "
                 "path; per-dispatch host traffic is O(K*B) int32 indices"),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
