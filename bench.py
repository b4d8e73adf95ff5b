"""Headline benchmark: scan-pair inference throughput on one TPU chip.

Measures the LCD serving hot loop (reference infer.py:192-196): scoring pairs
of cached leg feature volumes with both heads (overlap + yaw). Also reports
the leg (per-scan embedding) throughput as a secondary metric.

Timing methodology: the remote-TPU relay in this environment makes
``block_until_ready`` unreliable and host fetches cost ~50 ms, so each
measurement chains ``iters`` data-dependent applications of the workload
inside ONE jitted ``lax.fori_loop`` and fetches a single scalar; the
per-iteration time is the slope between two iteration counts, which cancels
dispatch/fetch constants.

Prints ONE JSON line:
  {"metric": "pairs_per_sec_per_chip", "value": N, "unit": "pairs/s",
   "vs_baseline": N / 1000}
Baseline: BASELINE.md driver target >= 1000 pairs/s/chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_chained(body, carry0, iters_lo=4, iters_hi=20):
    """Seconds per iteration of ``body`` (carry -> carry), measured as the
    slope between two chained-loop lengths (cancels constant overheads)."""

    def make(iters):
        @jax.jit
        def run(carry):
            out = jax.lax.fori_loop(0, iters, lambda i, c: body(c), carry)
            return jax.tree.map(lambda a: jnp.sum(a.astype(jnp.float32)), out)

        return run

    run_lo, run_hi = make(iters_lo), make(iters_hi)

    def fetch(run):
        out = run(carry0)
        return float(jax.tree.leaves(out)[0])

    fetch(run_lo)  # compile
    fetch(run_hi)  # compile
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(run_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(run_hi)
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (iters_hi - iters_lo))
    return best


def main():
    from overlapnet_tpu.core.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    from overlapnet_tpu.core.config import OverlapNetConfig
    from overlapnet_tpu.models import (
        build_model,
        init_params,
        leg_output_width,
    )
    from overlapnet_tpu.models.siamese import OverlapNet

    cfg = OverlapNetConfig()
    model = build_model(cfg.model)
    params = init_params(cfg.model, cfg.num_input_channels, rng=0)
    w = leg_output_width(cfg.model)  # 360

    rng = np.random.default_rng(0)

    # --- head throughput (pairs/s): the headline ---
    head_batch = 256
    fa = jnp.asarray(rng.normal(size=(head_batch, w, 128)).astype(np.float32) * 0.05)
    fb = jnp.asarray(rng.normal(size=(head_batch, w, 128)).astype(np.float32) * 0.05)

    def head_body(carry):
        fa_c, acc = carry
        overlap, logits = model.apply(params, fa_c, fb, method=OverlapNet.score)
        acc = acc + jnp.sum(overlap) + jnp.sum(logits) * 1e-6
        # data dependency so the loop body cannot be hoisted as invariant
        return fa_c + acc * 1e-20, acc

    head_dt = time_chained(head_body, (fa, jnp.zeros(())))
    pairs_per_sec = head_batch / head_dt

    # --- leg throughput (scans/s): secondary ---
    leg_batch = 32
    x = jnp.asarray(
        rng.normal(size=(leg_batch, 64, 900, cfg.num_input_channels)).astype(
            np.float32
        )
        * 0.1
    )

    def leg_body(carry):
        x_c, acc = carry
        fv = model.apply(params, x_c, method=OverlapNet.encode)
        acc = acc + jnp.sum(fv) * 1e-6
        return x_c + acc * 1e-20, acc

    leg_dt = time_chained(leg_body, (x, jnp.zeros(())))
    scans_per_sec = leg_batch / leg_dt

    result = {
        "metric": "pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / 1000.0, 3),
        "leg_scans_per_sec": round(scans_per_sec, 1),
        "head_ms_per_batch": round(head_dt * 1e3, 3),
        "head_batch": head_batch,
        "device": str(jax.devices()[0]),
        "delta_head_impl": cfg.model.delta_head_impl,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
