"""Headline benchmark: scan-pair inference throughput on one TPU chip.

Measures the LCD serving hot loop (reference infer.py:192-196): scoring pairs
of cached leg feature volumes with both heads (overlap + yaw), as a shootout
over delta-head implementations (xla | blocked | pallas) x compute dtypes
(float32 | bfloat16), each with an analytic-FLOPs MFU estimate. The pallas
variant's numerics are asserted against the xla fp32 reference on the real
device (not interpret mode). Also reports leg (per-scan embedding)
throughput for both dtypes.

Timing methodology: the remote-TPU relay in this environment makes
``block_until_ready`` unreliable and host fetches cost ~50 ms, so each
measurement chains ``iters`` data-dependent applications of the workload
inside ONE jitted ``lax.fori_loop`` and fetches a single scalar; the
per-iteration time is the slope between two iteration counts, which cancels
dispatch/fetch constants.

Prints ONE JSON line: headline = throughput of the configured default
variant; ``head_variants`` / ``leg_variants`` carry the full table.
Baseline: BASELINE.md driver target >= 1000 pairs/s/chip.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e (TPU v5 lite) peak: 197 TFLOP/s bf16, fp32 ops run through the same MXU
# at roughly half rate; we report MFU against the bf16 peak for every variant
# so the numbers are comparable.
PEAK_FLOPS_BF16 = 197e12


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


def head_gflops_per_pair(w: int, c: int, s: int) -> float:
    """Analytic FLOPs of one pair through both heads (fwd only).

    delta |a-b|: W*W*C subtract+abs (2 ops); c_conv1 matmul 2*W*J*(S*C)*64;
    c_conv2 2*J*J*128*(S*64); c_conv3 2*(J-2)^2*256*(3*3*128);
    overlap dense 2*(J-2)^2*256; correlation 2*W*W*C.
    """
    j = w // s
    return (
        2 * w * w * c                       # abs-diff (VPU)
        + 2 * w * j * (s * c) * 64          # c_conv1
        + 2 * j * j * 128 * (s * 64)        # c_conv2
        + 2 * (j - 2) * (j - 2) * 256 * (3 * 3 * 128)  # c_conv3
        + 2 * (j - 2) * (j - 2) * 256       # overlap_output
        + 2 * w * w * c                     # circular correlation
    ) / 1e9


def leg_gflops_per_scan(cfg_model, channels: int) -> float:
    from overlapnet_tpu.core.leg_specs import conv_specs

    h, w, cin = cfg_model.input_height, cfg_model.input_width, channels
    total = 0.0
    for _, f, (kh, kw), (sh, sw) in conv_specs(cfg_model):
        ho, wo = (h - kh) // sh + 1, (w - kw) // sw + 1
        total += 2.0 * ho * wo * f * (kh * kw * cin)
        h, w, cin = ho, wo, f
    return total / 1e9


def main():
    from overlapnet_tpu.core.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    from overlapnet_tpu.core.config import OverlapNetConfig
    from overlapnet_tpu.models import build_model, init_params, leg_output_width
    from overlapnet_tpu.models.siamese import OverlapNet

    cfg = OverlapNetConfig()
    params = init_params(cfg.model, cfg.num_input_channels, rng=0)
    w = leg_output_width(cfg.model)  # 360
    s = cfg.model.conv1_network_head_conv1size
    rng = np.random.default_rng(0)

    head_batch = 256
    fa = jnp.asarray(rng.normal(size=(head_batch, w, 128)).astype(np.float32) * 0.05)
    fb = jnp.asarray(rng.normal(size=(head_batch, w, 128)).astype(np.float32) * 0.05)
    gflops_pair = head_gflops_per_pair(w, 128, s)

    def time_head(model):
        def body(carry):
            fa_c, acc = carry
            overlap, logits = model.apply(params, fa_c, fb, method=OverlapNet.score)
            acc = acc + jnp.sum(overlap) + jnp.sum(logits.astype(jnp.float32)) * 1e-6
            # data dependency so the loop body cannot be hoisted as invariant
            return fa_c + acc * 1e-20, acc

        return time_chained(body, (fa, jnp.zeros(())))

    # reference outputs for the numerics gate (xla fp32)
    ref_model = build_model(cfg.model)
    ref_ov, ref_logits = map(
        np.asarray,
        jax.jit(lambda p, a, b: ref_model.apply(p, a, b, method=OverlapNet.score))(
            params, fa, fb
        ),
    )

    head_variants = {}
    for impl in ("xla", "blocked", "pallas"):
        for dtype in ("float32", "bfloat16"):
            key = f"{impl}_{'bf16' if dtype == 'bfloat16' else 'fp32'}"
            mcfg = dataclasses.replace(
                cfg.model, delta_head_impl=impl, compute_dtype=dtype
            )
            entry = {}
            try:
                model = build_model(mcfg)
                ov, logits = map(
                    np.asarray,
                    jax.jit(
                        lambda p, a, b, m=model: m.apply(p, a, b, method=OverlapNet.score)
                    )(params, fa, fb),
                )
                entry["max_overlap_diff_vs_ref"] = float(
                    np.max(np.abs(ov.astype(np.float32) - ref_ov))
                )
                tol = 5e-3 if dtype == "float32" else 5e-2
                entry["numerics_ok"] = bool(entry["max_overlap_diff_vs_ref"] < tol)
                dt = time_head(model)
                entry["pairs_per_sec"] = round(head_batch / dt, 1)
                entry["ms_per_batch"] = round(dt * 1e3, 3)
                entry["gflops_per_sec"] = round(head_batch / dt * gflops_pair, 1)
                entry["mfu_vs_bf16_peak"] = round(
                    head_batch / dt * gflops_pair * 1e9 / PEAK_FLOPS_BF16, 5
                )
            except Exception as e:  # variant must not kill the bench
                entry["error"] = f"{type(e).__name__}: {e}"[:300]
                entry["numerics_ok"] = False
            head_variants[key] = entry
            print(f"# head {key}: {entry}", file=sys.stderr, flush=True)

    # --- leg throughput (scans/s): secondary ---
    leg_batch = 32
    x = jnp.asarray(
        rng.normal(size=(leg_batch, 64, 900, cfg.num_input_channels)).astype(np.float32)
        * 0.1
    )
    leg_gf = leg_gflops_per_scan(cfg.model, cfg.num_input_channels)
    leg_variants = {}
    for dtype in ("float32", "bfloat16"):
        key = "bf16" if dtype == "bfloat16" else "fp32"
        model = build_model(dataclasses.replace(cfg.model, compute_dtype=dtype))

        def leg_body(carry, model=model):
            x_c, acc = carry
            fv = model.apply(params, x_c, method=OverlapNet.encode)
            acc = acc + jnp.sum(fv.astype(jnp.float32)) * 1e-6
            return x_c + acc * 1e-20, acc

        dt = time_chained(leg_body, (x, jnp.zeros(())))
        leg_variants[key] = {
            "scans_per_sec": round(leg_batch / dt, 1),
            "gflops_per_sec": round(leg_batch / dt * leg_gf, 1),
            "mfu_vs_bf16_peak": round(leg_batch / dt * leg_gf * 1e9 / PEAK_FLOPS_BF16, 5),
        }
        print(f"# legs {key}: {leg_variants[key]}", file=sys.stderr, flush=True)

    # headline: the configured default variant
    default_key = (
        f"{cfg.model.delta_head_impl}_"
        f"{'bf16' if cfg.model.compute_dtype == 'bfloat16' else 'fp32'}"
    )
    headline = head_variants.get(default_key, {})
    ok = {k: v for k, v in head_variants.items()
          if v.get("numerics_ok") and "pairs_per_sec" in v}
    best_key = max(ok, key=lambda k: ok[k]["pairs_per_sec"]) if ok else None
    pairs_per_sec = headline.get("pairs_per_sec", 0.0)

    result = {
        "metric": "pairs_per_sec_per_chip",
        "value": pairs_per_sec,
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / 1000.0, 3),
        "default_variant": default_key,
        "best_variant": best_key,
        "head_gflops_per_pair": round(gflops_pair, 3),
        "head_mfu_vs_bf16_peak": headline.get("mfu_vs_bf16_peak"),
        "head_batch": head_batch,
        "head_variants": head_variants,
        "leg_gflops_per_scan": round(leg_gf, 3),
        "leg_variants": leg_variants,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
