"""Headline benchmark: scan-pair inference throughput on one TPU chip.

Measures the LCD serving hot loop (reference infer.py:192-196): scoring pairs
of cached leg feature volumes with both heads (overlap + yaw) in the
framework's default configuration, plus leg (per-scan embedding) throughput.
The full 6-variant delta-head shootout (xla | blocked | pallas) x
(float32 | bfloat16) with numerics gates runs only under ``--full`` — the
default invocation is sized to finish well inside the driver's timeout.

Timing methodology: the remote-TPU relay in this environment makes
``block_until_ready`` unreliable and host fetches cost ~50 ms, so each
measurement chains ``iters`` data-dependent applications of the workload
inside ONE jitted ``lax.fori_loop`` and fetches a single scalar; the
per-iteration time is the slope between two iteration counts, which cancels
dispatch/fetch constants.

Output contract: stdout carries ONLY progressively-enriched JSON headline
lines (flushed as each measurement lands, so a timeout still leaves the
headline on record; the last line is the most complete). Progress notes go
to stderr. ``regression_vs_prev`` compares the headline against the last
committed artifact (BENCH_LAST.json) and flags >10% deltas.
Baseline: BASELINE.md driver target >= 1000 pairs/s/chip.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# v5e (TPU v5 lite) peak: 197 TFLOP/s bf16, fp32 ops run through the same MXU
# at roughly half rate; we report MFU against the bf16 peak for every variant
# so the numbers are comparable.
PEAK_FLOPS_BF16 = 197e12

LAST_ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LAST.json")

# progressively-updated result; emitted on every milestone and on SIGTERM
RESULT: dict = {}


def emit(force: bool = False) -> None:
    if RESULT.get("value") or force:
        print(json.dumps(RESULT), flush=True)


def _on_term(signum, frame):
    # emit whatever landed even if the headline has not — the output
    # contract is "a timeout still leaves a JSON line on record"
    RESULT["interrupted"] = True
    RESULT.setdefault("metric", "pairs_per_sec_per_chip")
    RESULT.setdefault("value", 0)
    RESULT.setdefault("unit", "pairs/s")
    RESULT.setdefault("vs_baseline", 0.0)
    emit(force=True)
    sys.exit(0)


def time_chained(body, carry0, iters_lo=4, iters_hi=20, reps=3):
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
    for _ in range(reps):
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


def note(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--full", action="store_true",
                    help="run the 6-variant shootout + numerics gates")
    ap.add_argument("--head-batch", type=int, default=256)
    ap.add_argument("--budget-sec", type=float, default=480.0,
                    help="soft internal deadline; the headline is printed "
                    "before any optional work so a timeout cannot erase it")
    args = ap.parse_args()

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGALRM, _on_term)
    signal.alarm(int(args.budget_sec))
    t_start = time.perf_counter()

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

    head_batch = args.head_batch
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

    prev = None
    try:
        with open(LAST_ARTIFACT) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        pass

    default_key = (
        f"{cfg.model.delta_head_impl}_"
        f"{'bf16' if cfg.model.compute_dtype == 'bfloat16' else 'fp32'}"
    )

    # ---- headline: ONE variant, one timing, printed immediately -----------
    note(f"measuring headline variant {default_key} at B={head_batch} ...")
    model = build_model(cfg.model)
    dt = time_head(model)
    pairs_per_sec = round(head_batch / dt, 1)
    RESULT.update(
        metric="pairs_per_sec_per_chip",
        value=pairs_per_sec,
        unit="pairs/s",
        vs_baseline=round(pairs_per_sec / 1000.0, 3),
        default_variant=default_key,
        head_ms_per_batch=round(dt * 1e3, 3),
        head_batch=head_batch,
        head_gflops_per_pair=round(gflops_pair, 3),
        head_mfu_vs_bf16_peak=round(
            pairs_per_sec * gflops_pair * 1e9 / PEAK_FLOPS_BF16, 5
        ),
        device=str(jax.devices()[0]),
    )
    if prev and prev.get("value"):
        delta = pairs_per_sec / float(prev["value"]) - 1.0
        RESULT["regression_vs_prev"] = round(delta, 4)
        RESULT["prev_value"] = prev["value"]
        RESULT["prev_date"] = prev.get("date")
        if abs(delta) > 0.10:
            RESULT["regression_flag"] = (
                f"headline moved {delta:+.1%} vs last committed artifact "
                f"({prev['value']} on {prev.get('date')})"
            )
    emit()

    # ---- legs (default dtype): second milestone ---------------------------
    leg_batch = 128
    x = jnp.asarray(
        rng.normal(size=(leg_batch, 64, 900, cfg.num_input_channels)).astype(np.float32)
        * 0.1
    )
    leg_gf = leg_gflops_per_scan(cfg.model, cfg.num_input_channels)

    def leg_body(carry):
        x_c, acc = carry
        fv = model.apply(params, x_c, method=OverlapNet.encode)
        acc = acc + jnp.sum(fv.astype(jnp.float32)) * 1e-6
        return x_c + acc * 1e-20, acc

    note(f"measuring legs ({cfg.model.leg_dtype}) at B={leg_batch} ...")
    leg_dt = time_chained(leg_body, (x, jnp.zeros(())))
    RESULT.update(
        leg_scans_per_sec=round(leg_batch / leg_dt, 1),
        leg_dtype=cfg.model.leg_dtype,
        leg_batch=leg_batch,
        leg_gflops_per_scan=round(leg_gf, 3),
        leg_mfu_vs_bf16_peak=round(
            leg_batch / leg_dt * leg_gf * 1e9 / PEAK_FLOPS_BF16, 5
        ),
    )
    emit()

    # refresh the last-artifact record (committed alongside BENCH_r*.json)
    try:
        with open(LAST_ARTIFACT, "w") as f:
            json.dump(
                {
                    "value": RESULT["value"],
                    "leg_scans_per_sec": RESULT.get("leg_scans_per_sec"),
                    "default_variant": default_key,
                    "date": time.strftime("%Y-%m-%d"),
                },
                f,
            )
            f.write("\n")
    except OSError:
        pass

    if not args.full:
        return

    # ---- --full: the shootout over impls x dtypes + numerics gates --------
    ref_ov = np.asarray(
        jax.jit(lambda p, a, b: model.apply(p, a, b, method=OverlapNet.score))(
            params, fa, fb
        )[0]
    )
    head_variants = {default_key: {
        "pairs_per_sec": RESULT["value"],
        "ms_per_batch": RESULT["head_ms_per_batch"],
        "mfu_vs_bf16_peak": RESULT["head_mfu_vs_bf16_peak"],
        "numerics_ok": True,
        "max_overlap_diff_vs_ref": 0.0,
    }}
    for impl in ("xla", "blocked", "pallas"):
        for dtype in ("float32", "bfloat16"):
            key = f"{impl}_{'bf16' if dtype == 'bfloat16' else 'fp32'}"
            if key == default_key:
                continue
            if time.perf_counter() - t_start > args.budget_sec - 60:
                note(f"budget exhausted; skipping {key} and later variants")
                break
            mcfg = dataclasses.replace(
                cfg.model, delta_head_impl=impl, compute_dtype=dtype
            )
            entry = {}
            try:
                vmodel = build_model(mcfg)
                ov = np.asarray(
                    jax.jit(
                        lambda p, a, b, m=vmodel: m.apply(
                            p, a, b, method=OverlapNet.score
                        )
                    )(params, fa, fb)[0]
                )
                entry["max_overlap_diff_vs_ref"] = float(
                    np.max(np.abs(ov.astype(np.float32) - ref_ov))
                )
                tol = 5e-3 if dtype == "float32" else 5e-2
                entry["numerics_ok"] = bool(entry["max_overlap_diff_vs_ref"] < tol)
                vdt = time_head(vmodel)
                entry["pairs_per_sec"] = round(head_batch / vdt, 1)
                entry["ms_per_batch"] = round(vdt * 1e3, 3)
                entry["mfu_vs_bf16_peak"] = round(
                    head_batch / vdt * gflops_pair * 1e9 / PEAK_FLOPS_BF16, 5
                )
            except Exception as e:  # variant must not kill the bench
                entry["error"] = f"{type(e).__name__}: {e}"[:300]
                entry["numerics_ok"] = False
            head_variants[key] = entry
            note(f"head {key}: {entry}")

    ok = {k: v for k, v in head_variants.items()
          if v.get("numerics_ok") and "pairs_per_sec" in v}
    RESULT["head_variants"] = head_variants
    RESULT["best_variant"] = (
        max(ok, key=lambda k: ok[k]["pairs_per_sec"]) if ok else None
    )
    emit()


if __name__ == "__main__":
    main()
