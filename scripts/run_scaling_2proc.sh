#!/usr/bin/env bash
# 2-OS-process bench_scaling run (VERDICT r3 ask #4): each rank exposes 4
# virtual CPU devices and joins via the env-gated jax.distributed bootstrap;
# rank 0 prints the JSON lines (processes=2, devices=8).
set -euo pipefail
cd "$(dirname "$0")/.."
PORT=${PORT:-12377}
OUT=${OUT:-/tmp/scaling_2proc.jsonl}
ARGS=${ARGS:---cpu --batch-per-device 4 --db-rows-per-device 128 --iters 2 6}

run_rank() {
  XLA_FLAGS="--xla_force_host_platform_device_count=4" \
  OVERLAPNET_COORDINATOR="127.0.0.1:${PORT}" \
  OVERLAPNET_NUM_PROCESSES=2 \
  OVERLAPNET_PROCESS_ID=$1 \
  python bench_scaling.py ${ARGS}
}

run_rank 1 >/dev/null 2>/tmp/scaling_2proc_r1.err &
R1=$!
run_rank 0 >"${OUT}" 2>/tmp/scaling_2proc_r0.err
wait ${R1}
cat "${OUT}"
