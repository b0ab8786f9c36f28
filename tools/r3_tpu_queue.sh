#!/usr/bin/env bash
# One-shot serialized TPU session for the round-3 pending measurements.
#
# The axon relay wedges for long stretches (see .claude/skills/verify/
# SKILL.md "relay-wedge recovery"); when it recovers, TPU time is
# precious and jobs must be strictly serialized. This script runs every
# relay-gated measurement back-to-back, each bounded, each logged to
# /tmp/r3q/<step>.out, JSON artifacts under artifacts/.
#
# Steps:
#   0 probe      — bounded devices() check; exit 1 fast if still wedged
#   1 lowering   — tpu_custom_call count in the lowered merged serve
#                  (confirms the fused_stage1_p Pallas form is the one
#                  the pipeline actually runs on the tpu branch)
#   2 merged_ab  — 9-round interleaved s2dh/s2dm x bf16/int8 A/B
#   3 b8_ab      — batch-8 std/s2dh/s2dm A/B (merged may reclaim b8)
#   4 bench      — full 7-engine driver bench (headline + traces)
#   5 layer_s2dm — per-op table from the merged engine's trace
#   6 pjrt_test  — relay-gated C++ host pytest (in.layout=s2dm staging)
#   7 native     — perception_host --executor pjrt row through the
#                  COMMITTED merged artifact (producer first, PID-file
#                  kill — never pkill)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3q artifacts runs

step() {
  local name=$1; shift
  echo "=== [$name] start $(date -u +%H:%M:%S)"
  "$@" >"/tmp/r3q/$name.out" 2>&1
  local rc=$?
  echo "=== [$name] exit=$rc $(date -u +%H:%M:%S)"
  tail -n 4 "/tmp/r3q/$name.out"
  return 0
}

echo "=== [probe] $(date -u +%H:%M:%S)"
if ! timeout 120 python -c "import jax; print(jax.devices())"; then
  echo "RELAY STILL WEDGED — aborting queue"
  exit 1
fi

step lowering   timeout 900  python tools/check_merged_lowering.py
step c3k2_probe timeout 1800 python tools/c3k2_probe.py
step merged_ab  timeout 2400 python tools/merged_ab_session.py 9
step b8_ab      timeout 2400 python tools/b8_merged_ab.py
step bench      timeout 3000 python bench.py
step layer_s2dm timeout 900  python tools/layer_table.py runs/bench_trace_s2dm \
                     --json artifacts/layer_table_s2dm.json --iters 50
step pjrt_test  timeout 2400 python -m pytest tests/test_pjrt_executor.py -x -q

# Native host row through the committed merged artifact. Producer first
# (outlasts the 30-60 s remote compile), host second, kill by PID file.
native_row() {
  local B=unina_yolo_dla_tpu/runtime/native/build
  cmake --build "$B" >/dev/null 2>&1 || true
  "$B"/ring_tool produce --ring /dev/shm/r3q_f --width 640 --height 640 \
      --frames 20000 --fps 30 & echo $! > /tmp/r3q/producer.pid
  sleep 2
  timeout 600 "$B"/perception_host --artifact artifacts/serving_artifact \
      --ring /dev/shm/r3q_f --out /dev/shm/r3q_d --executor pjrt \
      --max-frames 300
  kill "$(cat /tmp/r3q/producer.pid)" 2>/dev/null
  rm -f /dev/shm/r3q_f /dev/shm/r3q_d
}
step native native_row

echo "=== QUEUE DONE $(date -u +%H:%M:%S) — outputs in /tmp/r3q/"
grep -h "" /tmp/r3q/*.out | tail -0  # keep shellcheck quiet
