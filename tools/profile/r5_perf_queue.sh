#!/bin/bash
# Round-5 chip perf queue (VERDICT r4 items 5+6). Waits for the
# learned-loop queue (/tmp/queue.pid) to drain, then runs, sequentially
# on the one chip:
#   1. roma_stages baseline vs GIM_TPU_FLASH_VIT=1  (RoMa <=0.75 s/pair)
#   2. loftr @1600 bs2/bs4 x matmul/gather-upsample  (>=10 pairs/s ETH3D)
# Interp-matmul FLOPs scale H^3 vs the convs' H^2, so the round-4
# "matmul wins @832" verdict must be re-measured at 1600 (backbone.py
# _upsample2x_align_corners docstring).
set -u
cd /root/repo
export GIM_TPU_COMPILE_CACHE=/tmp/gim_tpu_compile_cache

echo "=== waiting for learned-loop queue to drain ==="
while kill -0 "$(cat /tmp/queue.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
echo "=== queue drained at $(date +%T) ==="

run() {  # run <label> <env...> -- <cmd...>
  echo "=== $1 ($(date +%T)) ==="; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done; shift
  env "${envs[@]}" timeout 3600 "$@"
  echo "--- rc=$? ---"
}

run "roma_stages baseline (flash off)" GIM_TPU_FLASH_VIT=0 -- \
    python tools/profile/roma_stages.py
run "roma_stages flash vit"            GIM_TPU_FLASH_VIT=1 -- \
    python tools/profile/roma_stages.py
run "loftr 1600 bs2 matmul-upsample" \
    GIM_TPU_BENCH_IMG=1600 GIM_TPU_BENCH_BATCH=2 -- python bench.py
run "loftr 1600 bs4 matmul-upsample" \
    GIM_TPU_BENCH_IMG=1600 GIM_TPU_BENCH_BATCH=4 -- python bench.py
run "loftr 1600 bs2 gather-upsample" \
    GIM_TPU_GATHER_UPSAMPLE=1 GIM_TPU_BENCH_IMG=1600 GIM_TPU_BENCH_BATCH=2 -- \
    python bench.py
run "loftr 1600 bs4 gather-upsample" \
    GIM_TPU_GATHER_UPSAMPLE=1 GIM_TPU_BENCH_IMG=1600 GIM_TPU_BENCH_BATCH=4 -- \
    python bench.py
echo "=== r5 perf queue DONE ($(date +%T)) ==="
