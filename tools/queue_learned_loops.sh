#!/bin/bash
# Chip queue for the learned-weights loops (VERDICT r3 item 5 / r4 items
# 2-3): gim_dkm then gim_lightglue, sequentially (one TPU, one host core).
# Each writes its artifact to docs/artifacts/learned_loop_<head>.json.
set -u
cd /root/repo
mkdir -p docs/artifacts

WORK=/root/repo/.loopwork   # PERSISTENT (survives session restarts):
                            # video + factory stores are head-agnostic;
                            # ckpt dirs are per-head inside (ckpt_<head>);
                            # train resumes from the latest orbax step.

# Version stamps (ADVICE r4: never resume stale state silently).
# DATA_VERSION covers synthetic video + factory + propagate generation;
# TRAIN_VERSION covers the train loop / losses / model grads. Bump when
# the respective code or hyperparameters change; mismatch wipes that tier.
DATA_VERSION=1
TRAIN_VERSION=2   # v2: packed-corr gated off under grad; NaN guard;
                  # dkm bs1 arm runs 4000 steps (same total samples as the
                  # original bs2/2000 design — ADVICE r4 comparability)

mkdir -p "$WORK"
if [ "$(cat "$WORK/data_version" 2>/dev/null)" != "$DATA_VERSION" ]; then
  echo "[queue] data version changed -> wiping $WORK stores"
  rm -rf "$WORK/labels" "$WORK/synthtrain.avi"
  echo "$DATA_VERSION" > "$WORK/data_version"
fi
if [ "$(cat "$WORK/train_version" 2>/dev/null)" != "$TRAIN_VERSION" ]; then
  echo "[queue] train version changed -> wiping per-head ckpts/results"
  rm -rf "$WORK"/ckpt_gim_* "$WORK/result.json" "$WORK/dump"
  echo "$TRAIN_VERSION" > "$WORK/train_version"
fi

run() {
  local head=$1; shift
  if [ -f "docs/artifacts/learned_loop_${head#gim_}.json" ]; then
    echo "[queue] $(date +%T) $head already done, skipping" \
      | tee -a /tmp/loop_queue.log
    return
  fi
  echo "[queue] $(date +%T) starting $head" | tee -a /tmp/loop_queue.log
  rm -f "$WORK/result.json"
  timeout 14400 python -m tools.learned_loop \
      --work_dir "$WORK" --weight "$head" "$@" \
      > "/tmp/loop_${head}.log" 2>&1
  local rc=$?
  echo "[queue] $(date +%T) $head exit=$rc" | tee -a /tmp/loop_queue.log
  if [ $rc -eq 0 ] && [ -f "$WORK/result.json" ]; then
    cp "$WORK/result.json" "docs/artifacts/learned_loop_${head#gim_}.json"
  fi
}

# dkm: bs1 (bs2/640px OOMs a 16G v5e even without packed corr — the 2B
# symmetric scale-1/2 ConvRefiner activations under grad). Run the
# grad-path memory check before trusting a shape change:
#   python -m tools.profile.grad_mem_check --head gim_dkm --img 640 --bs 1
# 4000 steps at bs1 = the same total sample count as the original
# bs2/2000 design (ADVICE r4: keep the learned-vs-random result
# comparable; LR stays 2e-4 — effective per-sample LR matches bs2@4e-4
# under the linear scaling rule the loop bypasses).
run gim_dkm --batch_size 1 --max_steps 4000 --eval_pairs 64
run gim_lightglue --batch_size 2 --max_steps 4000 --eval_pairs 64

missing=""
for h in dkm lightglue; do
  [ -f "docs/artifacts/learned_loop_${h}.json" ] || missing="$missing $h"
done
if [ -z "$missing" ]; then
  echo "[queue] ALL DONE" | tee -a /tmp/loop_queue.log
else
  echo "[queue] INCOMPLETE — missing:$missing" | tee -a /tmp/loop_queue.log
fi
