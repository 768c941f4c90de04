#!/bin/bash
# Chip queue for the round-4 learned-weights loops (VERDICT r3 item 5):
# gim_dkm then gim_lightglue, sequentially (one TPU, one host core).
# Each writes its artifact to docs/artifacts/learned_loop_<head>.json.
set -u
cd /root/repo
mkdir -p docs/artifacts

WORK=/root/repo/.loopwork   # PERSISTENT (survives session restarts):
                            # video + factory stores are head-agnostic;
                            # ckpt dirs are per-head inside (ckpt_<head>);
                            # train resumes from the latest orbax step.

run() {
  local head=$1; shift
  if [ -f "docs/artifacts/learned_loop_${head#gim_}.json" ]; then
    echo "[queue] $(date +%T) $head already done, skipping" \
      | tee -a /tmp/loop_queue.log
    return
  fi
  echo "[queue] $(date +%T) starting $head" | tee -a /tmp/loop_queue.log
  timeout 7200 python -m tools.learned_loop \
      --work_dir "$WORK" --weight "$head" "$@" \
      > "/tmp/loop_${head}.log" 2>&1
  local rc=$?
  echo "[queue] $(date +%T) $head exit=$rc" | tee -a /tmp/loop_queue.log
  if [ $rc -eq 0 ] && [ -f "$WORK/result.json" ]; then
    cp "$WORK/result.json" "docs/artifacts/learned_loop_${head#gim_}.json"
  fi
}

# dkm at bs2/640px OOMs on a 16G v5e (24.2G HLO temps: the 2B symmetric
# scale-1/2 ConvRefiner activations under grad); bs1 fits (~12G).
run gim_dkm --batch_size 1 --max_steps 2000 --eval_pairs 64
run gim_lightglue --batch_size 2 --max_steps 4000 --eval_pairs 64
echo "[queue] ALL DONE" | tee -a /tmp/loop_queue.log
