#!/bin/sh
# Round-5 post queue 3 (tail): the serving sensitivity sweep (VERDICT r4
# weak #5 — "tail set by queueing" was asserted from ONE operating point,
# batch 64 at concurrency 64), time-budgeted so it only spends what the
# higher-priority post2 stages (flagship retrain, decode headline, pg19
# free-bits v2, trained-draft speculative row) leave over.
#
# Point order = information per minute: first re-baseline b64c64 on the
# round-5 checkpoint (comparability with runs/gen_r4/serve_http2.json),
# then the batch axis at fixed load (b128, b32), then the load axis at
# fixed batch (c16, c128). If queueing sets the tail, p99 falls
# superlinearly as engine batch rises past the concurrency and rises with
# concurrency at fixed batch; if the per-row decode path sets it, p99 is
# roughly flat across both axes.
set -x
cd /root/repo
echo $$ > /tmp/r5_post3_queue.pid
mkdir -p runs/gen_r5
DEADLINE=${R5_DEADLINE:-1787286300}
left() { echo $(( DEADLINE - $(date +%s) )); }

while kill -0 "$(cat /tmp/r5_post2_queue.pid 2>/dev/null || echo 0)" \
    2>/dev/null; do sleep 30; done

CKPT_EXP=transformer-vae
CKPT_NAME=real-prose-vae-r5

run_point() { # $1=batch $2=concurrency $3=min-seconds-needed
  [ "$(left)" -gt "$3" ] || return 0
  [ -d "sparse-vae-logs/$CKPT_EXP/$CKPT_NAME" ] || return 0
  b=$1; c=$2
  nohup python serve.py $CKPT_EXP $CKPT_NAME batch_size=$b max_length=512 \
      slice_steps=64 port=8600 > /tmp/serve_$b.log 2>&1 &
  echo $! > /tmp/serve.pid
  timeout $(( $3 - 120 )) python tools/serve_bench.py \
      --requests 512 --concurrency $c --health_timeout 1200 \
      --out runs/gen_r5/serve_b${b}_c${c}.json \
      > runs/gen_r5/serve_b${b}_c${c}.log 2>&1
  echo "exit=$?" >> runs/gen_r5/serve_b${b}_c${c}.log
  kill "$(cat /tmp/serve.pid)" 2>/dev/null
  wait "$(cat /tmp/serve.pid)" 2>/dev/null
  sleep 15
  git add runs/gen_r5 && git commit -m "Serving sweep point: batch=$b concurrency=$c on the round-5 flagship"
}

# First point pays the cold decode-graph compile; later points share the
# cached program only when the engine batch is unchanged, so batch-axis
# points budget for a recompile.
run_point 64 64 1900
run_point 128 64 1700
run_point 32 64 1700
run_point 64 16 1100
run_point 64 128 1100

# Catch-all: leave no measurement artifact untracked at round end
# (VERDICT r4 weak #7).
git add runs/ BASELINE.md 2>/dev/null
git diff --cached --quiet || git commit -m "Round-5 artifact catch-all: remaining run evidence"
echo R5_POST3_DONE
