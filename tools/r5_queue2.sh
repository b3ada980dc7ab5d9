#!/bin/sh
# Round-5 chip queue 2: serving sensitivity sweep (VERDICT r4 weak #5 —
# "tail set by queueing" was asserted from ONE operating point, batch 64 at
# concurrency 64). Launch AFTER tools/r5_chip_queue.sh finishes (this script
# waits on its pidfile). Sweeps engine batch size at fixed load, then load
# at the round-4 batch size, on the round-5 flagship checkpoint; 512
# heavy-tailed requests per point (the round-4 protocol,
# runs/gen_r4/serve_http2.json).
#
# If queueing sets the tail, p99 should fall superlinearly as engine batch
# rises past the concurrency (more decode rows than in-flight requests ⇒
# near-zero queue wait) and rise with concurrency at fixed batch; if the
# per-row decode path sets it, p99 should be roughly flat across both axes.
set -x
cd /root/repo
echo $$ > /tmp/r5_serve_queue.pid
mkdir -p runs/gen_r5

while kill -0 "$(cat /tmp/r5_chip_queue.pid 2>/dev/null || echo 0)" \
    2>/dev/null; do sleep 30; done

CKPT_EXP=transformer-vae
CKPT_NAME=real-prose-vae-r5
[ -d "sparse-vae-logs/$CKPT_EXP/$CKPT_NAME" ] || exit 0

run_point() { # $1=batch $2=concurrency
  b=$1; c=$2
  nohup python serve.py $CKPT_EXP $CKPT_NAME batch_size=$b max_length=512 \
      slice_steps=64 port=8600 > /tmp/serve_$b.log 2>&1 &
  echo $! > /tmp/serve.pid
  timeout 2400 python tools/serve_bench.py --requests 512 --concurrency $c \
      --health_timeout 1500 \
      --out runs/gen_r5/serve_b${b}_c${c}.json \
      > runs/gen_r5/serve_b${b}_c${c}.log 2>&1
  echo "exit=$?" >> runs/gen_r5/serve_b${b}_c${c}.log
  kill "$(cat /tmp/serve.pid)" 2>/dev/null
  sleep 20
}

# batch sweep at the round-4 load
run_point 32 64
run_point 64 64
run_point 128 64
# load sweep at the round-4 batch
run_point 64 16
run_point 64 128

git add runs/gen_r5 && git commit -m "Serving sensitivity sweep: tail latency vs engine batch and load"
echo SERVE_SWEEP_DONE
