#!/bin/sh
# Round-4 chip queue #2 (VERDICT r3 asks #1c, #6 + the drafting-win audit):
# quick serialized measurements on the real TPU before the long trainings.
set -x
cd /root/repo
mkdir -p runs/gen_r4

# (1) Output-equality audit of the 19.9x greedy drafting win: check=1
# compares the drafted frontier tokens against the AR trajectory on-chip.
python gen_bench.py transformer-vae real-prose-vae seq=8192 batch=1 \
    modes=greedy draft=3 check=1 \
    > runs/gen_r4/len8192_check.json 2> runs/gen_r4/len8192_check.log

# (2) fused_select AR mass-sampling A/B at batch 256 (ask #1c): bench
# --mode generate reports ar vs ar_fused at b >= 64 (random params).
python bench.py --mode generate --batch 256 --seq 512 \
    > runs/gen_r4/ar_fused_256.json 2> runs/gen_r4/ar_fused_256.log

# (3) HTTP serving benchmark (ask #6): live server + concurrent clients
# with heavy-tailed request lengths; p50/p90/p99 + sustained tok/s.
python serve.py transformer-vae real-prose-vae batch_size=64 \
    max_length=512 slice_steps=64 \
    > runs/gen_r4/serve_http_server.log 2>&1 &
SRV=$!
python tools/serve_bench.py --requests 512 --concurrency 64 \
    --out runs/gen_r4/serve_http.json \
    > runs/gen_r4/serve_http_client.log 2>&1
kill $SRV 2>/dev/null
wait $SRV 2>/dev/null

echo QUEUE2_DONE
