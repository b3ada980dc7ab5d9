#!/bin/sh
# Round-4 chip queue #3: runs after the training queue frees the chip.
# (a) the HTTP serving benchmark re-run against the FIXED server (listen
#     backlog + warmup + dead-row init), same shape as the first run so the
#     rows are comparable; (b) the generation rows on the round-4 flagship
#     retrain (healthier checkpoint under the fixed early stopping) with
#     the on-chip output-equality check.
set -x
cd /root/repo
mkdir -p runs/gen_r4

while kill -0 "$(cat /tmp/r4_train_queue.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done

# (a) fixed-server HTTP benchmark, same protocol as runs/gen_r4/serve_http.json
python serve.py transformer-vae real-prose-vae batch_size=64 \
    max_length=512 slice_steps=64 \
    > runs/gen_r4/serve_http2_server.log 2>&1 &
SRV=$!
python tools/serve_bench.py --requests 512 --concurrency 64 \
    --out runs/gen_r4/serve_http2.json \
    > runs/gen_r4/serve_http2_client.log 2>&1
kill $SRV 2>/dev/null
wait $SRV 2>/dev/null

# (b) generation rows on the round-4 retrained flagship (if it trained)
python gen_bench.py transformer-vae real-prose-vae-r4 seq=8192 batch=1 \
    modes=greedy,sampled draft=3 check=1 \
    > runs/gen_r4/len8192_r4ckpt.json 2> runs/gen_r4/len8192_r4ckpt.log

echo POST_TRAIN_QUEUE_DONE
