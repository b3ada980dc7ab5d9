#!/bin/sh
# Round-4 chip queue #5: A/B the row-wise decode cache-write strategy on the
# real chip. BASELINE.md measured the per-row decode step at ~4.3x the
# lockstep step (29 vs 6.85 ms at batch 256) and attributed it to the
# batch-varying-index XLA scatters in the per-row path; ops/attention.py now
# defaults to a one-hot compare+where rewrite (row_cache_write 'select') with
# the old path kept as SVT_ROW_WRITE=scatter. Same serve workload as the
# measured row (gen_bench serve=2048 batch=256 on real-prose-vae), both
# modes back-to-back, so the BASELINE row can be updated with the new
# step-cost ratio.
set -x
cd /root/repo
mkdir -p runs/gen_r4

while kill -0 "$(cat /tmp/r4_pg19_v2_queue.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done

SVT_ROW_WRITE=select python gen_bench.py transformer-vae real-prose-vae \
    seq=512 batch=256 modes=none serve=2048 \
    > runs/gen_r4/serve_rowwrite_select.json \
    2> runs/gen_r4/serve_rowwrite_select.log

SVT_ROW_WRITE=scatter python gen_bench.py transformer-vae real-prose-vae \
    seq=512 batch=256 modes=none serve=2048 \
    > runs/gen_r4/serve_rowwrite_scatter.json \
    2> runs/gen_r4/serve_rowwrite_scatter.log

echo ROWWRITE_QUEUE_DONE
