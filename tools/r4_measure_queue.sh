#!/bin/sh
# Round-4 chip measurement queue (VERDICT r3 asks #1a-d, #5): serialized
# gen_bench runs against the retrained real-prose-vae checkpoint on the
# real TPU. Each inner run is self-supervised (bounded timeout, always
# emits a JSON line); outputs land in runs/gen_r4/ for in-repo audit.
set -x
cd /root/repo
mkdir -p runs/gen_r4

# (a) continuous-batching serve vs lockstep, the reference's mass-sampling
# shape (sample.py: 700k x <=512, batch 1000 -> here 2048 docs, batch 256)
python gen_bench.py transformer-vae real-prose-vae modes=none serve=2048 \
    batch=256 seq=512 > runs/gen_r4/serve_fp32.json 2> runs/gen_r4/serve_fp32.log

# (b) the bf16 serving-weight A/B at the same shape
python gen_bench.py transformer-vae real-prose-vae modes=none serve=2048 \
    batch=256 seq=512 params_dtype=bf16 \
    > runs/gen_r4/serve_bf16.json 2> runs/gen_r4/serve_bf16.log

# (c) greedy + sampled at 1x8192 with drafting: frontier greedy win,
# speculative sampled row + accepted-tokens/pass (asks #1d, #5)
python gen_bench.py transformer-vae real-prose-vae seq=8192 batch=1 \
    modes=greedy,sampled draft=3 \
    > runs/gen_r4/len8192_fp32.json 2> runs/gen_r4/len8192_fp32.log

# (d) the bf16 A/B on the single-stream greedy path (weight-bandwidth bound)
python gen_bench.py transformer-vae real-prose-vae seq=8192 batch=1 \
    modes=greedy draft=3 params_dtype=bf16 \
    > runs/gen_r4/len8192_bf16.json 2> runs/gen_r4/len8192_bf16.log

echo QUEUE_DONE
