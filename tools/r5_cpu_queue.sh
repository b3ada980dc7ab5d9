#!/bin/sh
# Round-5 host-CPU queue: the LSTM-VAE parity pair (VERDICT r4 ask #3).
# Serialized and nice'd — the 2-vCPU host also feeds the chip queue, so at
# most ONE heavy CPU job runs at a time. Stage order:
#   1. wait for the in-flight reference LSTM-VAE run (pid /tmp/ref_vae.pid)
#   2. OUR side at the bit-matched config (train.py lstm-vae)
#   3. if the reference run diverged (NaN — first run did, at kl_weight~1.0),
#      re-run the reference at its OWN default grad clip (5.0, vs the 150
#      both matched runs use) to separate "reference VAE path needs its
#      tighter clip" from harness artifacts.
set -x
cd /root/repo
echo $$ > /tmp/r5_cpu_queue.pid

while kill -0 "$(cat /tmp/ref_vae.pid 2>/dev/null || echo 0)" 2>/dev/null; do
    sleep 30
done

JAX_PLATFORMS=cpu nice -n 19 timeout 7200 python train.py lstm-vae \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=4096 data.min_tokens_per_sample=32 \
    data.max_tokens_per_sample=512 data.test_size=32 \
    model.d_model=512 model.d_embedding=256 model.num_layers=1 \
    model.latent_depth=32 model.tie_logit_weights=true \
    model.tie_embedding_weights=true model.bidirectional_encoder=false \
    model.train_mc_samples=1 model.kl_weight_start=0.1 \
    model.kl_weight_end=1.0 model.kl_annealing_steps=150 \
    model.grad_clip_threshold=150.0 model.lr=3e-4 \
    trainer.accumulate_grad_batches=1 trainer.max_steps=300 \
    trainer.val_check_interval=0.0096 name=parity-lstm-vae \
    > /tmp/ours_vae_train.log 2>&1
python tools/snapshot_run.py lstm-vae parity-lstm-vae
git add runs/ && git commit -m "LSTM-VAE parity: our side of the matched pair"

if grep -q '"diverged": true' runs/ref-lstm-vae-parity/reference.jsonl; then
nice -n 19 timeout 9000 python tools/ref_parity/train_ref_lstm_vae.py \
    --max_steps 300 --val_every 50 --grad_clip 5.0 \
    --out runs/ref-lstm-vae-parity/reference_clip5.jsonl \
    > /tmp/ref_vae_clip5.log 2>&1
git add runs/ && git commit -m "Reference LSTM-VAE rerun at its own default grad clip"
fi
echo CPU_QUEUE_DONE
