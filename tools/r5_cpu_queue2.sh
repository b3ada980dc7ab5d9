#!/bin/sh
# Round-5 host-CPU queue, part 2: completes the LSTM-VAE parity story after
# r5_cpu_queue.sh (which runs ours@clip150, then reference@clip5 because the
# reference@clip150 run diverged — loss=+Inf at step 141, healthy posterior,
# deterministic across two runs). This part:
#   - if OUR clip-150 run also diverged/stopped early, the divergence is a
#     CONFIG property; either way, run OUR side at clip 5.0 to pair with the
#     reference@clip5 row (a matched STABLE pair for the ELBO parity table);
#   - emit the parity tables from whatever pairs exist.
set -x
cd /root/repo
echo $$ > /tmp/r5_cpu_queue2.pid

while kill -0 "$(cat /tmp/r5_cpu_queue.pid 2>/dev/null || echo 0)" \
    2>/dev/null; do sleep 30; done

if [ -f runs/ref-lstm-vae-parity/reference_clip5.jsonl ]; then
JAX_PLATFORMS=cpu nice -n 19 timeout 7200 python train.py lstm-vae \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=4096 data.min_tokens_per_sample=32 \
    data.max_tokens_per_sample=512 data.test_size=32 \
    model.d_model=512 model.d_embedding=256 model.num_layers=1 \
    model.latent_depth=32 model.tie_logit_weights=true \
    model.tie_embedding_weights=true model.bidirectional_encoder=false \
    model.train_mc_samples=1 model.kl_weight_start=0.1 \
    model.kl_weight_end=1.0 model.kl_annealing_steps=150 \
    model.grad_clip_threshold=5.0 model.lr=3e-4 \
    trainer.accumulate_grad_batches=1 trainer.max_steps=300 \
    trainer.val_check_interval=0.0096 name=parity-lstm-vae-clip5 \
    > /tmp/ours_vae_clip5.log 2>&1
python tools/snapshot_run.py lstm-vae parity-lstm-vae-clip5
fi

python tools/ref_parity/parity_table.py \
    runs/ref-lstm-vae-parity/reference.jsonl runs/parity-lstm-vae \
    --metrics val_nll,val_kl,val_loss \
    > runs/ref-lstm-vae-parity/table_clip150.md 2>&1 || true
if [ -d runs/parity-lstm-vae-clip5 ]; then
python tools/ref_parity/parity_table.py \
    runs/ref-lstm-vae-parity/reference_clip5.jsonl \
    runs/parity-lstm-vae-clip5 \
    --metrics val_nll,val_kl,val_loss \
    > runs/ref-lstm-vae-parity/table_clip5.md 2>&1 || true
fi
git add runs/ && git commit -m "LSTM-VAE parity pair: matched tables and the clip-5 twin"
echo CPU_QUEUE2_DONE
