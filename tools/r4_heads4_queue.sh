#!/bin/sh
# Round-4 chip queue #4: the heads=4 (Dh=128) quality twin of the flagship
# retrain. bench.py --heads 4 measured 326,769 tokens/s (+14.4% over the
# heads-8 default, past the >=310k round-3 target); whether Dh=128 can BE
# the flagship geometry is a quality question. This run is the matched pair:
# identical corpus/protocol/steps to real-prose-vae-r4 (queued ahead of it
# in tools/r4_train_queue.sh), ONLY model.num_heads differs (8 -> 4; d_model
# 512 and the parameter count are unchanged -- head geometry only).
# Decision rule: val_nll within noise of the heads-8 twin => flip the bench
# flagship geometry to heads=4 and document; materially worse => keep 8 and
# record the measured quality cost next to the measured speed win.
set -x
cd /root/repo
mkdir -p runs/gen_r4

# chip exclusivity: wait for queue #3 (which itself waits for the training queue)
while kill -0 "$(cat /tmp/r4_post_queue.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done

timeout 16000 python train.py transformer-vae \
    data.dataset_name=local-prose data.tokens_per_batch=100000 \
    data.min_tokens_per_sample=512 data.max_tokens_per_sample=50000 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.remat_policy=dots_attn_qkv model.d_model=512 model.num_heads=4 \
    model.grad_checkpointing=true model.grad_clip_threshold=150.0 \
    model.init_scale=0.02 model.attn_window_size=2 \
    model.kl_weight_start=0.1 model.kl_weight_end=1.0 \
    model.kl_annealing_steps=2000 model.latent_depth=64 model.lr=3e-4 \
    model.num_layers=6 model.sparse_self_attention=true \
    model.tie_embedding_weights=true \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=5000 name=real-prose-vae-r4-h4 \
    > /tmp/vae_h4_train.log 2>&1
python tools/snapshot_run.py transformer-vae real-prose-vae-r4-h4

echo HEADS4_QUEUE_DONE
