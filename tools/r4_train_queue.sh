#!/bin/sh
# Round-4 chip TRAINING queue (VERDICT r3 asks #4, #1e + flagship retrain):
# serialized long jobs on the real TPU, each bounded by a hard timeout and
# followed by an in-repo metrics snapshot (ask #8's auditability half).
# Keys are explicit (not preset=...) because the preset merge wins over the
# dotlist (reference parity, cli.py) and these runs override preset data
# sources with the local corpus.
set -x
cd /root/repo
mkdir -p runs/gen_r4

# chip exclusivity: wait for the measurement queue to finish
while kill -0 "$(cat /tmp/r4_queue2.pid 2>/dev/null)" 2>/dev/null; do
    sleep 20
done

# ---- (1) pg19 + free bits: make the flagship latent live at 100k tokens.
# Round-3 protocol (BASELINE.md "The pg19 configuration, trained" = the
# pg19 preset values with kl_annealing_steps=600) plus model.free_bits=0.25
# (the lever the round-3 controlled triple validated on short docs).
timeout 16000 python train.py transformer-vae \
    data.dataset_name=local-prose data.concat_documents=true \
    data.tokens_per_batch=102912 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=102400 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.remat_policy=dots_attn_qkv model.d_model=512 \
    model.grad_checkpointing=true model.grad_clip_threshold=150.0 \
    model.init_scale=0.02 model.attn_window_size=2 \
    model.kl_weight_start=0.1 model.kl_weight_end=1.0 \
    model.kl_annealing_steps=600 model.free_bits=0.25 \
    model.latent_depth=64 model.lr=3e-4 model.num_layers=6 \
    model.sparse_self_attention=true model.tie_embedding_weights=true \
    trainer.accumulate_grad_batches=4 trainer.val_check_interval=0.5 \
    trainer.max_steps=3000 name=real-prose-pg19-fb \
    > /tmp/pg19fb_train.log 2>&1
python tools/snapshot_run.py transformer-vae real-prose-pg19-fb

# IWAE test NLL at the best checkpoint (round-3 protocol: chunked
# reconstruct_ll over whole ~100k-token documents, 100 samples)
timeout 3600 python test.py transformer-vae real-prose-pg19-fb step=best \
    > runs/gen_r4/pg19fb_iwae.json 2> runs/gen_r4/pg19fb_iwae.log

# Reconstruction BLEU on a held-out ~100k-token document (ask #4's
# done-criterion) from the posterior mean, vs a prior-sample floor.
timeout 3600 python tools/pg19_recon.py transformer-vae real-prose-pg19-fb \
    step=best out=runs/gen_r4/pg19fb_recon.json \
    > runs/gen_r4/pg19fb_recon.log 2>&1

# ---- (2) MoE twin of real-prose-lm (ask #1e), as a CONTROLLED pair:
# the dense twin retrains on today's corpus snapshot so the comparison
# does not lean on round-2's (pre-VM-reset) corpus. Values = the
# nonvae-wikipedia preset's.
timeout 9000 python train.py transformer-lm \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=50000 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=3125 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.remat_policy=dots_attn_qkv model.d_model=512 \
    model.grad_checkpointing=true model.grad_clip_threshold=150.0 \
    model.init_scale=0.02 model.lr=3e-4 model.num_layers=6 \
    model.sparse_self_attention=false model.tie_embedding_weights=true \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=5000 name=real-prose-lm-r4 \
    > /tmp/lm_dense_train.log 2>&1
python tools/snapshot_run.py transformer-lm real-prose-lm-r4

timeout 12000 python train.py transformer-lm \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=50000 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=3125 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.remat_policy=dots_attn_qkv model.d_model=512 \
    model.grad_checkpointing=true model.grad_clip_threshold=150.0 \
    model.init_scale=0.02 model.lr=3e-4 model.num_layers=6 \
    model.sparse_self_attention=false model.tie_embedding_weights=true \
    model.num_experts=8 \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=5000 name=real-prose-lm-moe \
    > /tmp/lm_moe_train.log 2>&1
python tools/snapshot_run.py transformer-lm real-prose-lm-moe

# ---- (3) flagship retrain under the fixed early stopping (the round-4
# trainer change): the monitor now arms at the end of the 2000-step KL
# anneal, so the run is no longer killed mid-anneal at step ~1131.
# Values = the wikipedia preset's with the local-corpus anneal (2000).
timeout 16000 python train.py transformer-vae \
    data.dataset_name=local-prose data.tokens_per_batch=100000 \
    data.min_tokens_per_sample=512 data.max_tokens_per_sample=50000 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.remat_policy=dots_attn_qkv model.d_model=512 \
    model.grad_checkpointing=true model.grad_clip_threshold=150.0 \
    model.init_scale=0.02 model.attn_window_size=2 \
    model.kl_weight_start=0.1 model.kl_weight_end=1.0 \
    model.kl_annealing_steps=2000 model.latent_depth=64 model.lr=3e-4 \
    model.num_layers=6 model.sparse_self_attention=true \
    model.tie_embedding_weights=true \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=5000 name=real-prose-vae-r4 \
    > /tmp/vae_retrain.log 2>&1
python tools/snapshot_run.py transformer-vae real-prose-vae-r4

echo TRAIN_QUEUE_DONE
