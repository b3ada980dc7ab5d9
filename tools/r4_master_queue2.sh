#!/bin/sh
# Round-4 master queue v2: resumes after the v1 failures (LSTM draft
# hparam keys; serve_bench health deadline < warmup compile). Completed in
# v1: MoE snapshot, rowwrite select/scatter A/B. Remaining, in order.
set -x
cd /root/repo
mkdir -p runs/gen_r4

# ---- fixed-server HTTP benchmark re-run (client health wait now outlasts
# the warmup compile; tools/serve_bench.py --health_timeout 1800 default)
python serve.py transformer-vae real-prose-vae batch_size=64 \
    max_length=512 slice_steps=64 \
    > runs/gen_r4/serve_http2_server.log 2>&1 &
SRV=$!
sleep 20
python tools/serve_bench.py --requests 512 --concurrency 64 \
    --out runs/gen_r4/serve_http2.json \
    > runs/gen_r4/serve_http2_client.log 2>&1
kill $SRV 2>/dev/null
wait $SRV 2>/dev/null

# ---- the d256x2 LSTM draft (speculative decoding): valid LSTM keys only
# (tie_logit_weights, no precision knob — LSTM trains fp32)
timeout 5400 python train.py lstm-lm \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=50000 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=3125 \
    model.d_model=256 model.num_layers=2 \
    model.grad_clip_threshold=150.0 model.init_scale=0.02 model.lr=3e-4 \
    model.tie_logit_weights=true \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=5000 name=draft-lstm-r4 \
    > /tmp/draft_lstm_train.log 2>&1
python tools/snapshot_run.py lstm-lm draft-lstm-r4

# ---- draft-model speculative rows
python gen_bench.py transformer-lm real-prose-lm-r4 seq=8192 batch=1 \
    modes=greedy,sampled draft=0 check=1 \
    spec_draft=lstm-lm:draft-lstm-r4 spec_k=8 \
    > runs/gen_r4/spec_lm_k8.json 2> runs/gen_r4/spec_lm_k8.log

python gen_bench.py transformer-lm real-prose-lm-r4 seq=8192 batch=1 \
    modes=sampled draft=0 \
    spec_draft=lstm-lm:draft-lstm-r4 spec_k=16 \
    > runs/gen_r4/spec_lm_k16.json 2> runs/gen_r4/spec_lm_k16.log

python gen_bench.py transformer-vae real-prose-vae seq=8192 batch=1 \
    modes=sampled draft=3 \
    spec_draft=lstm-lm:draft-lstm-r4 spec_k=8 \
    > runs/gen_r4/spec_vae_k8.json 2> runs/gen_r4/spec_vae_k8.log

# ---- heads=4 dense-LM quality twin
timeout 9000 python train.py transformer-lm \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=50000 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=3125 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.remat_policy=dots_attn_qkv model.d_model=512 model.num_heads=4 \
    model.grad_checkpointing=true model.grad_clip_threshold=150.0 \
    model.init_scale=0.02 model.lr=3e-4 model.num_layers=6 \
    model.sparse_self_attention=false model.tie_embedding_weights=true \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=5000 name=real-prose-lm-r4-h4 \
    > /tmp/lm_h4_train.log 2>&1
python tools/snapshot_run.py transformer-lm real-prose-lm-r4-h4

# ---- flagship retrain under the fixed early stopping (h8)
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

# ---- generation rows on the retrained flagship
python gen_bench.py transformer-vae real-prose-vae-r4 seq=8192 batch=1 \
    modes=greedy,sampled draft=3 check=1 \
    spec_draft=lstm-lm:draft-lstm-r4 spec_k=8 \
    > runs/gen_r4/len8192_r4ckpt.json 2> runs/gen_r4/len8192_r4ckpt.log

# ---- heads=4 VAE quality twin
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

# ---- pg19 free-bits v2
timeout 16000 python train.py transformer-vae \
    data.dataset_name=local-prose data.concat_documents=true \
    data.tokens_per_batch=102912 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=102400 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.remat_policy=dots_attn_qkv model.d_model=512 \
    model.grad_checkpointing=true model.grad_clip_threshold=150.0 \
    model.init_scale=0.02 model.attn_window_size=2 \
    model.kl_weight_start=0.1 model.kl_weight_end=1.0 \
    model.kl_annealing_steps=600 model.free_bits=8.0 \
    model.latent_depth=64 model.lr=3e-4 model.num_layers=6 \
    model.sparse_self_attention=true model.tie_embedding_weights=true \
    trainer.accumulate_grad_batches=4 trainer.val_check_interval=0.5 \
    trainer.early_stopping_patience=12 \
    trainer.max_steps=3000 name=real-prose-pg19-fb8 \
    > /tmp/pg19fb8_train.log 2>&1
python tools/snapshot_run.py transformer-vae real-prose-pg19-fb8

timeout 3600 python test.py transformer-vae real-prose-pg19-fb8 step=best \
    > runs/gen_r4/pg19fb8_iwae.json 2> runs/gen_r4/pg19fb8_iwae.log

timeout 3600 python tools/pg19_recon.py transformer-vae real-prose-pg19-fb8 \
    step=best out=runs/gen_r4/pg19fb8_recon.json \
    > runs/gen_r4/pg19fb8_recon.log 2>&1

echo MASTER_QUEUE_V2_DONE
