#!/bin/sh
# Round-4 chip MASTER queue (replaces the r4 post/heads4/pg19v2/rowwrite
# chain, reordered value-per-chip-hour): short measurements first, then the
# multi-hour retrains. Rationale: the round boundary can preempt the chip at
# any time (bench.py SIGSTOPs this queue via /tmp/r4_*queue*.pid), so the
# 10-minute rows that validate already-committed optimizations must not sit
# behind 4-hour trainings.
#
# Order:
#   0. wait for the in-flight MoE twin (train-queue remnant, PID pinned)
#   1. snapshot real-prose-lm-moe
#   2. row-write A/B: select vs scatter at the measured serve shape
#   3. fixed-server HTTP benchmark re-run
#   4. heads=4 dense-LM quality twin (decides the bench heads-flip against
#      real-prose-lm-r4's val_nll 1.7642 @ step 3302 — same corpus snapshot,
#      same protocol, only model.num_heads differs)
#   5. flagship VAE retrain under the fixed early stopping (h8)
#   6. generation rows on the retrained flagship
#   7. heads=4 VAE quality twin (the full-strength flip evidence)
#   8. pg19 free-bits v2 (free_bits=8.0 per-token-liveness floor) + IWAE
#      + reconstruction BLEU
set -x
cd /root/repo
mkdir -p runs/gen_r4

# ---- 0. the MoE twin currently holds the chip (timeout-wrapped train.py)
MOE_PID=14466
while kill -0 "$MOE_PID" 2>/dev/null; do
    sleep 30
done
python tools/snapshot_run.py transformer-lm real-prose-lm-moe

# ---- 2. row-write strategy A/B on the real chip (committed optimization:
# one-hot compare+where cache writes vs batch-varying-index scatters)
SVT_ROW_WRITE=select python gen_bench.py transformer-vae real-prose-vae \
    seq=512 batch=256 modes=none serve=2048 \
    > runs/gen_r4/serve_rowwrite_select.json \
    2> runs/gen_r4/serve_rowwrite_select.log

SVT_ROW_WRITE=scatter python gen_bench.py transformer-vae real-prose-vae \
    seq=512 batch=256 modes=none serve=2048 \
    > runs/gen_r4/serve_rowwrite_scatter.json \
    2> runs/gen_r4/serve_rowwrite_scatter.log

# ---- 3. fixed-server HTTP benchmark (listen backlog + warmup + dead-row
# init), same protocol as the first run so rows are comparable
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

# ---- 3b. train the DRAFT model for two-model speculative decoding
# (models/spec_decode.py): a cheap d256x2 LSTM on the same chunked corpus
# and tokenizer as the d512 targets. Draft quality sets the acceptance
# rate; cost per drafted token must stay far below a target AR step.
timeout 5400 python train.py lstm-lm \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=50000 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=3125 \
    model.d_model=256 model.num_layers=2 model.precision=bf16 \
    model.grad_clip_threshold=150.0 model.init_scale=0.02 model.lr=3e-4 \
    model.tie_embedding_weights=true \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=5000 name=draft-lstm-r4 \
    > /tmp/draft_lstm_train.log 2>&1
python tools/snapshot_run.py lstm-lm draft-lstm-r4

# ---- 3c. draft-model speculative rows: the sampled-mode lever, measured.
# Dense LM target (the classic two-model serving case) and the flagship
# VAE target (draft cannot see z — the acceptance cost of conditioning).
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

# ---- 4. heads=4 dense-LM quality twin (bench.py --heads 4 measured
# 326,769 tok/s vs 285k at heads=8; this is the quality half of the flip
# decision, one run instead of two because real-prose-lm-r4 already
# trained today on the same corpus snapshot)
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

# ---- 5. flagship retrain under the fixed early stopping (h8)
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

# ---- 6. generation rows on the retrained flagship
python gen_bench.py transformer-vae real-prose-vae-r4 seq=8192 batch=1 \
    modes=greedy,sampled draft=3 check=1 \
    > runs/gen_r4/len8192_r4ckpt.json 2> runs/gen_r4/len8192_r4ckpt.log

# ---- 7. heads=4 VAE quality twin (full-strength flip evidence)
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

# ---- 8. pg19 free-bits v2: per-token-liveness floor (free_bits=8.0
# nats/dim = 512 nats/doc >= 5e-3 nats/token at 102,400 tokens) + longer
# early-stopping patience (12 checks ~= 320 steps)
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

echo MASTER_QUEUE_DONE
