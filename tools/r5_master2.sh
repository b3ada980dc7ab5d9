#!/bin/sh
# Round-5 MASTER chip queue — r5_chip_queue.sh re-ordered and re-budgeted to
# the wall actually remaining in the round (~7h at launch). Priorities follow
# VERDICT r4 "top_next": (1) flagship h8 retrain under the fixed early
# stopping, (1b) decode headline on the fresh checkpoint, (1c) heads-4
# quality twin (the Dh=128 geometry decision), (2) pg19 free-bits v2 + its
# IWAE/reconstruction evidence, (4) trained transformer draft + speculative
# rows, (7) flagship IWAE. Each stage snapshots metrics AND archives the
# best params into git (tools/archive_ckpt.py) immediately — the anti-VM-
# reset measure — and commits. bench.py's supervisor preempts via the
# pidfile when the driver needs the chip.
set -x
cd /root/repo
echo $$ > /tmp/r5_master2_queue.pid
mkdir -p runs/gen_r5
DEADLINE=$(( $(date +%s) + ${R5_BUDGET:-23000} ))
left() { echo $(( DEADLINE - $(date +%s) )); }

snap() { # $1=experiment $2=run-name $3=commit message
  python tools/snapshot_run.py "$1" "$2"
  JAX_PLATFORMS=cpu python tools/archive_ckpt.py export "$1" "$2"
  git add runs/ && git commit -m "$3"
}

# ---- 1. Flagship retrain, heads=8 (VERDICT ask #1). Round-2/4 wikipedia-
# preset protocol on local-prose; patience 12 because validation runs every
# ~13 steps here (see r5_chip_queue.sh stage 1 rationale).
sh tools/watchdog_run.sh 1200 2 sparse-vae-logs/transformer-vae/real-prose-vae-r5/metrics.jsonl /tmp/vae_r5_train.log -- \
    timeout 7200 python train.py transformer-vae \
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
    trainer.early_stopping_patience=12 \
    trainer.max_steps=5000 name=real-prose-vae-r5
snap transformer-vae real-prose-vae-r5 \
    "Flagship h8 retrain under anneal-disarmed early stopping: metrics + params archive"

# ---- 1b. Decode-headline re-measure on the fresh checkpoint (ask #5).
if [ "$(left)" -gt 15000 ] && [ -d sparse-vae-logs/transformer-vae/real-prose-vae-r5 ]; then
timeout 1800 python gen_bench.py transformer-vae real-prose-vae-r5 \
    seq=8192 batch=1 modes=greedy,sampled draft=3 check=1 \
    > runs/gen_r5/decode_headline.json 2> runs/gen_r5/decode_headline.log
echo "exit=$?" >> runs/gen_r5/decode_headline.log
git add runs/gen_r5 && git commit -m "Parallel-decode headline re-measured on the retrained flagship"
fi

# ---- 1c. heads=4 quality twin (completes ask #1): matched protocol; the
# val_nll pair at matched steps decides the Dh=128 packed-kernel geometry.
if [ "$(left)" -gt 12500 ]; then
sh tools/watchdog_run.sh 1200 2 sparse-vae-logs/transformer-vae/real-prose-vae-r5-h4/metrics.jsonl /tmp/vae_h4_r5_train.log -- \
    timeout 5400 python train.py transformer-vae \
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
    trainer.early_stopping_patience=12 \
    trainer.max_steps=5000 name=real-prose-vae-r5-h4
snap transformer-vae real-prose-vae-r5-h4 \
    "heads-4 flagship quality twin: matched protocol for the Dh=128 geometry decision"
fi

# ---- 2. pg19 free-bits v2 (ask #2): per-document floor scaled to
# per-token liveness (free_bits=8.0 => >=512 nats/doc), patience 12 at the
# 27-step val cadence. The exact run the VM reset killed.
if [ "$(left)" -gt 5000 ]; then
PG_CAP=$(( $(left) - 4200 )); [ "$PG_CAP" -gt 9000 ] && PG_CAP=9000
sh tools/watchdog_run.sh 1200 2 sparse-vae-logs/transformer-vae/real-prose-pg19-fb8/metrics.jsonl /tmp/pg19fb8_train.log -- \
    timeout "$PG_CAP" python train.py transformer-vae \
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
    trainer.max_steps=3000 name=real-prose-pg19-fb8
snap transformer-vae real-prose-pg19-fb8 \
    "pg19 free-bits v2 trained: per-document KL floor at 100k-token documents"
fi
if [ "$(left)" -gt 3300 ] && [ -d sparse-vae-logs/transformer-vae/real-prose-pg19-fb8 ]; then
timeout 2400 python test.py transformer-vae real-prose-pg19-fb8 step=best \
    > runs/gen_r5/pg19fb8_iwae.json 2> runs/gen_r5/pg19fb8_iwae.log
echo "exit=$?" >> runs/gen_r5/pg19fb8_iwae.log
fi
if [ "$(left)" -gt 1500 ] && [ -d sparse-vae-logs/transformer-vae/real-prose-pg19-fb8 ]; then
timeout 1500 python tools/pg19_recon.py transformer-vae real-prose-pg19-fb8 \
    step=best out=runs/gen_r5/pg19fb8_recon.json \
    > runs/gen_r5/pg19fb8_recon.log 2>&1
echo "exit=$?" >> runs/gen_r5/pg19fb8_recon.log
git add runs/gen_r5 && git commit -m "pg19 free-bits v2: IWAE NLL and 100k-token reconstruction BLEU"
fi

# ---- 4. d256x2 TRANSFORMER draft (ask #4), then speculative rows with a
# REAL (non-uniform) draft against the flagship VAE.
if [ "$(left)" -gt 3600 ]; then
sh tools/watchdog_run.sh 1200 2 sparse-vae-logs/transformer-lm/draft-tlm-r5/metrics.jsonl /tmp/draft_tlm_r5_train.log -- \
    timeout 2100 python train.py transformer-lm \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=50000 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=3125 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.d_model=256 model.num_heads=4 model.num_layers=2 \
    model.sparse_self_attention=false model.tie_embedding_weights=true \
    model.grad_clip_threshold=150.0 model.init_scale=0.02 model.lr=3e-4 \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=3000 name=draft-tlm-r5
snap transformer-lm draft-tlm-r5 \
    "d256x2 transformer draft model trained for speculative decoding"
fi
if [ "$(left)" -gt 1400 ] && [ -d sparse-vae-logs/transformer-lm/draft-tlm-r5 ] \
    && [ -d sparse-vae-logs/transformer-vae/real-prose-vae-r5 ]; then
timeout 1400 python gen_bench.py transformer-vae real-prose-vae-r5 \
    seq=8192 batch=1 modes=sampled draft=0 \
    spec_draft=transformer-lm:draft-tlm-r5 spec_k=8 \
    > runs/gen_r5/spec_vae_k8.json 2> runs/gen_r5/spec_vae_k8.log
echo "exit=$?" >> runs/gen_r5/spec_vae_k8.log
git add runs/gen_r5 && git commit -m "Speculative decoding on the flagship with a trained draft model"
fi

# ---- 7. Flagship IWAE test NLL (restores the test.py evidence row).
if [ "$(left)" -gt 900 ] && [ -d sparse-vae-logs/transformer-vae/real-prose-vae-r5 ]; then
timeout "$(left)" python test.py transformer-vae real-prose-vae-r5 step=best \
    > runs/gen_r5/vae_r5_iwae.json 2> runs/gen_r5/vae_r5_iwae.log
echo "exit=$?" >> runs/gen_r5/vae_r5_iwae.log
git add runs/gen_r5 && git commit -m "Flagship IWAE test NLL on the retrained checkpoint"
fi

echo R5_MASTER_DONE
