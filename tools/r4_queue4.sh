#!/bin/sh
# Round-4 queue v4 (v3 + packed-attention A/B): reprioritized tail after v2's draft-LSTM budget miss.
# v2's LSTM draft ran ~35 s/step (fp32 scan over 3125-token samples on the
# tunnel+2-vCPU host) and stayed at uniform; the spec rows it fed are kept
# as the zero-information-draft baseline (runs/gen_r4/spec_*.json). This
# queue: (1) waits for v2's in-flight h4-LM twin (orphaned; v2's sh was
# stopped so its 18h tail cannot launch), (2) trains a d256x2 TRANSFORMER
# draft (~50x faster steps than the LSTM scan), (3) re-measures the spec
# rows with a REAL draft, (4) runs pg19 free-bits v2 (VERDICT ask #4),
# (5) h4 VAE twin only if time remains. Every stage is deadline-guarded so
# the chip frees before the driver's end-of-round bench (which can also
# preempt this queue via /tmp/r4_*queue*.pid — bench.preempt_chip_queues).
set -x
cd /root/repo
mkdir -p runs/gen_r4
DEADLINE=$(( $(date +%s) + 32400 ))
left() { echo $(( DEADLINE - $(date +%s) )); }

# ---- 0. wait for the orphaned real-prose-lm-r4-h4 training, then snapshot
while kill -0 "$(cat /tmp/lm_h4_train.pid 2>/dev/null || echo 12770)" \
    2>/dev/null; do sleep 30; done
sleep 10
python tools/snapshot_run.py transformer-lm real-prose-lm-r4-h4

# ---- 0b. packed-vs-head-major attention A/B at --heads 4 (Dh=128): the
# packed kernels (commit f441e66) remove the custom-call transpose copies;
# measured here back-to-back on the warm chip. Auto-dispatch is packed;
# SVT_PACKED_ATTN=0 is the head-major baseline.
if [ "$(left)" -gt 9000 ]; then
timeout 2700 python bench.py --heads 4 \
    > runs/gen_r4/bench_h4_packed.json 2> runs/gen_r4/bench_h4_packed.log
SVT_PACKED_ATTN=0 timeout 2700 python bench.py --heads 4 \
    > runs/gen_r4/bench_h4_headmajor.json \
    2> runs/gen_r4/bench_h4_headmajor.log
fi

# ---- 1. d256x2 transformer draft for speculative decoding
if [ "$(left)" -gt 6000 ]; then
timeout 4800 python train.py transformer-lm \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=50000 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=3125 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.d_model=256 model.num_heads=4 model.num_layers=2 \
    model.sparse_self_attention=false model.tie_embedding_weights=true \
    model.grad_clip_threshold=150.0 model.init_scale=0.02 model.lr=3e-4 \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=4000 name=draft-tlm-r4 \
    > /tmp/draft_tlm_train.log 2>&1
python tools/snapshot_run.py transformer-lm draft-tlm-r4
fi

# ---- 2. speculative rows with the trained draft
if [ "$(left)" -gt 3600 ]; then
python gen_bench.py transformer-lm real-prose-lm-r4 seq=8192 batch=1 \
    modes=greedy,sampled draft=0 check=1 \
    spec_draft=transformer-lm:draft-tlm-r4 spec_k=8 \
    > runs/gen_r4/spec2_lm_k8.json 2> runs/gen_r4/spec2_lm_k8.log
python gen_bench.py transformer-vae real-prose-vae seq=8192 batch=1 \
    modes=sampled draft=3 \
    spec_draft=transformer-lm:draft-tlm-r4 spec_k=8 \
    > runs/gen_r4/spec2_vae_k8.json 2> runs/gen_r4/spec2_vae_k8.log
python gen_bench.py transformer-vae real-prose-vae seq=8192 batch=1 \
    modes=sampled draft=0 \
    spec_draft=transformer-lm:draft-tlm-r4 spec_k=4 \
    > runs/gen_r4/spec2_vae_k4.json 2> runs/gen_r4/spec2_vae_k4.log
fi

# ---- 3. pg19 free-bits v2 (VERDICT ask #4): hold the latent live at 100k
if [ "$(left)" -gt 10000 ]; then
T=$(( $(left) - 7600 ))
[ "$T" -gt 12000 ] && T=12000
timeout "$T" python train.py transformer-vae \
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
fi
if [ "$(left)" -gt 4000 ] && [ -d sparse-vae-logs/transformer-vae/real-prose-pg19-fb8 ]; then
timeout 3600 python test.py transformer-vae real-prose-pg19-fb8 step=best \
    > runs/gen_r4/pg19fb8_iwae.json 2> runs/gen_r4/pg19fb8_iwae.log
fi
if [ "$(left)" -gt 3700 ] && [ -d sparse-vae-logs/transformer-vae/real-prose-pg19-fb8 ]; then
timeout 3600 python tools/pg19_recon.py transformer-vae real-prose-pg19-fb8 \
    step=best out=runs/gen_r4/pg19fb8_recon.json \
    > runs/gen_r4/pg19fb8_recon.log 2>&1
fi

# ---- 4. heads=4 VAE quality twin, only if time remains (else round 5)
if [ "$(left)" -gt 9500 ]; then
timeout $(( $(left) - 600 )) python train.py transformer-vae \
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
fi
echo QUEUE3_DONE
