#!/bin/sh
# Round-5 post queue v2. The tunnel on this boot stalls transiently for
# tens of minutes (see tools/watchdog_run.sh header), so the measured pace
# is ~3-12 s/step instead of ~0.7. Allocation decision, in VERDICT r4's own
# priority order: protect ask #1's flagship h8 retrain with RESUME stints
# until it reaches >=3000 steps (round-2's best was step 3036) or early
# stop, then the cheap decode headline (ask #5), then pg19 free-bits v2
# with everything remaining (ask #2), then a short draft+speculative row
# (ask #4). The h4 twin is the sacrifice — documented, not silent: the
# flagship geometry stays heads=8 pending the twin.
# Usage: r5_post2.sh <pid-of-stage1-watchdog>
set -x
cd /root/repo
echo $$ > /tmp/r5_post2_queue.pid
mkdir -p runs/gen_r5
DEADLINE=${R5_DEADLINE:-1787286300}
left() { echo $(( DEADLINE - $(date +%s) )); }

while kill -0 "${1:-0}" 2>/dev/null; do sleep 30; done

last_step() {
  grep -o '"step": [0-9]*' \
      sparse-vae-logs/transformer-vae/real-prose-vae-r5/metrics.jsonl \
      2>/dev/null | tail -1 | awk '{print $2}'
}

snap() { # $1=experiment $2=run-name $3=commit message
  python tools/snapshot_run.py "$1" "$2"
  python tools/archive_ckpt.py export "$1" "$2"
  git add runs/ && git commit -m "$3"
}

# ---- flagship resume stints until >=3000 steps / early stop / time
STINTS=0
while [ "${STINTS}" -lt 3 ]; do
  S=$(last_step); S=${S:-0}
  [ "$S" -ge 3000 ] && break
  [ "$(left)" -le 9500 ] && break
  grep -q "stopped=early" /tmp/vae_r5_train.log /tmp/vae_r5_resume*.log 2>/dev/null && break
  STINTS=$(( STINTS + 1 ))
  sh tools/watchdog_run.sh 1200 1 \
      sparse-vae-logs/transformer-vae/real-prose-vae-r5/metrics.jsonl \
      /tmp/vae_r5_resume$STINTS.log -- \
      timeout 3600 python train.py transformer-vae \
      from_checkpoint=real-prose-vae-r5 trainer.max_steps=5000
done
snap transformer-vae real-prose-vae-r5 \
    "Flagship h8 retrain under anneal-disarmed early stopping: metrics + params archive"

# ---- decode headline (ask #5)
if [ "$(left)" -gt 1700 ]; then
timeout 1500 python gen_bench.py transformer-vae real-prose-vae-r5 \
    seq=8192 batch=1 modes=greedy,sampled draft=3 check=1 \
    > runs/gen_r5/decode_headline.json 2> runs/gen_r5/decode_headline.log
echo "exit=$?" >> runs/gen_r5/decode_headline.log
git add runs/gen_r5 && git commit -m "Parallel-decode headline re-measured on the retrained flagship"
fi

# ---- pg19 free-bits v2 (ask #2) with everything remaining minus the
# short draft/spec/recon tail
if [ "$(left)" -gt 4500 ]; then
PG_CAP=$(( $(left) - 3300 )); [ "$PG_CAP" -gt 8400 ] && PG_CAP=8400
sh tools/watchdog_run.sh 1200 2 \
    sparse-vae-logs/transformer-vae/real-prose-pg19-fb8/metrics.jsonl \
    /tmp/pg19fb8_train.log -- \
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
if [ "$(left)" -gt 1300 ] && [ -d sparse-vae-logs/transformer-vae/real-prose-pg19-fb8 ]; then
timeout 1200 python tools/pg19_recon.py transformer-vae real-prose-pg19-fb8 \
    step=best out=runs/gen_r5/pg19fb8_recon.json \
    > runs/gen_r5/pg19fb8_recon.log 2>&1
echo "exit=$?" >> runs/gen_r5/pg19fb8_recon.log
git add runs/gen_r5 && git commit -m "pg19 free-bits v2: 100k-token reconstruction BLEU"
fi

# ---- short trained draft + the flagship speculative row (ask #4)
if [ "$(left)" -gt 2600 ]; then
sh tools/watchdog_run.sh 1200 1 \
    sparse-vae-logs/transformer-lm/draft-tlm-r5/metrics.jsonl \
    /tmp/draft_tlm_r5_train.log -- \
    timeout 1300 python train.py transformer-lm \
    data.dataset_name=local-prose data.chunk_documents=true \
    data.tokens_per_batch=50000 data.min_tokens_per_sample=512 \
    data.max_tokens_per_sample=3125 \
    model.loss_chunk_size=2048 model.precision=bf16 \
    model.d_model=256 model.num_heads=4 model.num_layers=2 \
    model.sparse_self_attention=false model.tie_embedding_weights=true \
    model.grad_clip_threshold=150.0 model.init_scale=0.02 model.lr=3e-4 \
    trainer.accumulate_grad_batches=2 trainer.val_check_interval=0.1 \
    trainer.max_steps=1500 name=draft-tlm-r5
snap transformer-lm draft-tlm-r5 \
    "d256x2 transformer draft model trained for speculative decoding"
fi
if [ "$(left)" -gt 1100 ] && [ -d sparse-vae-logs/transformer-lm/draft-tlm-r5 ]; then
timeout 1000 python gen_bench.py transformer-vae real-prose-vae-r5 \
    seq=8192 batch=1 modes=sampled draft=0 \
    spec_draft=transformer-lm:draft-tlm-r5 spec_k=8 \
    > runs/gen_r5/spec_vae_k8.json 2> runs/gen_r5/spec_vae_k8.log
echo "exit=$?" >> runs/gen_r5/spec_vae_k8.log
git add runs/gen_r5 && git commit -m "Speculative decoding on the flagship with a trained draft model"
fi

echo R5_POST2_DONE
