"""Named experiment presets — the reference's experiment matrix
(/root/reference/hparam_presets.py) re-expressed for the TPU build.

Same eight presets with the same data/model/trainer override semantics:
LSTM benchmark + wikipedia runs, the dense-vs-sparse transformer ablation,
VAE-vs-plain-LM, and the long-context pg19 configs (102,400-token documents).

One deliberate deviation: sparse-attention geometry is expressed in TPU-native
128-token blocks (the reference used Triton blocks of 32,
sparse_attention.py:13). `attn_window_size` below is therefore in 128-token
blocks, chosen so the attended token span matches or exceeds the reference
preset's span (e.g. reference pg19 window 6x32=192 tokens -> 2x128=256 here).

Every transformer preset also carries the TPU production-path settings
(loss_chunk_size=2048, precision='bf16', remat_policy='dots_attn_qkv' — the
equivalents of the reference's chunked robust_cross_entropy, fp16 AMP, and
per-layer grad checkpointing). Without loss_chunk_size the objective
materializes the full [B, L, 32768] logits tensor, which at the wikipedia
preset's 50k-token documents is a 10 GB fp32 buffer — a guaranteed
single-chip HBM OOM. Presets must run as shipped, so the chunked path is
baked in rather than left to the CLI.

Round-5 additions, each backed by a measured row in BASELINE.md:

- `free_bits` on the VAE presets (beyond-reference). The reference's
  objective collapses its posterior on real text (val_kl ~1e-4 nats/token
  at every trained flagship configuration; its own mc_mutual_info logging
  exists to watch this happen). The round-3 controlled pair measured the
  per-dimension KL floor holding val_kl 23x above the collapsed control at
  statistically identical NLL (`real-prose-fb`, free_bits=0.25, short
  docs), so `wikipedia` ships 0.25. At pg19's 102,400-token documents a
  per-dimension floor must be scaled to the DOCUMENT (round-4 lesson:
  0.25/dim = 16 nats/doc = 1.6e-4 nats/token, semantically nothing), so
  `pg19` ships free_bits=8.0 (>=512 nats/doc >= ~5e-3 nats/token — the
  liveness bar the round-3 short-doc control hit).
- `early_stopping_patience=12` on the VAE presets. Validation runs every
  ~13-27 steps at these corpus/batch sizes, so the default patience of 3
  is a noise-level window; the round-4 flagship run early-stopped
  mid-KL-anneal because of it (the anneal-disarm fix in
  training/trainer.py handles the anneal window; the widened patience
  covers the post-anneal regime).
"""

hparam_presets = {
    'lstm-benchmark': {
        'model': dict(
            bidirectional_encoder=True,
            d_model=1024,
            d_embedding=512,
            grad_clip_threshold=150.0,
            init_scale=None,
            kl_weight_start=0.2,
            kl_annealing_steps=8000,
            latent_depth=64,
            lr=3e-4,
            tie_embedding_weights=True,
            tie_logit_weights=True,
            transformer_encoder=False,
        ),
        'trainer': dict(accumulate_grad_batches=2),
    },
    'lstm-wikipedia': {
        'data': dict(
            dataset_name='wikipedia',
            dataset_config='20200501.en',
            tokens_per_batch=50_000,
            min_tokens_per_sample=512,
            max_tokens_per_sample=25_000,
        ),
        'model': dict(
            bidirectional_encoder=True,
            d_model=2048,
            d_embedding=512,
            grad_clip_threshold=150.0,
            init_scale=None,
            kl_weight_start=1.0,
            kl_annealing_steps=0,
            latent_depth=64,
            lr=3e-4,
            tie_embedding_weights=True,
            tie_logit_weights=True,
            transformer_encoder=False,
        ),
        'trainer': dict(accumulate_grad_batches=2, val_check_interval=0.25),
    },
    'dense-benchmark': {
        'data': dict(
            dataset_name='wikipedia',
            dataset_config='20200501.en',
            tokens_per_batch=50_000,
            min_tokens_per_sample=512,
            max_tokens_per_sample=3_125,
        ),
        'model': dict(
            loss_chunk_size=2048,
            precision='bf16',
            remat_policy='dots_attn_qkv',
            d_model=512,
            grad_checkpointing=True,
            grad_clip_threshold=150.0,
            init_scale=0.02,
            kl_weight_start=0.3,
            kl_weight_end=1.0,
            kl_annealing_steps=8000,
            latent_depth=64,
            lr=3e-4,
            num_layers=6,
            sparse_self_attention=False,
            tie_embedding_weights=True,
        ),
        'trainer': dict(accumulate_grad_batches=2),
    },
    'sparse-benchmark': {
        'data': dict(
            dataset_name='wikipedia',
            dataset_config='20200501.en',
            tokens_per_batch=50_000,
            min_tokens_per_sample=512,
            max_tokens_per_sample=3_125,
        ),
        'model': dict(
            loss_chunk_size=2048,
            precision='bf16',
            remat_policy='dots_attn_qkv',
            d_model=512,
            grad_checkpointing=True,
            grad_clip_threshold=150.0,
            init_scale=0.02,
            kl_weight_start=1.0,
            kl_annealing_steps=0,
            latent_depth=64,
            lr=3e-4,
            num_layers=6,
            sparse_self_attention=True,
            tie_embedding_weights=True,
        ),
        'trainer': dict(accumulate_grad_batches=2),
    },
    'nonvae-wikipedia': {
        'data': dict(
            dataset_name='wikipedia',
            dataset_config='20200501.en',
            tokens_per_batch=50_000,
            min_tokens_per_sample=512,
            max_tokens_per_sample=3_125,
        ),
        'model': dict(
            loss_chunk_size=2048,
            precision='bf16',
            remat_policy='dots_attn_qkv',
            d_model=512,
            grad_checkpointing=True,
            grad_clip_threshold=150.0,
            init_scale=0.02,
            lr=3e-4,
            num_layers=6,
            sparse_self_attention=False,
            tie_embedding_weights=True,
        ),
        'trainer': dict(accumulate_grad_batches=2, val_check_interval=0.1),
    },
    'wikipedia': {
        'data': dict(
            dataset_name='wikipedia',
            dataset_config='20200501.en',
            tokens_per_batch=100_000,
            min_tokens_per_sample=512,
            max_tokens_per_sample=50_000,
        ),
        'model': dict(
            loss_chunk_size=2048,
            precision='bf16',
            remat_policy='dots_attn_qkv',
            d_model=512,
            grad_checkpointing=True,
            grad_clip_threshold=150.0,
            init_scale=0.02,
            attn_window_size=2,       # 2x128-token blocks (ref: 8x32 = 256 tokens)
            kl_weight_start=0.1,
            kl_weight_end=1.0,
            kl_annealing_steps=8000,
            free_bits=0.25,           # round-3 controlled pair: keeps the latent live at equal NLL
            latent_depth=64,
            lr=3e-4,
            num_layers=6,
            sparse_self_attention=True,
            tie_embedding_weights=True,
        ),
        'trainer': dict(accumulate_grad_batches=2, val_check_interval=0.1,
                        early_stopping_patience=12),
    },
    'pg19': {
        'data': dict(
            dataset_name='pg19',
            dataset_config=None,
            tokens_per_batch=102_912,
            min_tokens_per_sample=512,
            max_tokens_per_sample=102_400,
        ),
        'model': dict(
            loss_chunk_size=2048,
            precision='bf16',
            remat_policy='dots_attn_qkv',
            d_model=512,
            grad_checkpointing=True,
            grad_clip_threshold=150.0,
            init_scale=0.02,
            attn_window_size=2,       # 2x128-token blocks (ref: 6x32 = 192 tokens)
            kl_weight_start=0.1,
            kl_weight_end=1.0,
            kl_annealing_steps=8000,
            free_bits=8.0,            # per-DOCUMENT floor: >=512 nats/doc at 102,400 tokens (round-4 scaling lesson)
            latent_depth=64,
            lr=3e-4,
            num_layers=6,
            sparse_self_attention=True,
            tie_embedding_weights=True,
        ),
        'trainer': dict(accumulate_grad_batches=4, val_check_interval=0.5,
                        early_stopping_patience=12),
    },
    'nonvae-pg19': {
        'data': dict(
            dataset_name='pg19',
            dataset_config=None,
            tokens_per_batch=92_672,
            min_tokens_per_sample=512,
            max_tokens_per_sample=92_160,
        ),
        'model': dict(
            loss_chunk_size=2048,
            precision='bf16',
            remat_policy='dots_attn_qkv',
            d_model=512,
            grad_checkpointing=True,
            grad_clip_threshold=150.0,
            init_scale=0.02,
            lr=3e-4,
            num_layers=6,
            sparse_self_attention=True,
            tie_embedding_weights=True,
        ),
        'trainer': dict(accumulate_grad_batches=4, val_check_interval=0.5),
    },
}
