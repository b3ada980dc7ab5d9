"""Every named preset must assemble into a valid config and instantiable
model (catches hparam-name drift between presets and dataclasses)."""
import jax
import jax.numpy as jnp
import pytest

from sparse_vae_tpu.cli import assemble_config
from sparse_vae_tpu.hparam_presets import hparam_presets

PRESET_MODEL = {
    'lstm-benchmark': 'lstm-vae',
    'lstm-wikipedia': 'lstm-vae',
    'dense-benchmark': 'transformer-vae',
    'sparse-benchmark': 'transformer-vae',
    'nonvae-wikipedia': 'transformer-lm',
    'wikipedia': 'transformer-vae',
    'pg19': 'transformer-vae',
    'nonvae-pg19': 'transformer-lm',
}


class TestPresets:
    def test_all_presets_accounted_for(self):
        assert set(hparam_presets) == set(PRESET_MODEL)

    @pytest.mark.parametrize("preset", sorted(hparam_presets))
    def test_assembles_and_instantiates(self, preset, rng):
        from sparse_vae_tpu import build_model
        from sparse_vae_tpu.utils.config import to_dict

        cfg = assemble_config(PRESET_MODEL[preset], [f"preset={preset}"])
        module, hparams, objective = build_model(
            PRESET_MODEL[preset], cfg.model_overrides)
        # hparams merged without unknown-key errors; config numbers sane
        assert hparams.vocab_size > 0
        assert cfg.data.tokens_per_batch > 0
        assert type(module).__name__ in (
            "LSTMVAE", "TransformerVAE", "TransformerLanguageModel")

    TRANSFORMER_PRESETS = [p for p, m in PRESET_MODEL.items()
                           if m.startswith('transformer')]

    @pytest.mark.parametrize("preset", sorted(TRANSFORMER_PRESETS))
    def test_transformer_presets_carry_tpu_production_path(self, preset):
        """Presets must run as shipped on a single chip: the chunked
        projection+CE path (no [B, L, 32768] logits buffer — 10 GB fp32 at
        the wikipedia preset's 50k-token documents), bf16 activations, and
        the measured-best remat policy."""
        from sparse_vae_tpu import build_model

        cfg = assemble_config(PRESET_MODEL[preset], [f"preset={preset}"])
        _, hparams, _ = build_model(PRESET_MODEL[preset], cfg.model_overrides)
        assert hparams.loss_chunk_size > 0
        assert hparams.precision == 'bf16'
        assert hparams.remat_policy == 'dots_attn_qkv'
