"""sparse-vae-tpu: TPU-native hierarchical text-VAE framework.

Public surface mirroring /root/reference/sparse_vae/__init__.py plus the
checkpoint-resolution helpers (:17-44). The reference's
`load_checkpoint_for_name` hard-coded start=2/end=3, disagreeing with its own
tokenizer's [CLS]=1/[SEP]=2 (SURVEY §2.9) — here the specials come from the
tokenizer module constants.
"""
from .data.batching import TextBatch
from .data.text_data_module import TextDataModule, TextDataModuleHparams
from .data.tokenizer import CLS_ID, PAD_ID, SEP_ID
from .hparam_presets import hparam_presets
from .models.base import LanguageModelHparams, VOCAB_SIZE
from .models.conditional_gaussian import ConditionalGaussian
from .models.generation import (DecodeState, SamplingParams, decode_loop,
                                final_output, init_decode_state)
from .models.lstm_lm import LSTMLanguageModel, LSTMLanguageModelHparams
from .models.lstm_vae import LSTMVAE, LSTMVAEHparams
from .models.perceiver import Perceiver
from .models.transformer import Transformer
from .models.transformer_layer import TransformerLayer
from .models.transformer_lm import (TransformerHparams,
                                    TransformerLanguageModel)
from .models.transformer_vae import TransformerVAE, TransformerVAEHparams
from .models.vae import (ContinuousVAEHparams, VAEObjective,
                         estimate_log_prob_iw)
from .training.checkpointing import (CheckpointManager,
                                     get_checkpoint_path_for_name,
                                     restore_checkpoint)
from .training.objectives import ARObjective, batch_arrays
from .training.optimizer import make_optimizer, radam
from .training.trainer import Trainer
from .utils.config import TrainerHparams, merge_into_dataclass, parse_dotlist

def cast_float_params(params, dtype: str = "fp32"):
    """Serving-time weight cast: 'bf16' halves every float param leaf —
    and therefore the per-decode-step HBM weight traffic, the bound on
    single-stream decode throughput. The models cast weights to their
    compute dtype at use anyway, so bf16-stored weights compose with any
    `precision` (fp32 compute reads bf16 weights and upcasts in the fused
    matmul). 'fp32'/'' returns the tree unchanged. Training must keep
    fp32 master weights; this is for inference surfaces only."""
    if dtype in (None, "", "fp32", "float32"):
        return params
    if dtype not in ("bf16", "bfloat16"):
        raise ValueError(f"params_dtype must be fp32 or bf16, got {dtype!r}")
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.bfloat16)
        return x

    return jax.tree.map(cast, params)


MODEL_REGISTRY = {
    "lstm-lm": (LSTMLanguageModel, LSTMLanguageModelHparams, ARObjective),
    "lstm-vae": (LSTMVAE, LSTMVAEHparams, VAEObjective),
    "transformer-lm": (TransformerLanguageModel, TransformerHparams,
                       ARObjective),
    "transformer-vae": (TransformerVAE, TransformerVAEHparams, VAEObjective),
}


def build_model(experiment: str, model_hparams_overrides=None):
    """experiment name -> (module, hparams, objective), the train.py model
    dispatch (/root/reference/train.py:33-52)."""
    if experiment not in MODEL_REGISTRY:
        raise ValueError(f"Unrecognized model type '{experiment}'. "
                         f"Choose from {sorted(MODEL_REGISTRY)}")
    model_cls, hparams_cls, objective_cls = MODEL_REGISTRY[experiment]
    hparams = hparams_cls()
    if model_hparams_overrides:
        hparams = merge_into_dataclass(hparams, model_hparams_overrides)
    module = model_cls(hparams)
    objective = objective_cls(hparams)
    return module, hparams, objective


def load_checkpoint_for_name(experiment: str, name: str, root=None,
                             step=None):
    """Restore a run's checkpoint: returns (module, hparams, objective,
    state dict, meta) (ref __init__.py:27-44). step: None -> newest,
    'best' -> the best-val checkpoint, int -> that step."""
    import jax

    path = get_checkpoint_path_for_name(experiment, name, root)
    if step == "best":
        from .training.checkpointing import checkpoints_dir
        import json as _json
        best_file = checkpoints_dir(experiment, name, root) / "best.json"
        if best_file.exists():
            step = _json.loads(best_file.read_text()).get("step")
        else:
            import warnings
            warnings.warn(
                f"step='best' requested but {best_file} does not exist "
                "(no best-val checkpoint was recorded for this run); "
                "falling back to the NEWEST checkpoint, which may be a "
                "later, overfit step.", stacklevel=2)
            step = None
    if step is not None:
        path = path.parent / f"step_{int(step)}"
    import json
    meta = json.loads((path.parent / "meta.json").read_text())
    module, hparams, objective = build_model(experiment,
                                             meta["model_hparams"])
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    sample = jnp.zeros((1, 128), jnp.int32)
    params = module.init(rng, sample)["params"]
    from .training.optimizer import make_optimizer
    from .utils.schedules import scaled_lr
    thp = meta.get("trainer_hparams", {})
    data_hp = meta.get("data_hparams", {})
    tokens_per_step = (data_hp.get("tokens_per_batch", 50_000)
                       * thp.get("accumulate_grad_batches", 2))
    opt = make_optimizer(
        lr=scaled_lr(hparams.lr, tokens_per_step, hparams.base_batch_size),
        lr_decay_steps=hparams.lr_decay_steps,
        grad_clip_threshold=hparams.grad_clip_threshold,
        weight_decay=hparams.weight_decay, lamb=hparams.lamb)
    template = {"params": params, "opt_state": opt.init(params),
                "step": 0, "rng": rng}
    state = restore_checkpoint(path, template)
    return module, hparams, objective, state, meta
