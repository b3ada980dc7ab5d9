"""Model families (reference parity: lstm-lm, lstm-vae, transformer-lm,
transformer-vae) plus the Jacobi parallel decoder."""
from .conditional_gaussian import ConditionalGaussian
from .generation import (DecodeState, SamplingParams, decode_loop,
                         process_logits, top_p_filter)
from .lstm_lm import LSTMLanguageModel, LSTMLanguageModelHparams
from .lstm_vae import LSTMVAE, LSTMVAEHparams
from .parallel_decode import jacobi_decode
from .perceiver import Perceiver
from .transformer import Transformer
from .transformer_layer import TransformerLayer
from .transformer_lm import TransformerHparams, TransformerLanguageModel
from .transformer_vae import TransformerVAE, TransformerVAEHparams
from .vae import (ContinuousVAEHparams, VAEObjective, estimate_log_prob_iw,
                  iwae_dreg_loss)
