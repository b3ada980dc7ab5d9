"""Compute-path ops: attention (dense / blocked-XLA / Pallas kernels),
cross-entropy (chunked XLA / fused Pallas), rotary embeddings, scan RNNs."""
from .attention import (Attention, dense_attention,
                        sliding_window_block_mask,
                        sliding_window_token_mask)
from .cross_entropy import (bits_per_byte, chunked_cross_entropy,
                            sequence_log_likelihood, token_nll)
from .pallas_ce import fused_tied_cross_entropy
from .pallas_kernels import sliding_window_attention_pallas
from .rnn import BiLSTMEncoder, StackedRNN
from .rotary import apply_rotary
from .sliding_window_attention import (sliding_window_attention,
                                       sliding_window_attention_xla)
