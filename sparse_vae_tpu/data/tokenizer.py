"""BPE tokenizer training / loading.

Mirrors the reference's tokenizer contract exactly
(/root/reference/sparse_vae/text_data_module.py:231-267): a ByteLevelBPE
tokenizer with Roberta-style post-processing, special tokens
[PAD]=0, [CLS]=1, [SEP]=2, cached under
``sparse-vae-pretrained/tokenizers/<dataset>.json``, plus the per-token byte
length table used by the bits-per-byte metric.
"""
from __future__ import annotations

from pathlib import Path
from typing import Iterable, Optional

import numpy as np

PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
SPECIAL_TOKENS = ["[PAD]", "[CLS]", "[SEP]"]


def tokenizer_cache_path(dataset_name: str, root: Optional[Path] = None) -> Path:
    root = root or Path.cwd()
    return root / "sparse-vae-pretrained" / "tokenizers" / f"{dataset_name}.json"


def load_tokenizer(path: Path):
    from tokenizers import Tokenizer
    return Tokenizer.from_file(str(path))


def train_tokenizer(
    text_iterator: Iterable[str],
    vocab_size: int,
    save_path: Optional[Path] = None,
):
    """Train a ByteLevelBPE tokenizer with the reference's specials and
    post-processor (text_data_module.py:244-258)."""
    from tokenizers.implementations import ByteLevelBPETokenizer
    from tokenizers.processors import RobertaProcessing

    tokenizer = ByteLevelBPETokenizer()
    tokenizer.train_from_iterator(
        text_iterator, vocab_size=vocab_size, special_tokens=SPECIAL_TOKENS)
    tokenizer._tokenizer.post_processor = RobertaProcessing(
        sep=("[SEP]", SEP_ID), cls=("[CLS]", CLS_ID))
    if save_path is not None:
        save_path.parent.mkdir(parents=True, exist_ok=True)
        tokenizer.save(str(save_path))
        # Re-load as a plain Tokenizer so train/load paths return the same type
        return load_tokenizer(save_path)
    return tokenizer._tokenizer


def get_or_train_tokenizer(dataset_name: str, text_iterator_fn, vocab_size: int,
                           root: Optional[Path] = None):
    path = tokenizer_cache_path(dataset_name, root)
    if path.exists():
        tokenizer = load_tokenizer(path)
        # BPE saturates below the requested size on small corpora (every
        # possible merge exhausted), so a smaller cached vocab is valid —
        # all token ids still index the [vocab_size] embedding. A larger one
        # would produce out-of-range ids and must be retrained.
        assert tokenizer.get_vocab_size() <= vocab_size, (
            f"Cached tokenizer vocab {tokenizer.get_vocab_size()} > requested "
            f"{vocab_size}; delete {path} to retrain")
        return tokenizer
    return train_tokenizer(text_iterator_fn(), vocab_size, save_path=path)


def bytes_per_token_table(tokenizer, vocab_size: int) -> np.ndarray:
    """Byte length of every vocab entry; specials count as 1 byte
    (text_data_module.py:264-267). Used for the val_bpb metric.

    For byte-level BPE each character of the token string stands for exactly
    one original byte, so the correct byte count is len(token) — the reference
    used len(token.encode()), which overcounts the 2-byte UTF-8 encodings of
    byte-alphabet characters like 'Ġ'.
    """
    table = np.ones(vocab_size, dtype=np.float32)
    for token, token_id in tokenizer.get_vocab().items():
        if token_id >= vocab_size:
            continue
        table[token_id] = len(token) if token_id > SEP_ID else 1
    return table
