"""TextDataModule — the end-to-end corpus pipeline facade.

TPU-native counterpart of /root/reference/sparse_vae/text_data_module.py's
LightningDataModule: same hparams and flow (load -> tokenize(BPE 32k,
specials [PAD]/[CLS]/[SEP]) -> length filter -> split -> token-budget
batches), but batches come out of an epoch iterator with a bounded set of
static shapes (see batching.py) instead of a DataLoader with dynamic shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

from .batching import TextBatch, iterate_epoch, plan_batches
from .datasets import TokenizedCorpus, load_raw_texts, tokenize_texts
from .tokenizer import (CLS_ID, PAD_ID, SEP_ID, bytes_per_token_table,
                        get_or_train_tokenizer)


@dataclass
class TextDataModuleHparams:
    """Reference hparams (text_data_module.py:21-33). The reference's
    TextDataModuleHparams class was deleted mid-refactor while still being
    used by its eval scripts (SURVEY.md §2.9) — here it exists for real."""
    tokens_per_batch: int = 50_000
    chunk_documents: bool = False
    # PG-19-style regime for corpora without book-length documents:
    # concatenate the tokenized docs into max_tokens_per_sample-token
    # streams (datasets.concatenate_into_streams) before filtering/splitting.
    concat_documents: bool = False
    dataset_name: str = "synthetic"
    dataset_config: Optional[str] = None
    dataset_path: Optional[str] = None
    min_tokens_per_sample: int = 16
    max_tokens_per_sample: int = 25_000
    split: Optional[str] = None
    vocab_size: int = 2 ** 15
    pad_to_multiple_of: int = 512    # text_data_module.py:50
    synthetic_docs: int = 2000       # only for dataset_name == 'synthetic'
    test_size: Optional[int] = None  # None => min(50_000, 5%) like ref :156


class TextDataModule:
    def __init__(self, hparams: Optional[TextDataModuleHparams] = None, **kwargs):
        if hparams is None:
            hparams = TextDataModuleHparams(**kwargs)
        elif kwargs:
            raise ValueError("Pass either hparams or kwargs, not both")
        self.hparams = hparams
        self._tokenizer = None
        self.splits: Dict[str, TokenizedCorpus] = {}
        self.bytes_per_token: Optional[np.ndarray] = None

    # -- tokenizer ----------------------------------------------------------
    @property
    def tokenizer(self):
        if self._tokenizer is None:
            self.setup_tokenizer()
        return self._tokenizer

    def setup_tokenizer(self, raw_texts=None):
        hp = self.hparams

        def text_iter():
            texts = raw_texts if raw_texts is not None else load_raw_texts(
                hp.dataset_name, hp.dataset_config, hp.dataset_path, hp.split,
                hp.synthetic_docs)
            for batch_start in range(0, len(texts), 1000):
                yield [d["text"] for d in texts[batch_start:batch_start + 1000]]

        def flat_iter():
            for batch in text_iter():
                yield from batch

        self._tokenizer = get_or_train_tokenizer(
            hp.dataset_name, flat_iter, hp.vocab_size)
        self.bytes_per_token = bytes_per_token_table(
            self._tokenizer, hp.vocab_size)

    # -- data preparation ---------------------------------------------------
    def _token_cache_path(self) -> Path:
        """Tokenized-corpus disk cache (reference: uint16 token datasets
        cached under sparse-vae-datasets, text_data_module.py:57,112-121),
        keyed by every hparam that changes the tokenization result."""
        hp = self.hparams
        key = "-".join(str(x) for x in [
            hp.dataset_name, hp.dataset_config or "", hp.split or "",
            hp.synthetic_docs, hp.vocab_size,
            f"chunk{hp.max_tokens_per_sample}" if hp.chunk_documents else
            "whole"]).replace("/", "_")
        return (Path.cwd() / "sparse-vae-datasets" / "tokenized"
                / f"{key}.npz")

    def prepare_data(self, use_cache: bool = True):
        hp = self.hparams
        cache = self._token_cache_path()
        if use_cache and cache.exists():
            self.setup_tokenizer()
            corpus = TokenizedCorpus.load(cache)
        else:
            raw = load_raw_texts(hp.dataset_name, hp.dataset_config,
                                 hp.dataset_path, hp.split,
                                 hp.synthetic_docs)
            self.setup_tokenizer(raw_texts=raw)
            corpus = tokenize_texts(raw, self._tokenizer,
                                    chunk_documents=hp.chunk_documents,
                                    max_tokens=hp.max_tokens_per_sample)
            if use_cache:
                corpus.save(cache)
        if hp.concat_documents:
            from .datasets import concatenate_into_streams
            corpus = concatenate_into_streams(corpus,
                                              hp.max_tokens_per_sample)
        corpus = corpus.filter_by_length(hp.min_tokens_per_sample,
                                         hp.max_tokens_per_sample)
        test_size = hp.test_size
        if test_size is None:
            test_size = min(50_000, max(1, round(len(corpus) * 0.05)))
        self.splits = corpus.split(test_size)

    # -- batch iterators ----------------------------------------------------
    def epoch_batches(self, split: str = "train",
                      seed: Optional[int] = None,
                      drop_remainder: bool = False,
                      rows_multiple_of: int = 1,
                      pad_to_multiple_of: Optional[int] = None
                      ) -> Iterator[TextBatch]:
        """pad_to_multiple_of overrides the configured bucket quantum for
        this iteration only (the sequence-parallel Trainer passes the
        lcm with its band constraint without mutating shared hparams)."""
        rng = np.random.default_rng(seed)
        return iterate_epoch(self.splits[split], self.hparams.tokens_per_batch,
                             pad_to_multiple_of
                             or self.hparams.pad_to_multiple_of, rng,
                             drop_remainder, rows_multiple_of)

    def num_batches(self, split: str = "train") -> int:
        plans = plan_batches(self.splits[split].lengths,
                             self.hparams.tokens_per_batch,
                             self.hparams.pad_to_multiple_of,
                             np.random.default_rng(0))
        return len(plans)

    @property
    def start_token(self) -> int:
        return CLS_ID

    @property
    def end_token(self) -> int:
        return SEP_ID
