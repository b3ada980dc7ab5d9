"""Corpus sources: synthetic (zero-egress), local HF datasets, raw text files.

The reference pipeline (/root/reference/sparse_vae/text_data_module.py:88-170)
downloads a HF dataset, trains/loads a BPE tokenizer, tokenizes to uint16,
filters by length, and splits. This module reproduces that flow behind a
uniform `TokenizedCorpus` interface, adding a deterministic synthetic corpus
so the whole framework runs (and is tested/benchmarked) without network
access.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from .tokenizer import CLS_ID, SEP_ID


@dataclass
class TokenizedCorpus:
    """In-memory tokenized corpus: ragged uint16 docs + metadata.

    Satisfies the interface batching.iterate_epoch expects. For corpora that
    fit the reference's scale (wikipedia subsets, pg19) the uint16 id arrays
    are ~2 bytes/token, same as the reference's uint16 cache
    (text_data_module.py:112-121).
    """
    docs: List[np.ndarray]
    num_bytes: np.ndarray
    titles: Optional[List[str]] = None
    labels: Optional[np.ndarray] = None

    lengths: np.ndarray = field(init=False)

    def __post_init__(self):
        self.lengths = np.array([len(d) for d in self.docs], dtype=np.int64)
        self.num_bytes = np.asarray(self.num_bytes, dtype=np.int64)
        self._arena = None

    def __len__(self):
        return len(self.docs)

    def get_docs(self, indices: Sequence[int]) -> List[np.ndarray]:
        return [self.docs[i] for i in indices]

    def ensure_arena(self):
        """Contiguous uint16 token arena for the native C++ batch packer
        (built once, reused every epoch)."""
        if self._arena is None:
            from .native import TokenArena
            self._arena = TokenArena.from_docs(self.docs)
        return self._arena

    def save(self, path) -> None:
        """Persist the tokenized corpus (the disk token cache the reference
        kept under sparse-vae-datasets, text_data_module.py:112-121): one
        contiguous uint16 arena + offsets + metadata in a single npz."""
        from pathlib import Path
        arena = self.ensure_arena()
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(path,
                 tokens=arena.tokens, offsets=arena.offsets,
                 num_bytes=self.num_bytes,
                 titles=np.asarray(self.titles if self.titles else [],
                                   dtype=object),
                 labels=(self.labels if self.labels is not None
                         else np.array([])))

    @classmethod
    def load(cls, path) -> "TokenizedCorpus":
        z = np.load(path, allow_pickle=True)
        tokens, offsets = z["tokens"], z["offsets"]
        docs = [tokens[int(offsets[i]):int(offsets[i + 1])]
                for i in range(len(offsets) - 1)]
        titles = [str(t) for t in z["titles"]] if z["titles"].size else None
        labels = z["labels"] if z["labels"].size else None
        return cls(docs=docs, num_bytes=z["num_bytes"], titles=titles,
                   labels=labels)

    def filter_by_length(self, min_tokens: int, max_tokens: int) -> "TokenizedCorpus":
        keep = [i for i, L in enumerate(self.lengths)
                if min_tokens <= L <= max_tokens]
        return TokenizedCorpus(
            docs=[self.docs[i] for i in keep],
            num_bytes=self.num_bytes[keep],
            titles=[self.titles[i] for i in keep] if self.titles else None,
            labels=self.labels[keep] if self.labels is not None else None,
        )

    def split(self, test_size: int, seed: int = 7295) -> Dict[str, "TokenizedCorpus"]:
        """Shuffled train/test split (text_data_module.py:155-161)."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.docs))
        test_idx, train_idx = order[:test_size], order[test_size:]

        def take(idx):
            return TokenizedCorpus(
                docs=[self.docs[i] for i in idx],
                num_bytes=self.num_bytes[idx],
                titles=[self.titles[i] for i in idx] if self.titles else None,
                labels=self.labels[idx] if self.labels is not None else None,
            )
        return {"train": take(train_idx), "test": take(test_idx)}


def concatenate_into_streams(corpus: TokenizedCorpus,
                             stream_tokens: int) -> TokenizedCorpus:
    """PG-19-style long-document streams: concatenate the tokenized corpus
    (in document order) into samples of exactly `stream_tokens` tokens.

    The reference's pg19 experiment trains on 102,400-token documents
    (/root/reference/hparam_presets.py:150-157) — PG-19 books are single
    long streams. Corpora without book-length documents (local-prose) get
    the same regime by packing documents back-to-back; byte counts are
    apportioned by each document's bytes-per-token rate so bits-per-byte
    stays exact in total. Position 0 of every stream is set to [CLS] to
    preserve the pipeline's CLS-at-0 contract (sparse attention's
    always-attend-CLS block, VAE z-injection); position 0 is never a
    next-token label, so no prediction target is corrupted.
    """
    if not corpus.docs:
        return corpus
    tokens = np.concatenate(corpus.docs)
    rates = np.concatenate([
        np.full(len(d), corpus.num_bytes[i] / max(len(d), 1))
        for i, d in enumerate(corpus.docs)])
    cum = np.concatenate([[0.0], np.cumsum(rates)])
    docs, num_bytes, titles = [], [], []
    for j, start in enumerate(range(0, len(tokens), stream_tokens)):
        piece = tokens[start:start + stream_tokens].copy()
        piece[0] = CLS_ID
        docs.append(piece)
        num_bytes.append(int(round(cum[start + len(piece)] - cum[start])))
        titles.append(f"stream-{j}")
    return TokenizedCorpus(docs=docs,
                           num_bytes=np.asarray(num_bytes, dtype=np.int64),
                           titles=titles)


# ---------------------------------------------------------------------------
# Synthetic corpus (deterministic, structured enough for BPE + LM training)
# ---------------------------------------------------------------------------

_SYNTH_VOCAB = (
    "the of and to in a is that for it as was with be by on not he this are "
    "at from or have an they which one you were all her she there would their "
    "we him been has when who will no more if out so up said what its about "
    "than into them can only other time new some could these two may first "
    "then do any like my now over such our man me even most made after also "
    "did many off before must well back through years much where your way down "
    "should because each just those people how too good very world still see "
    "own work long here get both between life being under never day same "
    "another know while last might great old year came come since against go "
    "used himself few house use during without again place around however "
    "small found mrs thought went say part once high general upon school every"
).split()


def synthetic_texts(num_docs: int, seed: int = 7295,
                    min_words: int = 20, max_words: int = 400) -> List[dict]:
    """Deterministic pseudo-text documents from a first-order Markov chain
    over a 200-word vocabulary. Structured enough that BPE merges and a small
    LM both have signal to learn."""
    rng = np.random.default_rng(seed)
    v = len(_SYNTH_VOCAB)
    # Sparse-ish transition matrix: each word prefers ~8 successors.
    prefs = rng.integers(0, v, size=(v, 8))
    docs = []
    for i in range(num_docs):
        n = int(rng.integers(min_words, max_words + 1))
        word = int(rng.integers(0, v))
        words = []
        for _ in range(n):
            words.append(_SYNTH_VOCAB[word])
            if rng.random() < 0.85:
                word = int(prefs[word, rng.integers(0, 8)])
            else:
                word = int(rng.integers(0, v))
        text = " ".join(words)
        # Sentence-ish punctuation for BPE structure
        docs.append({"title": f"synthetic-{i}", "text": text + "."})
    return docs


def tokenize_texts(texts: List[dict], tokenizer,
                   chunk_documents: bool = False,
                   max_tokens: Optional[int] = None) -> TokenizedCorpus:
    """Tokenize raw docs; records num_bytes/num_tokens like the reference's
    map fn (data_utils.py:14-26). The tokenizer's Roberta post-processing
    wraps every doc as [CLS] ... [SEP].

    chunk_documents splits overflowing documents into multiple samples of
    <= max_tokens (the reference's return_overflowing_tokens path,
    data_utils.py:20-24) instead of the length filter dropping them.
    """
    encodings = tokenizer.encode_batch([d["text"] for d in texts])
    docs, num_bytes, titles, labels = [], [], [], []
    has_labels = bool(texts) and "label" in texts[0]
    for e, d in zip(encodings, texts):
        ids = np.asarray(e.ids, dtype=np.uint16)
        pieces = [ids]
        if chunk_documents and max_tokens and len(ids) > max_tokens:
            pieces = [ids[i:i + max_tokens]
                      for i in range(0, len(ids), max_tokens)]
        doc_bytes = len(d["text"].encode())
        for j, piece in enumerate(pieces):
            docs.append(piece)
            # Apportion the byte count by token share (bpb stays exact in
            # total across the chunks of a document).
            num_bytes.append(round(doc_bytes * len(piece) / len(ids)))
            titles.append(d.get("title", "") if len(pieces) == 1
                          else f"{d.get('title', '')}#{j}")
            if has_labels:
                labels.append(d["label"])
    return TokenizedCorpus(
        docs=docs, num_bytes=np.asarray(num_bytes, dtype=np.int64),
        titles=titles,
        labels=np.asarray(labels, dtype=np.int64) if has_labels else None)


def load_raw_texts(dataset_name: str, dataset_config: Optional[str],
                   dataset_path: Optional[str], split: Optional[str],
                   synthetic_docs: int = 2000, seed: int = 7295) -> List[dict]:
    """Fetch raw documents for a dataset spec.

    - 'synthetic' -> deterministic generated corpus (no network);
    - 'local-prose' -> real English prose harvested from the host image
      (docstrings + bundled docs; see local_corpus.py) — the zero-egress
      stand-in for the reference's Wikipedia/PG-19 hub downloads;
    - dataset_path -> datasets.load_from_disk (text or pretokenized column);
    - otherwise -> datasets.load_dataset (requires the HF cache or network,
      like the reference's create_dataset, text_data_module.py:88-96).
    """
    if dataset_name == "synthetic":
        return synthetic_texts(synthetic_docs, seed=seed)
    if dataset_name == "local-prose":
        from .local_corpus import build_local_prose
        return build_local_prose()

    import datasets as hfd
    if dataset_path:
        ds = hfd.load_from_disk(dataset_path)
    else:
        ds = hfd.load_dataset(dataset_name, name=dataset_config, split=split)
    if isinstance(ds, hfd.DatasetDict):
        ds = hfd.concatenate_datasets(list(ds.values()))
    cols = ds.column_names
    title_col = "title" if "title" in cols else (
        "short_book_title" if "short_book_title" in cols else None)
    out = []
    for row in ds:
        d = {"text": row["text"]}
        if title_col:
            d["title"] = row[title_col]
        if "label" in cols:
            d["label"] = row["label"]
        out.append(d)
    return out
