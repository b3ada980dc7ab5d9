"""ctypes bindings for the native host-side data path (native/packer.cc).

A memory-mapped uint16 token arena (the disk layout matching the reference's
uint16 token cache, text_data_module.py:112-121) plus a C++ batch packer
that widens+pads documents straight into the [rows, L] int32 batch buffer —
the work the reference did in 10 DataLoader worker processes
(text_data_module.py:175-228). Falls back to the numpy collate when the
shared library hasn't been built (``make -C native``).
"""
from __future__ import annotations

import ctypes
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_CHECKED = False


def _find_library() -> Optional[Path]:
    root = Path(__file__).resolve().parents[2]
    candidate = root / "native" / "libsvtnative.so"
    return candidate if candidate.exists() else None


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_CHECKED
    if _LIB_CHECKED:
        return _LIB
    _LIB_CHECKED = True
    path = _find_library()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.svt_pack_batch.restype = ctypes.c_int
    lib.svt_pack_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.svt_bucket_lengths.restype = None
    lib.svt_bucket_lengths.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_library() is not None


class TokenArena:
    """Contiguous uint16 token storage with [n_docs+1] offsets.

    Built from ragged docs in memory, or memory-mapped from the cache file
    written by `save`. This is the zero-copy substrate the C packer reads.
    """

    MAGIC = b"SVTC\x01\x00\x00\x00"

    def __init__(self, tokens: np.ndarray, offsets: np.ndarray):
        assert tokens.dtype == np.uint16 and offsets.dtype == np.uint64
        self.tokens = tokens
        self.offsets = offsets

    @classmethod
    def from_docs(cls, docs: Sequence[np.ndarray]) -> "TokenArena":
        lengths = np.array([len(d) for d in docs], dtype=np.uint64)
        offsets = np.zeros(len(docs) + 1, dtype=np.uint64)
        np.cumsum(lengths, out=offsets[1:])
        tokens = np.empty(int(offsets[-1]), dtype=np.uint16)
        for i, d in enumerate(docs):
            tokens[int(offsets[i]):int(offsets[i + 1])] = d
        return cls(tokens, offsets)

    def save(self, path: Path):
        with open(path, "wb") as f:
            f.write(self.MAGIC)
            n = np.uint64(len(self.offsets) - 1)
            f.write(n.tobytes())
            f.write(self.offsets.tobytes())
            f.write(self.tokens.tobytes())

    @classmethod
    def load(cls, path: Path) -> "TokenArena":
        with open(path, "rb") as f:
            magic = f.read(8)
            assert magic == cls.MAGIC, f"Bad token cache magic: {magic!r}"
            n = int(np.frombuffer(f.read(8), np.uint64)[0])
        header = 16
        offsets = np.memmap(path, np.uint64, "r", offset=header,
                            shape=(n + 1,))
        tokens = np.memmap(path, np.uint16, "r",
                           offset=header + (n + 1) * 8)
        return cls(np.asarray(tokens), np.asarray(offsets))

    @property
    def lengths(self) -> np.ndarray:
        return (self.offsets[1:] - self.offsets[:-1]).astype(np.int64)

    def doc(self, i: int) -> np.ndarray:
        return self.tokens[int(self.offsets[i]):int(self.offsets[i + 1])]


def pack_batch(arena: TokenArena, doc_indices: Sequence[int], rows: int,
               bucket_len: int):
    """[rows, bucket_len] int32 batch + [rows] num_tokens via the C packer
    (numpy fallback when the library isn't built)."""
    idx = np.ascontiguousarray(doc_indices, dtype=np.int64)
    lib = load_library()
    out = np.empty((rows, bucket_len), dtype=np.int32)
    num_tokens = np.empty((rows,), dtype=np.int32)
    if lib is not None:
        tokens = np.ascontiguousarray(arena.tokens)
        offsets = np.ascontiguousarray(arena.offsets)
        rc = lib.svt_pack_batch(
            tokens.ctypes.data, offsets.ctypes.data, idx.ctypes.data,
            len(idx), rows, bucket_len, out.ctypes.data,
            num_tokens.ctypes.data)
        assert rc == 0, "svt_pack_batch failed"
        return out, num_tokens
    out[:] = 0
    num_tokens[:] = 0
    for r, i in enumerate(idx):
        doc = arena.doc(int(i))
        L = min(len(doc), bucket_len)
        out[r, :L] = doc[:L].astype(np.int32)
        num_tokens[r] = L
    return out, num_tokens


def bucket_lengths(lengths: np.ndarray, multiple: int) -> np.ndarray:
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    lib = load_library()
    out = np.empty_like(lengths)
    if lib is not None:
        lib.svt_bucket_lengths(lengths.ctypes.data, len(lengths),
                               multiple, out.ctypes.data)
        return out
    return ((lengths + multiple - 1) // multiple) * multiple
