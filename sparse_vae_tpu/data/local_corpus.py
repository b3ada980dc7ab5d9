"""Zero-egress real-text corpus: English prose already present on the host.

The reference trains on Wikipedia/PG-19 pulled from the HF hub
(/root/reference/sparse_vae/text_data_module.py:88-96). This environment has
no network egress and no cached hub datasets, so the only *real* (non-
synthetic, human-written) text available is what ships inside the image:

- docstrings of every installed Python package (~90 MB of genuine technical
  English across numpy/scipy/pandas/tensorflow/torch/... — extracted per
  module with `ast`, no code execution);
- documentation files (.md/.rst/.txt) bundled inside site-packages;
- /usr/share/doc READMEs and copyright files.

One document per module/file, titled by its path, mirroring the reference's
{title, text} schema so the rest of the pipeline (tokenizer training, uint16
cache, length filter, split) is identical to the hub path.
"""
from __future__ import annotations

import ast
import gzip
import os
import site
import sys
import warnings
from pathlib import Path
from typing import Iterator, List, Optional

_DOC_EXTS = {".md", ".rst", ".txt"}
_SKIP_FILE_HINTS = ("LICENSE", "NOTICE", "RECORD", "METADATA", "WHEEL",
                    "requirements", "entry_points")
_SKIP_DIR_HINTS = ("__pycache__", ".dist-info", "node_modules")


def _module_prose(path: str) -> str:
    """All docstrings of a module, in source order, joined as one document."""
    try:
        with open(path, encoding="utf-8", errors="ignore") as f:
            src = f.read()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", SyntaxWarning)
            tree = ast.parse(src)
    except (SyntaxError, ValueError, OSError, RecursionError, MemoryError):
        return ""
    parts: List[str] = []
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            doc = ast.get_docstring(node)
            if doc:
                parts.append(doc.strip())
    return "\n\n".join(parts)


def _read_text(path: str, limit: int = 4 << 20) -> str:
    try:
        if path.endswith(".gz"):
            with gzip.open(path, "rt", encoding="utf-8", errors="ignore") as f:
                return f.read(limit)
        with open(path, encoding="utf-8", errors="ignore") as f:
            return f.read(limit)
    except OSError:
        return ""


def _looks_english(text: str) -> bool:
    """Cheap prose filter: mostly-ASCII, word-like density, has sentences."""
    if not text:
        return False
    sample = text[:8000]
    letters = sum(c.isalpha() for c in sample)
    spaces = sample.count(" ") + sample.count("\n")
    if letters < 0.45 * len(sample) or spaces < 0.08 * len(sample):
        return False
    return ". " in sample or ".\n" in sample


def _iter_roots() -> Iterator[Path]:
    seen = set()
    for root in site.getsitepackages() + [
            os.path.dirname(os.__file__), "/usr/share/doc"]:
        p = Path(root)
        if p.exists() and str(p) not in seen:
            seen.add(str(p))
            yield p


def build_local_prose(min_chars: int = 2000,
                      roots: Optional[List[Path]] = None) -> List[dict]:
    """Scan the host for English prose and return [{title, text}, ...].

    Deterministic: files are visited in sorted order, so the corpus (and
    everything keyed off it — tokenizer, splits) is reproducible across runs
    on the same image.
    """
    docs: List[dict] = []
    for root in (roots or list(_iter_roots())):
        for dirpath, dirnames, filenames in os.walk(root):
            if any(h in dirpath for h in _SKIP_DIR_HINTS):
                dirnames[:] = []
                continue
            dirnames.sort()
            for fname in sorted(filenames):
                if any(h in fname for h in _SKIP_FILE_HINTS):
                    continue
                fpath = os.path.join(dirpath, fname)
                rel = os.path.relpath(fpath, root)
                text = ""
                if fname.endswith(".py"):
                    text = _module_prose(fpath)
                elif (Path(fname).suffix in _DOC_EXTS
                      or fname.endswith(tuple(e + ".gz" for e in _DOC_EXTS))
                      or fname.startswith("README")):
                    text = _read_text(fpath)
                if len(text) >= min_chars and _looks_english(text):
                    docs.append({"title": rel.replace(os.sep, "/"),
                                 "text": text})
    return docs


if __name__ == "__main__":
    corpus = build_local_prose()
    total = sum(len(d["text"]) for d in corpus)
    print(f"{len(corpus)} documents, {total / 1e6:.1f} MB prose",
          file=sys.stderr)
