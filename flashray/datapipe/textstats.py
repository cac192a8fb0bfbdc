"""Text analysis over a document table: token counts, quality scores,
language ID, fingerprints.

All stages are stateful actor-pool ``map_batches`` classes: regexes and
language profiles are compiled once per actor in ``__init__`` (never per
batch), work is vectorized per batch. Apply with::

    docs.map_batches(TextStats(), batch_format="pandas", batch_size=4096,
                     concurrency=N)

Token counting is intentionally SQL-reproducible (DuckDB oracle):
``token_count`` = number of ``\\S+`` runs; ``word_chars`` = total length of
those runs.
"""

from __future__ import annotations

import re

import numpy as np

from flashray.datapipe import _util
import pandas as pd

# tiny public stopword seeds per language (language-ID heuristic only)
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
    "it": {"il", "la", "e", "che", "un", "una", "di", "per", "non", "sono"},
    "pt": {"o", "a", "os", "e", "que", "um", "uma", "de", "para", "por"},
}


class TextStats:
    """Quality metrics per document: token_count, word_chars, avg_token_len,
    punct_ratio, digit_ratio, upper_ratio, stopword_ratio (en)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tok = re.compile(r"\S+")
        self.punct = re.compile(r"[^\w\s]")
        self.digit = re.compile(r"\d")
        self.stop = _LANG_STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        toks = s.str.findall(self.tok)
        n_tok = toks.str.len().astype("int64")
        n_char = s.str.len().astype("int64")
        word_chars = toks.map(lambda ws: sum(len(w) for w in ws)).astype("int64")
        batch["token_count"] = n_tok
        batch["word_chars"] = word_chars
        batch["avg_token_len"] = (word_chars / n_tok.clip(lower=1)).astype("float64")
        batch["punct_ratio"] = (
            s.str.count(self.punct) / n_char.clip(lower=1)
        ).astype("float64")
        batch["digit_ratio"] = (
            s.str.count(self.digit) / n_char.clip(lower=1)
        ).astype("float64")
        batch["stopword_ratio"] = toks.map(
            lambda ws: sum(1 for w in ws if w.lower() in self.stop)
            / max(1, len(ws))
        ).astype("float64")
        return batch


class LangId:
    """Stopword-profile language ID (n-gram-free heuristic): argmax language
    by stopword hit-rate; 'und' (undetermined) when nothing matches."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[a-zA-ZÀ-ÿ]+")
        self.profiles = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def _detect(self, text: str) -> str:
        words = [w.lower() for w in self.word.findall(text or "")]
        if not words:
            return "und"
        best, best_score = "und", 0
        for lang, stops in self.profiles.items():
            score = sum(1 for w in words if w in stops)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = batch[self.text_col].map(self._detect)
        return batch


class Fingerprint:
    """Deterministic 63-bit document fingerprint: polynomial rolling hash
    ``h = Σ byte_i · B^(n-1-i) (mod 2^64)`` over UTF-8 bytes, fully
    vectorized per document (content-defined; identical text → identical
    print)."""

    BASE = np.uint64(1099511628211)
    MASK = np.uint64(0x7FFF_FFFF_FFFF_FFFF)

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def _fp(self, text: str) -> np.int64:
        data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
        if len(data) == 0:
            return np.int64(0)
        with np.errstate(over="ignore"):
            pows = np.full(len(data), self.BASE, dtype=np.uint64)
            pows[0] = np.uint64(1)
            pows = np.cumprod(pows)  # B^0 .. B^(n-1), wrapping mod 2^64
            h = np.uint64(np.sum(data.astype(np.uint64) * pows[::-1]))
        return np.int64(h & self.MASK)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = batch[self.text_col].map(self._fp).astype("int64")
        return batch


def add_text_stats(ds, *, text_col: str = "text", concurrency: int = 4,
                   batch_size: int = 4096):
    return ds.map_batches(
        TextStats,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=_util.pool_size(concurrency),
    )


def add_lang_id(ds, *, text_col: str = "text", concurrency: int = 4,
                batch_size: int = 4096):
    return ds.map_batches(
        LangId,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=_util.pool_size(concurrency),
    )


def add_fingerprint(ds, *, text_col: str = "text", concurrency: int = 4,
                    batch_size: int = 4096):
    return ds.map_batches(
        Fingerprint,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=_util.pool_size(concurrency),
    )
