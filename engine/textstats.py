"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Stateful pieces (stopword tables, compiled regexes) live in actor-pool
callables (built once per actor); per-batch work is pandas/numpy
vectorized where the kernel allows.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on",
           "with", "as", "was", "at", "by", "an", "be", "this", "are"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "eine",
           "zu", "den", "mit", "auf", "für", "von", "dem", "sich", "des"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los", "las",
           "por", "con", "para", "del", "se", "no", "al"},
    "fr": {"le", "la", "les", "de", "des", "et", "est", "un", "une", "dans",
           "que", "pour", "qui", "sur", "pas", "au", "du", "ce"},
}

# BPE-ish pre-tokenizer (GPT-2 style contraction/word/number/punct pieces)
_BPEISH = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


class TextAnalyzer:
    """Actor-pool stage: adds lang_id, quality stats, token counts and a
    64-bit rolling-hash fingerprint to a documents batch."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[^\W\d_]+", re.U)
        self.bpeish = re.compile(_BPEISH)
        self.punct = re.compile(r"[^\w\s]", re.U)
        self.cjk = re.compile(r"[一-鿿぀-ヿ가-힯]")
        self.stop = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def lang_of(self, text: str) -> str:
        if not text:
            return "unknown"
        if len(self.cjk.findall(text)) > max(4, 0.2 * len(text)):
            return "zh"
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return "unknown"
        best, best_score = "unknown", 0.0
        for lang, sw in self.stop.items():
            score = sum(1 for w in words if w in sw) / len(words)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score >= 0.05 else "unknown"

    def fingerprint(self, text: str) -> int:
        """64-bit FNV-style rolling hash over word tokens (stable)."""
        h = 0xCBF29CE484222325
        for w in self.word.findall((text or "").lower()):
            h = ((h ^ zlib.crc32(w.encode())) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        col = batch[self.text_col].fillna("")
        batch = batch.copy()
        batch["lang_id"] = [self.lang_of(t) for t in col]
        n_chars = col.str.len()
        words_per_doc = [self.word.findall(t.lower()) for t in col]
        n_words = pd.Series([len(w) for w in words_per_doc], index=batch.index)
        n_punct = col.str.count(self.punct)
        stop_en = self.stop["en"]
        stop_ratio = pd.Series(
            [
                (sum(1 for w in ws if w in stop_en) / len(ws)) if ws else 0.0
                for ws in words_per_doc
            ],
            index=batch.index,
        )
        mean_wlen = pd.Series(
            [(np.mean([len(w) for w in ws]) if ws else 0.0) for ws in words_per_doc],
            index=batch.index,
        )
        batch["n_chars"] = n_chars.astype("int64")
        batch["n_words"] = n_words.astype("int64")
        batch["punct_ratio"] = (n_punct / n_chars.clip(lower=1)).astype("float64")
        batch["stopword_ratio"] = stop_ratio
        batch["mean_word_len"] = mean_wlen
        batch["n_tokens_ws"] = col.str.strip().str.split().map(
            lambda x: len(x) if isinstance(x, list) else 0
        ).astype("int64")
        batch["n_tokens_bpeish"] = col.map(
            lambda t: len(self.bpeish.findall(t))
        ).astype("int64")
        # simple composite quality score in [0, 1]
        batch["quality"] = (
            (batch["n_words"].clip(0, 200) / 200.0) * 0.4
            + (1.0 - batch["punct_ratio"].clip(0, 0.5) * 2) * 0.3
            + batch["stopword_ratio"].clip(0, 0.5) * 2 * 0.3
        ).astype("float64")
        batch["fingerprint"] = pd.array(
            [self.fingerprint(t) for t in col], dtype="UInt64"
        )
        return batch


def analyze(
    ds: ray.data.Dataset,
    text_col: str = "text",
    concurrency: int | tuple | None = None,
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """documents → documents + (lang_id, n_chars, n_words, punct_ratio,
    stopword_ratio, mean_word_len, n_tokens_ws, n_tokens_bpeish, quality,
    fingerprint)."""
    from .util import default_concurrency

    if concurrency is None:
        concurrency = default_concurrency()
    return ds.map_batches(
        TextAnalyzer,
        fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
