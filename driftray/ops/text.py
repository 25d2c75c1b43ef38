"""Text-analysis operators for large-scale training-data pipelines.

Actor-pool ``map_batches`` stages over the ``documents`` table: language ID
(n-gram/stopword heuristic), quality scoring (length/punct/stopword
ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (rolling hash).  Regexes and stopword tables are compiled
ONCE per actor in ``__init__`` (reference pattern: per-scan recompilation in
``/root/reference/src/data_sources/web/news.py:400-413`` is what we avoid).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "on", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour", "dans"},
}

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (public GPT-2-style pattern family, simplified to stdlib `re`)
_BPE_RE = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"
_WS_RE = r"\S+"


class TokenCounter:
    """Adds ``n_tokens_ws`` (whitespace tokens) and ``n_tokens_bpe``
    (BPE-ish regex pieces) columns, vectorized via pandas str.count."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.ws = re.compile(_WS_RE)
        self.bpe = re.compile(_BPE_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        batch["n_tokens_ws"] = s.str.count(_WS_RE).astype("int64")
        batch["n_tokens_bpe"] = s.str.count(_BPE_RE).astype("int64")
        return batch


class LangId:
    """Stopword-voting language heuristic over {en,de,es,fr} plus a CJK
    codepoint check for zh.  Deterministic; ties break lexicographically.
    Emits ``lang_pred`` and ``lang_score`` (winning vote share)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.langs = sorted(_STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds, scores = [], []
        for text in batch[self.text_col].fillna(""):
            cjk = sum(1 for ch in text[:2000] if "一" <= ch <= "鿿")
            words = [w.lower() for w in self.word.findall(text[:4000])]
            if cjk > max(3, len(words) // 4):
                preds.append("zh")
                scores.append(1.0)
                continue
            votes = {lg: sum(w in _STOPWORDS[lg] for w in words) for lg in self.langs}
            best = max(self.langs, key=lambda lg: (votes[lg], lg))
            total = max(1, len(words))
            preds.append(best if votes[best] > 0 else "unk")
            scores.append(votes[best] / total)
        batch["lang_pred"] = preds
        batch["lang_score"] = np.round(scores, 6)
        return batch


class QualityScorer:
    """Length / punctuation-ratio / stopword-ratio quality heuristics
    (the engine-side analogue of the reference's quality-score stub,
    ``/root/reference/DESIGN.md:386-391``).  Emits ``punct_ratio``,
    ``stopword_ratio``, ``mean_word_len`` and a combined ``quality`` in
    [0, 1]."""

    def __init__(self, text_col: str = "text",
                 len_range: tuple[int, int] = (50, 100_000)):
        self.text_col = text_col
        self.len_range = len_range
        self.word = re.compile(r"[A-Za-z]+")
        self.punct = re.compile(r"[^\w\s]")
        self.stop = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_chars = s.str.len().to_numpy()
        n_punct = s.str.count(r"[^\w\s]").to_numpy()
        punct_ratio = n_punct / np.maximum(n_chars, 1)
        stop_ratio = np.empty(len(s))
        mean_wlen = np.empty(len(s))
        for i, text in enumerate(s):
            words = self.word.findall(text[:8000])
            stop_ratio[i] = (sum(w.lower() in self.stop for w in words)
                             / max(1, len(words)))
            mean_wlen[i] = (sum(map(len, words)) / max(1, len(words)))
        lo, hi = self.len_range
        len_ok = ((n_chars >= lo) & (n_chars <= hi)).astype(float)
        # well-formed text: some stopwords, modest punctuation, sane word len
        q = (0.4 * len_ok
             + 0.2 * np.clip(stop_ratio / 0.2, 0, 1)
             + 0.2 * (1.0 - np.clip(punct_ratio / 0.3, 0, 1))
             + 0.2 * np.clip(1.0 - np.abs(mean_wlen - 5.0) / 5.0, 0, 1))
        batch["punct_ratio"] = np.round(punct_ratio, 6)
        batch["stopword_ratio"] = np.round(stop_ratio, 6)
        batch["mean_word_len"] = np.round(mean_wlen, 6)
        batch["quality"] = np.round(q, 6)
        return batch


class Fingerprinter:
    """Rolling-hash document fingerprint: min of a polynomial rolling hash
    over character ``k``-grams (winnowing-style; stable under content moves,
    sensitive to edits).  Emits ``fingerprint`` (uint64 as int64)."""

    def __init__(self, text_col: str = "text", k: int = 8, base: int = 1_000_003):
        self.text_col = text_col
        self.k = k
        self.base = base
        self.mask = (1 << 61) - 1

    def _fingerprint(self, text: str) -> int:
        k, base, mask = self.k, self.base, self.mask
        if len(text) < k:
            h = 0
            for ch in text:
                h = (h * base + ord(ch)) & mask
            return h
        h = 0
        pow_k = pow(base, k - 1, 1 << 61)
        for ch in text[:k]:
            h = (h * base + ord(ch)) & mask
        best = h
        for i in range(k, len(text)):
            h = ((h - ord(text[i - k]) * pow_k) * base + ord(text[i])) & mask
            if h < best:
                best = h
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = [self._fingerprint(t or "")
                                for t in batch[self.text_col]]
        return batch
