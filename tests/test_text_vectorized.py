"""Parity tests for the vectorized text kernels (LangId, QualityScorer,
Fingerprinter) against per-row reference transliterations of the original
scalar loops — random unicode-ish content, ties, CJK, empties, shorts."""
import numpy as np
import pandas as pd
import pytest

from driftray.ops.text import _STOPWORDS, Fingerprinter, LangId, QualityScorer


def _random_texts(seed, n=60):
    rng = np.random.default_rng(seed)
    en = list(_STOPWORDS["en"]) + ["alpha", "bravo", "zulu"]
    de = list(_STOPWORDS["de"]) + ["strasse"]
    pool = en + de + ["c'est", "día", "!!!", "42", "一二三四五", ""]
    texts = []
    for _ in range(n):
        k = int(rng.integers(0, 30))
        texts.append(" ".join(rng.choice(pool, size=k)) if k else "")
    texts += ["", "a", "一" * 10, "the " * 5 + "der " * 5,  # exact vote tie
              None]
    return texts


def _langid_rowwise(text):
    import re
    word = re.compile(r"[^\W\d_]+", re.UNICODE)
    langs = sorted(_STOPWORDS)
    text = text or ""
    cjk = sum(1 for ch in text[:2000] if "一" <= ch <= "鿿")
    words = [w.lower() for w in word.findall(text[:4000])]
    if cjk > max(3, len(words) // 4):
        return "zh", 1.0
    votes = {lg: sum(w in _STOPWORDS[lg] for w in words) for lg in langs}
    best = max(langs, key=lambda lg: (votes[lg], lg))
    total = max(1, len(words))
    return (best if votes[best] > 0 else "unk"), votes[best] / total


@pytest.mark.parametrize("seed", range(4))
def test_langid_matches_rowwise(seed):
    texts = _random_texts(seed)
    df = pd.DataFrame({"text": texts})
    out = LangId()(df.copy())
    for t, p, sc in zip(texts, out["lang_pred"], out["lang_score"]):
        ep, es = _langid_rowwise(t)
        assert p == ep, (t, p, ep)
        assert sc == pytest.approx(round(es, 6), abs=1e-9)


def _quality_rowwise(text):
    import re
    word = re.compile(r"[A-Za-z]+")
    stop = _STOPWORDS["en"]
    text = text or ""
    words = word.findall(text[:8000])
    sr = sum(w.lower() in stop for w in words) / max(1, len(words))
    mw = sum(map(len, words)) / max(1, len(words))
    return sr, mw


@pytest.mark.parametrize("seed", range(4))
def test_quality_matches_rowwise(seed):
    texts = _random_texts(seed)
    df = pd.DataFrame({"text": texts})
    out = QualityScorer()(df.copy())
    for t, sr, mw in zip(texts, out["stopword_ratio"], out["mean_word_len"]):
        esr, emw = _quality_rowwise(t)
        assert sr == pytest.approx(round(esr, 6), abs=1e-9)
        assert mw == pytest.approx(round(emw, 6), abs=1e-9)


@pytest.mark.parametrize("seed", range(4))
def test_fingerprint_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    fp = Fingerprinter()
    texts = _random_texts(seed)
    # add adversarial shapes: exactly k, k-1, k+1 chars; high codepoints
    texts += ["x" * 7, "x" * 8, "x" * 9, "東京タワー42!", "ab￿" * 3]
    # random ascii blobs
    for _ in range(10):
        L = int(rng.integers(0, 64))
        texts.append("".join(chr(int(x)) for x in rng.integers(32, 1000, L)))
    df = pd.DataFrame({"text": texts})
    out = fp(df.copy())
    for t, got in zip(texts, out["fingerprint"]):
        assert int(got) == fp._fingerprint(t or ""), repr(t)


def test_fingerprint_batch_order_independent():
    fp = Fingerprinter()
    texts = ["hello world example", "hello world example", "short"]
    a = fp(pd.DataFrame({"text": texts}))["fingerprint"].tolist()
    b = fp(pd.DataFrame({"text": texts[::-1]}))["fingerprint"].tolist()
    assert a == b[::-1]
    assert a[0] == a[1]
