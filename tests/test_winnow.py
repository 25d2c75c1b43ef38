"""Winnowing duplicate-span detection (ops/winnow.py) tests."""
import numpy as np
import pandas as pd
import ray.data as rd

from driftray.ops.winnow import (WinnowFingerprinter, _gram_hashes,
                                 duplicate_span_stats,
                                 filter_cross_duplicates, winnow)
from driftray.sketches import hash64

K, W, T = 8, 8, 15          # t = k + w - 1


def toks(rng, n):
    return [f"w{v:03d}" for v in rng.integers(0, 800, n)]


def th(words):
    return hash64(np.array(words, dtype=object))


def test_gram_hash_position_independent():
    rng = np.random.default_rng(1)
    span = toks(rng, 30)
    a = th(toks(rng, 17) + span + toks(rng, 9))
    b = th(span + toks(rng, 40))
    ga, gb = set(_gram_hashes(a, K).tolist()), set(_gram_hashes(b, K).tolist())
    # every k-gram inside the shared span hashes identically in both
    assert len(ga & gb) >= 30 - K + 1


def test_winnowing_guarantee():
    # shared span of exactly t tokens at random offsets -> >=1 shared fp
    for seed in range(12):
        rng = np.random.default_rng(seed)
        span = toks(rng, T)
        a = toks(rng, int(rng.integers(0, 60))) + span + toks(rng, 25)
        b = toks(rng, int(rng.integers(0, 60))) + span + toks(rng, 25)
        fa = set(winnow(th(a), K, W).tolist())
        fb = set(winnow(th(b), K, W).tolist())
        assert fa & fb, f"seed {seed}: t-token span missed"


def test_distinct_docs_share_nothing():
    for seed in range(8):
        rng = np.random.default_rng(100 + seed)
        fa = set(winnow(th(toks(rng, 120)), K, W).tolist())
        fb = set(winnow(th(toks(rng, 120)), K, W).tolist())
        assert not (fa & fb)


def test_winnow_short_docs():
    assert len(winnow(th(["a", "b"]), K, W)) == 2   # shorter than k
    assert len(winnow(th([]), K, W)) == 0
    g = winnow(th(toks(np.random.default_rng(3), K + 2)), K, W)
    assert len(g) == 1                               # <= w grams -> 1 min


def _planted(n_shared=10, n_fresh=20, span_len=60, seed=5):
    rng = np.random.default_rng(seed)
    span = " ".join(toks(rng, span_len))
    texts = []
    for i in range(n_shared):
        pre = " ".join(toks(rng, int(rng.integers(5, 50))))
        post = " ".join(toks(rng, int(rng.integers(5, 50))))
        texts.append(f"{pre} {span} {post}")
    texts += [" ".join(toks(rng, 120)) for _ in range(n_fresh)]
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})


def test_duplicate_span_stats_planted(ray_session):
    df = _planted()
    out = (duplicate_span_stats(rd.from_pandas(df), k=K, w=W)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert len(out) == 30
    assert (out.loc[:9, "has_cross_dup"] == 1).all()
    assert (out.loc[10:, "has_cross_dup"] == 0).all()
    assert (out.loc[:9, "shared_frac"] > 0).all()
    assert (out["n_fps"] > 0).all()


def test_empty_doc_row_survives(ray_session):
    df = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                       "text": ["", "one two three four five six seven "
                                    "eight nine ten"]})
    out = (duplicate_span_stats(rd.from_pandas(df), k=K, w=W)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert len(out) == 2
    assert out.loc[0, "n_fps"] == 0 and out.loc[0, "has_cross_dup"] == 0


def test_filter_cross_duplicates(ray_session):
    df = _planted(n_shared=6, n_fresh=10, span_len=100)
    kept = (filter_cross_duplicates(rd.from_pandas(df),
                                    max_shared_frac=0.3, k=K, w=W)
            .to_pandas())
    kept_ids = set(kept["doc_id"])
    # heavy-overlap docs (long shared span dominates) drop; fresh stay
    assert set(range(6, 16)) <= kept_ids
    assert not (set(range(6)) & kept_ids)


def test_fingerprinter_batch_matches_scalar():
    df = _planted(2, 2)
    rows = WinnowFingerprinter(k=K, w=W)(df)
    for did, grp in rows.groupby("doc_id"):
        words = df.loc[df.doc_id == did, "text"].iloc[0].split()
        expect = winnow(th(words), K, W).view(np.int64)
        assert set(grp["bh"]) == set(expect.tolist())
        assert (grp["n_fps"] == len(expect)).all()


def test_flat_kernel_parity_random_and_empty_docs():
    """The flat batch kernel must equal the per-doc reference on a mixed
    batch: random lengths 0..40 (spanning empty, < k, == window-edge and
    full-window docs).  Regression for the explode-offset bug: pandas
    explode emits one NaN ROW per empty token list, which shifted every
    later doc's flat slice by one."""
    import pandas as pd
    from driftray.sketches import hash64

    rng = np.random.default_rng(3)
    texts = [" ".join(f"t{v}" for v in rng.integers(0, 300, int(n)))
             for n in rng.integers(0, 40, 300)]
    texts[10] = ""                       # explicit empties mid-batch
    texts[11] = "   "
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    rows = WinnowFingerprinter()(df)
    for i, t in enumerate(texts):
        toks = t.split()
        ref = (winnow(hash64(np.array(toks, dtype=object)))
               if toks else np.array([], dtype=np.uint64))
        got = np.sort(rows[rows.doc_id == i]["bh"]
                      .to_numpy().view(np.uint64))
        assert np.array_equal(np.sort(ref), got), f"doc {i}"
