"""Round-4 operator batch: bag set ops, rollup, unpivot, cross join,
ranking window family.  Unit-level checks against in-memory references
(the DuckDB oracle sweep at sf0.01 lives in tools/check_queries.py)."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _ds(d: dict) -> rd.Dataset:
    return rd.from_arrow(pa.table(d))


def test_intersect_all_multiplicity(ray_session):
    from driftray.ops.relational import intersect_all

    left = _ds({"k": ["a", "a", "a", "b", "c"], "v": [1, 1, 1, 2, 3]})
    right = _ds({"k": ["a", "a", "b", "b", "d"], "v": [1, 1, 2, 2, 4]})
    out = intersect_all(left, right, ["k", "v"]).to_pandas()
    got = collections.Counter(map(tuple, out.itertuples(index=False)))
    # min(count_l, count_r) per key
    assert got == {("a", 1): 2, ("b", 2): 1}


def test_except_all_multiplicity(ray_session):
    from driftray.ops.relational import except_all

    left = _ds({"k": ["a", "a", "a", "b", "c"]})
    right = _ds({"k": ["a", "b", "b"]})
    out = except_all(left, right, ["k"]).to_pandas()
    got = collections.Counter(out["k"])
    assert got == {"a": 2, "c": 1}


def test_rollup_aggregate_levels(ray_session):
    from driftray.ops.relational import rollup_aggregate

    ds = _ds({"f": ["x", "x", "y"], "s": ["p", "q", "p"],
              "v": [1.0, 2.0, 4.0]})
    out = rollup_aggregate(ds, ["f", "s"], "v", out_col="total").to_pandas()
    got = {(r.f, r.s): r.total for r in out.itertuples(index=False)}
    assert got == {("x", "p"): 1.0, ("x", "q"): 2.0, ("y", "p"): 4.0,
                   ("x", "ALL"): 3.0, ("y", "ALL"): 4.0,
                   ("ALL", "ALL"): 7.0}
    assert len(out) == 6


def test_unpivot_long_form(ray_session):
    from driftray.ops.relational import unpivot

    ds = _ds({"id": [1, 2], "a": [10, 20], "b": [0.5, 1.5]})
    out = unpivot(ds, ["id"], ["a", "b"]).to_pandas()
    got = {(r.id, r.attr): r.val for r in out.itertuples(index=False)}
    assert got == {(1, "a"): 10.0, (2, "a"): 20.0,
                   (1, "b"): 0.5, (2, "b"): 1.5}
    assert out["val"].dtype == np.float64


def test_cross_join_small_pairs(ray_session):
    from driftray.ops.relational import cross_join_small

    ds = _ds({"name": ["u", "v", "w"]})
    small = pa.table({"name": ["p", "q"], "extra": [1, 2]})
    out = cross_join_small(ds, small).to_pandas()
    assert len(out) == 6
    assert set(out.columns) == {"name", "name_r", "extra"}
    assert collections.Counter(zip(out["name"], out["name_r"])) == {
        (l, r): 1 for l in "uvw" for r in "pq"}


def test_rank_window_matches_sql_semantics(ray_session):
    """ntile/percent_rank/cume_dist vs a direct per-group reference,
    including the uneven-tile distribution (first n%k tiles bigger)."""
    from driftray.ops.windowing import rank_window_by_key

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 50, n),  # ties on purpose; id breaks them
    })
    out = (rank_window_by_key(_ds(dict(df)), ["g"], ["v", "id"], n_tiles=4,
                              num_partitions=4)
           .to_pandas().sort_values(["g", "v", "id"]).reset_index(drop=True))

    for g, grp in out.groupby("g"):
        cnt = len(grp)
        assert list(grp["rn"]) == list(range(1, cnt + 1))
        # ntile: first r tiles have q+1 rows
        q, r = divmod(cnt, 4)
        sizes = collections.Counter(grp["tile"])
        expect = {t + 1: (q + 1 if t < r else q) for t in range(4)}
        expect = {t: s for t, s in expect.items() if s > 0}
        assert sizes == expect
        np.testing.assert_allclose(grp["pct_rank"],
                                   (grp["rn"] - 1) / max(cnt - 1, 1))
        np.testing.assert_allclose(grp["cume_dist"], grp["rn"] / cnt)


def test_rank_window_singleton_key(ray_session):
    from driftray.ops.windowing import rank_window_by_key

    out = (rank_window_by_key(_ds({"g": ["solo"], "id": [1], "v": [9]}),
                              ["g"], ["v", "id"], n_tiles=4,
                              num_partitions=2).to_pandas())
    assert out.iloc[0]["rn"] == 1
    assert out.iloc[0]["tile"] == 1
    assert out.iloc[0]["pct_rank"] == 0.0
    assert out.iloc[0]["cume_dist"] == 1.0


def test_full_outer_query_fills_zero(ray_session):
    from driftray.pipelines.queries import q62_click_purchase_outer

    import duckdb

    from driftray.pipelines.queries import ORACLE_SQL

    out = (q62_click_purchase_outer("/root/testdata/sf0.001").to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            "'/root/testdata/sf0.001/events.parquet'")
    sql = (con.sql(ORACLE_SQL["q62_click_purchase_outer"]).df()
           .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[sorted(out.columns)],
                                  sql[sorted(sql.columns)],
                                  check_dtype=False)


def test_rollup_query_grand_total(ray_session):
    from driftray.pipelines.queries import q63_rollup_revenue

    out = q63_rollup_revenue("/root/testdata/sf0.001")
    fine = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
    total = out[(out.l_returnflag == "ALL") & (out.l_linestatus == "ALL")]
    assert len(total) == 1
    assert abs(fine["revenue"].sum() - total["revenue"].iloc[0]) < 0.05


# -- text ops: repetition / tfidf / bm25 --------------------------------------

def test_repetition_stats_counts(ray_session):
    from driftray.ops.text import repetition_stats

    ds = _ds({"doc_id": [1, 2, 3],
              "text": ["a b a b c",          # dup tokens a,b; no dup tri
                       "x y x y x y x y",    # dup trigrams too
                       "u v w"]})
    out = (repetition_stats(ds).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1].tolist() == [5, 4, 3, 0]
    # doc2: 8 tokens all dup; 6 trigrams: "x y x"(x3? -> x y x at 0,2,4)=3,
    # "y x y" at 1,3,5 = 3 -> all 6 are dup instances
    assert out.loc[2].tolist() == [8, 8, 6, 6]
    assert out.loc[3].tolist() == [3, 0, 1, 0]


def test_tfidf_top_terms_reference(ray_session):
    import math

    from driftray.ops.text import tfidf_top_terms

    texts = {1: "apple banana apple", 2: "banana cherry", 3: "apple dog"}
    ds = _ds({"doc_id": list(texts), "text": list(texts.values())})
    out = tfidf_top_terms(ds, k=2, round_to=6).to_pandas()
    # reference
    dfc = {"apple": 2, "banana": 2, "cherry": 1, "dog": 1}
    ref = {}
    for d, txt in texts.items():
        tf = collections.Counter(txt.split())
        scored = sorted(((round(c * math.log(3 / dfc[t]), 6), t)
                         for t, c in tf.items()),
                        key=lambda p: (-p[0], p[1]))[:2]
        ref[d] = [(t, s) for s, t in scored]
    got = {d: list(zip(g["term"], g["score"]))
           for d, g in out.groupby("doc_id")}
    assert got == ref


def _bm25_reference(texts: dict, query: str, k1=1.2, b=0.75):
    import math

    toks = {d: [t for t in s.split(" ") if t] for d, s in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in sorted(set(query.split())):
        dfc = sum(1 for v in toks.values() if term in v)
        idf = math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0)
        for d, v in toks.items():
            f = v.count(term)
            if f:
                s = idf * f * (k1 + 1) / (f + k1 * (1 - b + b * len(v) / avgdl))
                scores[d] = scores.get(d, 0.0) + s
    return sorted(scores.items(), key=lambda p: (-p[1], p[0]))


def test_bm25_matches_reference(ray_session):
    from driftray.ops.text import bm25_topk

    rng = np.random.default_rng(11)
    vocab = ["hash", "join", "merge", "scan", "sort", "index", "tree"]
    texts = {i: " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
             for i in range(60)}
    ds = _ds({"doc_id": list(texts), "text": list(texts.values())})
    out = bm25_topk(ds, "hash join", k=10)
    ref = _bm25_reference(texts, "hash join")[:10]
    assert list(out["doc_id"]) == [d for d, _ in ref]
    np.testing.assert_allclose(out["score"], [s for _, s in ref], rtol=1e-9)


def test_bm25_empty_query_and_no_hits(ray_session):
    from driftray.ops.text import bm25_topk

    ds = _ds({"doc_id": [1, 2], "text": ["a b", "c d"]})
    assert len(bm25_topk(ds, "", k=5)) == 0
    assert len(bm25_topk(ds, "zzz", k=5)) == 0


# -- exact duplicate-span removal ---------------------------------------------

def _span_oracle(texts: dict, window: int):
    """Pure-Python reference: windows of `window` tokens hashed by value;
    any window occurring >= 2 times keeps only its first (doc, pos)
    occurrence; other occurrences' token ranges are masked."""
    toks = {d: [t for t in s.split(" ") if t] for d, s in texts.items()}
    occ = {}
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - window + 1):
            occ.setdefault(tuple(ts[i:i + window]), []).append((d, i))
    masked = {d: set() for d in toks}
    for w, places in occ.items():
        if len(places) >= 2:
            for d, i in places[1:]:
                masked[d].update(range(i, i + window))
    out = {}
    for d, ts in toks.items():
        kept = [t for i, t in enumerate(ts) if i not in masked[d]]
        out[d] = (" ".join(kept), len(ts), len(ts) - len(kept))
    return out


def test_dedup_spans_planted(ray_session):
    from driftray.ops.dedup import dedup_spans

    rng = np.random.default_rng(5)
    # unique-ish background tokens so no accidental duplicate windows
    texts = {d: " ".join(f"w{d}_{i}" for i in range(30)) for d in range(10)}
    span = " ".join(f"dup{i}" for i in range(12))
    for d in (3, 7, 9):  # plant the same 12-token span
        base = texts[d].split(" ")
        at = int(rng.integers(0, 18))
        texts[d] = " ".join(base[:at] + span.split(" ") + base[at:])
    # within-doc repetition: same 8-token run twice in doc 5
    rep = " ".join(f"rep{i}" for i in range(8))
    texts[5] = rep + " " + texts[5] + " " + rep

    ds = _ds({"doc_id": list(texts), "text": list(texts.values())})
    out = (dedup_spans(ds, window=8, num_partitions=4).to_pandas()
           .set_index("doc_id").sort_index())
    ref = _span_oracle(texts, window=8)
    assert len(out) == len(texts)
    for d, (clean, ntok, nrem) in ref.items():
        assert out.loc[d, "clean_text"] == clean, d
        assert out.loc[d, "n_tokens"] == ntok
        assert out.loc[d, "n_removed"] == nrem
    # sanity: the planted span survives exactly once across the corpus
    total_span_hits = sum(out.loc[d, "clean_text"].count("dup0")
                          for d in (3, 7, 9))
    assert total_span_hits == 1


def test_dedup_spans_random_matches_oracle(ray_session):
    from driftray.ops.dedup import dedup_spans

    rng = np.random.default_rng(17)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab -> natural dup windows
    texts = {d: " ".join(rng.choice(vocab, size=int(rng.integers(6, 40))))
             for d in range(40)}
    ds = _ds({"doc_id": list(texts), "text": list(texts.values())})
    out = (dedup_spans(ds, window=4, num_partitions=4).to_pandas()
           .set_index("doc_id").sort_index())
    ref = _span_oracle(texts, window=4)
    for d, (clean, ntok, nrem) in ref.items():
        assert out.loc[d, "clean_text"] == clean, d
        assert out.loc[d, "n_removed"] == nrem


def test_dedup_spans_no_duplicates_passthrough(ray_session):
    from driftray.ops.dedup import dedup_spans

    texts = {1: "a b c d e f g h i", 2: "j k l m n o p q r", 3: ""}
    ds = _ds({"doc_id": list(texts), "text": list(texts.values())})
    out = (dedup_spans(ds, window=8, num_partitions=2).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1, "clean_text"] == texts[1]
    assert out.loc[2, "clean_text"] == texts[2]
    assert out.loc[3, "clean_text"] == ""
    assert (out["n_removed"] == 0).all()


# -- embedding linear algebra: PCA / Lloyd k-means ----------------------------

def _blob_ds(n=600, d=8, k=3, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, size=(k, d))
    X = np.vstack([rng.normal(centers[i], 1.0, size=(n // k, d))
                   for i in range(k)])
    ids = np.arange(len(X), dtype=np.int64)
    return X, rd.from_items(
        [{"vec_id": int(i), "embedding": X[j].tolist()}
         for j, i in enumerate(ids)])


def test_embedding_pca_matches_numpy(ray_session):
    from driftray.ops.embedding import embedding_pca, pca_transform

    X, ds = _blob_ds()
    mean, comps, ev = embedding_pca(ds, n_components=3)
    np.testing.assert_allclose(mean, X.mean(axis=0), rtol=1e-10)
    cov = np.cov(X.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    np.testing.assert_allclose(ev, evals[order], rtol=1e-8)
    for i, col in enumerate(order):
        ref = evecs[:, col]
        got = comps[i]
        if np.dot(ref, got) < 0:
            ref = -ref
        np.testing.assert_allclose(got, ref, atol=1e-8)
    # projection round-trip
    proj = pca_transform(ds, mean, comps).to_pandas()
    P = np.stack(proj.sort_values("vec_id")["pca"].to_numpy())
    ref_p = (X - X.mean(0)) @ comps.T
    np.testing.assert_allclose(P, ref_p, atol=1e-8)


def _lloyd_reference(X, centers, iters, tol=1e-6):
    for _ in range(iters):
        d2 = ((X ** 2).sum(1)[:, None] - 2 * X @ centers.T
              + (centers ** 2).sum(1)[None, :])
        a = d2.argmin(1)
        new = centers.copy()
        for j in range(len(centers)):
            if (a == j).any():
                new[j] = X[a == j].mean(0)
        shift = np.abs(new - centers).max()
        centers = new
        if shift < tol:
            break
    return centers


def test_kmeans_fit_matches_reference_lloyd(ray_session):
    from driftray.ops.embedding import kmeans_assign, kmeans_fit

    X, ds = _blob_ds(n=300, d=4, k=3, seed=9)
    centers, n_it, shifts = kmeans_fit(ds, n_clusters=3, iters=12, seed=1,
                                       init_sample=300)
    # identical init: seeded choice over the same first-300 rows
    rng = np.random.default_rng(1)
    init = X[rng.choice(300, size=3, replace=False)]
    ref = _lloyd_reference(X, init.copy(), iters=12)
    # same init + same algorithm => same centers (order included)
    np.testing.assert_allclose(np.sort(centers, axis=0),
                               np.sort(ref, axis=0), atol=1e-8)
    assigned = kmeans_assign(ds, centers).to_pandas()
    assert assigned["cluster"].nunique() == 3
    # blobs are well separated: inertia per point should be tiny vs spread
    assert shifts[-1] < 1e-3 or n_it == 12
