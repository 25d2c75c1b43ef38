"""Corpus self-overlap + semantic dedup batch: per-document duplicate
n-gram fraction (Lee et al. 2022 §4), pairwise between-slice n-gram
Jaccard, and SemDeDup (Abbas et al. 2023).  Unit checks against
in-process brute-force references (the DuckDB oracle sweep lives in
tools/check_queries.py: q151/q152, nq_semdedup)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


def _grams(text: str, n: int) -> list[str]:
    toks = [t for t in text.lower().split(" ") if t]
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def _brute_dup_stats(texts: dict[int, str], n: int,
                     min_docs: int) -> pd.DataFrame:
    per_doc = {d: _grams(t, n) for d, t in texts.items()}
    docs_of = {}
    for d, gs in per_doc.items():
        for g in set(gs):
            docs_of.setdefault(g, set()).add(d)
    rows = []
    for d, gs in per_doc.items():
        if not gs:
            continue
        dup = sum(1 for g in gs if len(docs_of[g]) >= min_docs)
        rows.append((d, len(gs), dup, dup / len(gs)))
    return (pd.DataFrame(rows, columns=["doc_id", "n_windows",
                                        "n_dup_windows", "dup_fraction"])
            .sort_values("doc_id", ignore_index=True))


BOILER = "subscribe to our newsletter for more updates and offers"


def _overlap_fixture() -> dict[int, str]:
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    texts = {}
    for i in range(12):
        body = " ".join(rng.choice(vocab, size=14))
        # half the docs carry the shared boilerplate tail
        texts[i] = body + (" " + BOILER if i % 2 == 0 else "")
    texts[12] = "tiny doc"          # < n tokens: no windows, no row
    texts[13] = ""                  # empty
    texts[14] = "  double  spaced   tokens here now  "
    return texts


@pytest.mark.parametrize("min_docs", [2, 3])
def test_dup_ngram_stats_matches_brute(ray_session, min_docs):
    from driftray.ops.curation import dup_ngram_stats

    texts = _overlap_fixture()
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}))
    got = (dup_ngram_stats(ds, n=3, min_docs=min_docs, num_partitions=8)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    want = _brute_dup_stats(texts, 3, min_docs)
    pd.testing.assert_frame_equal(
        got.astype({"n_windows": "int64", "n_dup_windows": "int64"}),
        want, check_dtype=False)
    # boilerplate docs must rank strictly dirtier than clean ones
    if min_docs == 2:
        g = got.set_index("doc_id")["dup_fraction"]
        assert g.loc[0] > g.loc[1]


def test_dup_ngram_stats_batch_boundaries(ray_session):
    """Windows must never straddle documents even when docs share a
    block, and per-window multiplicity is kept (a doc repeating its own
    dup gram counts it each time)."""
    from driftray.ops.curation import dup_ngram_stats

    texts = {0: "a b c a b c a b c",   # self-repeating
             1: "a b c x y z",
             2: "z z z z"}
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())})).repartition(2)
    got = (dup_ngram_stats(ds, n=3, min_docs=2, num_partitions=4)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    want = _brute_dup_stats(texts, 3, 2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # doc 0: "a b c" occurs in docs {0,1} → dup; windows of doc 0 that
    # equal "a b c" appear 3× and each counts
    assert got.set_index("doc_id").loc[0, "n_dup_windows"] >= 3


def _brute_overlap(df: pd.DataFrame, n: int) -> pd.DataFrame:
    sets: dict[str, set] = {}
    for _, r in df.iterrows():
        sets.setdefault(str(r["source"]), set()).update(
            _grams(r["text"], n))
    sets = {g: s for g, s in sets.items() if s}
    groups = sorted(sets)
    rows = []
    for i, a in enumerate(groups):
        for b in groups[i + 1:]:
            inter = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            rows.append((a, b, inter, na, nb, inter / (na + nb - inter)))
    return pd.DataFrame(rows, columns=["group_a", "group_b", "n_common",
                                       "n_a", "n_b", "jaccard"])


def test_source_ngram_overlap_matches_brute(ray_session):
    from driftray.ops.curation import source_ngram_overlap

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for i in range(30):
        src = ["web", "books", "code"][i % 3]
        body = " ".join(rng.choice(vocab, size=12))
        # web and books share boilerplate; code shares nothing extra
        if src in ("web", "books") and i % 2 == 0:
            body += " " + BOILER
        rows.append((src, body))
    # a source with zero windows must not appear in any pair
    rows.append(("empty_src", "x"))
    df = pd.DataFrame(rows, columns=["source", "text"])
    got = (source_ngram_overlap(rd.from_pandas(df).repartition(3),
                                n=3, num_partitions=8)
           .sort_values(["group_a", "group_b"], ignore_index=True))
    want = _brute_overlap(df, 3).sort_values(
        ["group_a", "group_b"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert "empty_src" not in set(got["group_a"]) | set(got["group_b"])
    g = got.set_index(["group_a", "group_b"])["jaccard"]
    assert g.loc[("books", "web")] > g.loc[("books", "code")]


# --- SemDeDup ----------------------------------------------------------

def _semdedup_replica(ids, X, clusters, threshold):
    """Per-cluster keep-first over cosine similarity, lowest id wins."""
    keep = {}
    for c in np.unique(clusters):
        m = clusters == c
        cids = ids[m]
        order = np.argsort(cids, kind="stable")
        cids = cids[order]
        Xc = X[m][order].astype(np.float64)
        nrm = np.linalg.norm(Xc, axis=1)
        nrm[nrm == 0] = 1.0
        Xn = Xc / nrm[:, None]
        sim = Xn @ Xn.T
        k = np.ones(len(cids), dtype=bool)
        for i in range(1, len(cids)):
            if (sim[i, :i][k[:i]] >= threshold).any():
                k[i] = False
        for vid, kk in zip(cids, k):
            keep[int(vid)] = bool(kk)
    return keep


def _emb_fixture(n_groups=6, per_group=8, d=16, seed=3):
    """Tight groups of near-identical vectors, well separated."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, d)) * 10
    rows = []
    vid = 0
    for g in range(n_groups):
        for _ in range(per_group):
            v = base[g] + rng.normal(size=d) * 1e-3
            rows.append((vid, v.astype(np.float64), g))
            vid += 1
    return rows


def test_semdedup_matches_replica(ray_session):
    from driftray.ops.dedup import semdedup
    from driftray.ops.embedding import kmeans_assign, kmeans_fit

    rows = _emb_fixture()
    df = pd.DataFrame({"vec_id": [r[0] for r in rows],
                       "embedding": [r[1] for r in rows]})
    ds = rd.from_pandas(df)
    got = (semdedup(ds, n_clusters=6, threshold=0.95, iters=8,
                    num_partitions=4)
           .to_pandas().sort_values("vec_id", ignore_index=True))
    assert len(got) == len(df)

    # replicate with the SAME deterministic centers/assignment
    centers, _, _ = kmeans_fit(ds, 6, iters=8, seed=42)
    assigned = kmeans_assign(ds, centers).to_pandas()
    assigned = assigned.sort_values("vec_id", ignore_index=True)
    keep = _semdedup_replica(
        assigned["vec_id"].to_numpy(),
        np.stack(assigned["embedding"].to_numpy()),
        assigned["cluster"].to_numpy(), 0.95)
    want = pd.Series([keep[v] for v in got["vec_id"]], dtype="int64")
    assert (got["keep"].to_numpy() == want.to_numpy()).all()
    # near-identical groups collapse: one survivor per (tight group ×
    # cluster) cell — k-means may split/merge the planted groups, but
    # within any cluster a tight group keeps exactly its min id
    gids = np.array([r[2] for r in rows])
    merged = got.sort_values("vec_id").assign(g=gids)
    per_cell = merged.groupby(["g", "cluster"])["keep"].sum()
    assert (per_cell == 1).all()
    assert int(got["keep"].sum()) < len(df)


def test_semdedup_threshold_one_keeps_distinct(ray_session):
    """threshold > max attainable similarity keeps everything that is
    not an exact duplicate direction."""
    from driftray.ops.dedup import semdedup

    rng = np.random.default_rng(9)
    X = rng.normal(size=(40, 8))
    df = pd.DataFrame({"vec_id": np.arange(40),
                       "embedding": list(X)})
    got = semdedup(rd.from_pandas(df), n_clusters=4, threshold=1.0 + 1e-9,
                   num_partitions=4).to_pandas()
    assert int(got["keep"].sum()) == 40


# --- semantic decontamination -------------------------------------------

def test_semantic_decontaminate_matches_brute(ray_session):
    from driftray.ops.curation import semantic_decontaminate

    rng = np.random.default_rng(21)
    E = rng.normal(size=(10, 12))
    # train: 30 random rows + 5 near-copies of eval rows (planted leaks)
    T = rng.normal(size=(30, 12))
    leaks = E[:5] + rng.normal(size=(5, 12)) * 1e-3
    X = np.vstack([T, leaks])
    tr = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(35), "embedding": list(X)}))
    ev = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(10), "embedding": list(E)}))
    got = (semantic_decontaminate(tr, ev, threshold=0.95)
           .to_pandas().sort_values("vec_id", ignore_index=True))

    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ms = np.round((Xn @ En.T).max(axis=1), 4)
    assert np.allclose(got["max_sim"].to_numpy(), ms)
    assert (got["contaminated"].to_numpy() ==
            (ms >= 0.95).astype(np.int64)).all()
    # all 5 planted leaks flagged, and only them (random 12-d vectors
    # essentially never reach cosine 0.95)
    assert got["contaminated"].sum() == 5
    assert (got[got["vec_id"] >= 30]["contaminated"] == 1).all()


def test_semantic_decontaminate_empty_eval(ray_session):
    from driftray.ops.curation import semantic_decontaminate

    rng = np.random.default_rng(2)
    tr = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(8),
         "embedding": list(rng.normal(size=(8, 4)))}))
    ev = rd.from_pandas(pd.DataFrame(
        {"vec_id": np.array([], dtype=np.int64),
         "embedding": pd.Series([], dtype=object)}))
    got = semantic_decontaminate(tr, ev).to_pandas()
    assert (got["max_sim"] == -1.0).all()
    assert got["contaminated"].sum() == 0


# --- incremental (cross-scan) MinHash dedup ------------------------------

def _inc_texts():
    rng = np.random.default_rng(17)
    vocab = [f"tok{i}" for i in range(50)]
    mk = lambda: " ".join(rng.choice(vocab, size=40))
    scan1 = {0: mk(), 1: mk(), 2: mk()}
    # scan2: a near-copy of scan1 doc 1, an internal near-dup pair, a fresh doc
    base = mk()
    scan2 = {10: scan1[1] + " extra", 11: base, 12: base + " tail", 13: mk()}
    return scan1, scan2


def test_incremental_minhash_across_scans(ray_session, tmp_path):
    from driftray.ops.dedup import incremental_minhash_dedup

    state = str(tmp_path / "lsh_state")
    scan1, scan2 = _inc_texts()

    def run(texts):
        ds = rd.from_pandas(pd.DataFrame(
            {"doc_id": list(texts), "text": list(texts.values())}))
        return (incremental_minhash_dedup(ds, state, num_partitions=8)
                .to_pandas().sort_values("doc_id", ignore_index=True)
                .set_index("doc_id"))

    r1 = run(scan1)
    assert r1["dup_of_state"].sum() == 0       # empty state: nothing flagged
    assert r1["dup_in_scan"].sum() == 0        # all distinct random docs

    r2 = run(scan2)
    assert r2.loc[10, "dup_of_state"] == 1     # near-copy of scan1 doc 1
    assert r2.loc[12, "dup_in_scan"] == 1      # near-dup of lower-id 11
    assert r2.loc[11, "dup_in_scan"] == 0      # first-wins keeps the min id
    assert r2.loc[13, "is_dup"] == 0           # fresh doc clean
    assert (r2["is_dup"] == (r2["dup_of_state"] | r2["dup_in_scan"])).all()

    # state accumulated one part per scan and only bucket keys
    import glob
    parts = sorted(glob.glob(state + "/buckets_*.parquet"))
    assert len(parts) == 2
    import pyarrow.parquet as pq
    assert pq.read_schema(parts[0]).names == ["bh"]

    # a third scan re-submitting scan1 doc 0 verbatim must flag it
    r3 = run({20: scan1[0]})
    assert r3.loc[20, "dup_of_state"] == 1
