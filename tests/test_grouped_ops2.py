"""Unit oracles for the round-3 batch-2 operators: row_number_by_key,
grouped_corr, argmax_by, regex_match_counts (each also oracle-checked
end-to-end by q45-q50 in tools/check_queries.py)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _events(n=2000, keys=37, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, keys, size=n).astype(np.int64),
        "ts": rng.integers(0, 500, size=n).astype(np.int64),
        "v": rng.normal(10, 4, size=n),
        "w": rng.normal(0, 1, size=n),
    })


def test_row_number_by_key_matches_pandas(ray_session):
    from driftray.ops.windowing import row_number_by_key

    df = _events()
    out = (row_number_by_key(rd.from_pandas(df), ["k"], ["ts", "id"],
                             out_col="rn", num_partitions=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = df.sort_values(["k", "ts", "id"], ignore_index=True)
    exp["rn"] = exp.groupby("k").cumcount() + 1
    exp = exp.sort_values("id").reset_index(drop=True)
    np.testing.assert_array_equal(out["rn"].to_numpy(), exp["rn"].to_numpy())


def test_grouped_corr_matches_pandas(ray_session):
    from driftray.ops.grouped import grouped_corr

    df = _events()
    df["v"] = df["v"] + 0.5 * df["w"]          # real correlation
    out = (grouped_corr(rd.from_pandas(df), ["k"], "v", "w", out_col="c")
           .to_pandas().set_index("k")["c"])
    exp = df.groupby("k").apply(lambda g: g["v"].corr(g["w"]),
                                include_groups=False)
    for k in exp.index:
        assert out[k] == pytest.approx(exp[k], rel=1e-9, abs=1e-12)


def test_grouped_corr_degenerate_groups(ray_session):
    from driftray.ops.grouped import grouped_corr

    df = pd.DataFrame({
        "k": ["single", "flatx", "ok", "ok", "ok", "flatx"],
        "x": [1.0, 2.0, 1.0, 2.0, 3.0, 2.0],
        "y": [1.0, 5.0, 2.0, 4.0, 6.0, 9.0],
    })
    out = (grouped_corr(rd.from_pandas(df), ["k"], "x", "y", out_col="c")
           .to_pandas().set_index("k")["c"])
    assert pd.isna(out["single"])      # n < 2
    assert pd.isna(out["flatx"])       # zero variance in x
    assert out["ok"] == pytest.approx(1.0)


def test_argmax_by_matches_pandas(ray_session):
    from driftray.ops.relational import argmax_by

    df = _events()
    # plant ties: duplicate each key's max value on a smaller id
    mx = df.loc[df.groupby("k")["v"].idxmax(), ["k", "v"]]
    tied = mx.copy()
    tied["id"] = -df.groupby("k")["id"].transform("max").loc[mx.index]
    tied["ts"], tied["w"] = 0, 0.0
    df2 = pd.concat([df, tied], ignore_index=True)

    out = (argmax_by(rd.from_pandas(df2), ["k"], "v", "id",
                     max_name="mv", arg_name="arg")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp_rows = []
    for k, g in df2.groupby("k"):
        m = g["v"].max()
        exp_rows.append((k, m, g.loc[g["v"] == m, "id"].min()))
    exp = pd.DataFrame(exp_rows, columns=["k", "mv", "arg"])
    pd.testing.assert_frame_equal(out[["k", "mv", "arg"]], exp,
                                  check_dtype=False)


def test_regex_match_counts_matches_pandas(ray_session):
    from driftray.ops.text import regex_match_counts

    rng = np.random.default_rng(11)
    texts = [f"doc {i} " + ("code 12345" if rng.random() < 0.3 else "prose")
             for i in range(400)]
    langs = [("en", "de", "fr")[i % 3] for i in range(400)]
    df = pd.DataFrame({"lang": langs, "text": texts})
    out = (regex_match_counts(rd.from_pandas(df), "text", "lang",
                              "[0-9]{3,}")
           .to_pandas().set_index("lang"))
    exp = df.assign(m=df["text"].str.contains("[0-9]{3,}", regex=True))
    for lang, g in exp.groupby("lang"):
        assert out.loc[lang, "n_match"] == int(g["m"].sum())
        assert out.loc[lang, "n_rows"] == len(g)


def test_grouped_concat_matches_pandas(ray_session):
    from driftray.ops.grouped import grouped_concat

    df = _events(n=600, keys=19, seed=9)
    df["tag"] = [("a", "b", "c", "d")[i % 4] for i in range(len(df))]
    out = (grouped_concat(rd.from_pandas(df), ["k"], ["ts", "id"],
                          "tag", ">", out_col="j", num_partitions=8)
           .to_pandas().set_index("k")["j"])
    exp = (df.sort_values(["k", "ts", "id"])
           .groupby("k")["tag"].agg(">".join))
    for k in exp.index:
        assert out[k] == exp[k]


def _skewed_frames(seed=13):
    rng = np.random.default_rng(seed)
    n = 3000
    # ~40% of left rows share key 7 (the hot key); rest uniform over 50
    keys = np.where(rng.random(n) < 0.4, 7,
                    rng.integers(0, 50, size=n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "lv": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 45, dtype=np.int64),
                          "rv": np.arange(0, 45, dtype=np.int64) * 10})
    return left, right


@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_skew_join_matches_plain_join(ray_session, how):
    from driftray.ops.relational import hash_shuffle_join, skew_join

    left, right = _skewed_frames()
    out = (skew_join(rd.from_pandas(left), rd.from_pandas(right), ["k"],
                     how=how, num_salts=4, hot_keys=[7], num_partitions=4)
           .to_pandas().sort_values(["lv"]).reset_index(drop=True))
    exp = (hash_shuffle_join(rd.from_pandas(left), rd.from_pandas(right),
                             ["k"], how=how, num_partitions=4)
           .to_pandas().sort_values(["lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out[sorted(out.columns)],
                                  exp[sorted(exp.columns)])


def test_skew_join_autodetect_hot_key(ray_session):
    from driftray.ops.relational import hash_shuffle_join, skew_join

    left, right = _skewed_frames()
    out = (skew_join(rd.from_pandas(left), rd.from_pandas(right), ["k"],
                     num_salts=4, hot_frac=0.05, num_partitions=4)
           .to_pandas().sort_values(["lv"]).reset_index(drop=True))
    exp = (hash_shuffle_join(rd.from_pandas(left), rd.from_pandas(right),
                             ["k"], num_partitions=4)
           .to_pandas().sort_values(["lv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out[sorted(out.columns)],
                                  exp[sorted(exp.columns)])


def test_skew_join_rejects_unsupported(ray_session):
    from driftray.ops.relational import skew_join

    left, right = _skewed_frames()
    with pytest.raises(ValueError, match="inner/left_outer"):
        skew_join(rd.from_pandas(left), rd.from_pandas(right), ["k"],
                  how="full_outer", hot_keys=[7])


@pytest.mark.parametrize("offset", [1, -1, 3])
def test_shift_by_key_matches_pandas(ray_session, offset):
    from driftray.ops.windowing import shift_by_key

    df = _events(n=800, keys=23, seed=21)
    out = (shift_by_key(rd.from_pandas(df), ["k"], ["ts", "id"], "v",
                        offset=offset, out_col="s", num_partitions=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = df.sort_values(["k", "ts", "id"], ignore_index=True)
    exp["s"] = exp.groupby("k")["v"].shift(offset)
    exp = exp.sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(out["s"].to_numpy(dtype=float),
                               exp["s"].to_numpy(dtype=float), rtol=1e-12)


def test_grouped_mode_tie_break(ray_session):
    from driftray.ops.relational import grouped_mode

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3,
        "v": ["y", "x", "x", "y",      # tie 2-2 in a -> min value "x"
              "z", "z", "w"],          # clear winner z in b
    })
    out = (grouped_mode(rd.from_pandas(df), ["k"], "v", out_col="m",
                        count_name="n")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out.loc[0, "m"] == "x" and out.loc[0, "n"] == 2
    assert out.loc[1, "m"] == "z" and out.loc[1, "n"] == 2


def _paragraph_corpus(n_docs=60, seed=33):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    boiler = ["subscribe to our newsletter today",
              "all rights reserved worldwide"]
    docs = []
    for d in range(n_docs):
        paras = [" ".join(rng.choice(vocab, size=5)) + f" u{d}_{i}"
                 for i in range(4)]
        if d % 3 == 0:
            paras.insert(1, boiler[0])       # cross-doc duplicate
        if d % 5 == 0:
            paras.append(boiler[1])
        if d == 7:
            paras.append(paras[0])           # within-doc repeat
        docs.append((d, "\n\n".join(paras)))
    return pd.DataFrame(docs, columns=["doc_id", "text"])


def _segment_dedup_oracle(df, sep="\n\n"):
    seen = {}
    for _, r in df.sort_values("doc_id").iterrows():
        for i, s in enumerate(r["text"].split(sep)):
            key = s.strip()
            seen.setdefault(key, []).append((r["doc_id"], i))
    out = {}
    for _, r in df.iterrows():
        keep = []
        for i, s in enumerate(r["text"].split(sep)):
            occ = seen[s.strip()]
            if len(occ) == 1 or min(occ) == (r["doc_id"], i):
                keep.append(s)
        out[r["doc_id"]] = sep.join(keep)
    return out


def test_dedup_segments_matches_oracle(ray_session):
    from driftray.ops.dedup import dedup_segments

    df = _paragraph_corpus()
    out = (dedup_segments(rd.from_pandas(df), "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = _segment_dedup_oracle(df)
    for _, r in out.iterrows():
        assert r["text"] == exp[r["doc_id"]], r["doc_id"]
        assert r["n_kept"] == len(exp[r["doc_id"]].split("\n\n"))
        assert r["n_kept"] + r["n_dropped"] == \
            len(df.loc[df["doc_id"] == r["doc_id"], "text"].iloc[0]
                .split("\n\n"))


def test_dedup_segments_no_duplicates_passthrough(ray_session):
    from driftray.ops.dedup import dedup_segments

    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                       "text": [f"only {i}\n\nunique {i}"
                                for i in range(5)]})
    out = (dedup_segments(rd.from_pandas(df), "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert (out["n_dropped"] == 0).all()
    assert list(out["text"]) == list(df["text"])


def test_dedup_segments_verify_survives_hash_collision(ray_session):
    from driftray.ops.dedup import dedup_segments

    def _colliding_hash(values):
        # every string hashes to the same 64-bit value — a nested def so
        # cloudpickle ships it BY VALUE to Ray workers
        return np.full(len(np.asarray(values, dtype=object)), 7,
                       dtype=np.int64)

    df = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype=np.int64),
        "text": ["alpha para\n\nshared para",
                 "beta para\n\nshared para"]})
    # verify=True: distinct texts survive even though EVERY primary hash
    # collides; only the true duplicate ("shared para") is dropped once.
    out = (dedup_segments(rd.from_pandas(df), "doc_id", "text",
                          verify=True, _hash_fn=_colliding_hash)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["text"]) == ["alpha para\n\nshared para",
                                 "beta para"]
    assert list(out["n_dropped"]) == [0, 1]
    # verify=False: the collision over-drops everything after the
    # globally-first position (the documented hash-only tradeoff).
    raw = (dedup_segments(rd.from_pandas(df), "doc_id", "text",
                          verify=False, _hash_fn=_colliding_hash)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(raw["text"]) == ["alpha para", ""]


def test_perplexity_scores_matches_formula(ray_session):
    from driftray.ops.text import perplexity_scores

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["the cat sat", "the the the", "dog ran fast today",
                 "zzz qqq"],
    })
    out = (perplexity_scores(rd.from_pandas(df), vocab_size=100, alpha=0.5)
           .to_pandas().set_index("doc_id"))

    toks = [t.split(" ") for t in df["text"]]
    flat = [w for ts in toks for w in ts]
    from collections import Counter
    cnt = Counter(flat)
    total = len(flat)
    denom = total + 0.5 * (len(cnt) + 1)

    import math
    for d, ts in enumerate(toks):
        lp = np.mean([math.log((cnt[w] + 0.5) / denom) for w in ts])
        assert out.loc[d, "logprob_per_token"] == pytest.approx(lp, rel=1e-9)
        assert out.loc[d, "ppl"] == pytest.approx(math.exp(-lp), rel=1e-9)
        assert out.loc[d, "n_tokens"] == len(ts)
    # common-token doc scores better (lower ppl) than the all-rare doc
    assert out.loc[1, "ppl"] < out.loc[3, "ppl"]


def test_perplexity_oov_bucket(ray_session):
    from driftray.ops.text import perplexity_scores

    # vocab cap of 2 forces everything but the two most common tokens OOV
    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a a a b b rare1", "a b", "rare2 rare3"],
    })
    out = (perplexity_scores(rd.from_pandas(df), vocab_size=2, alpha=0.5)
           .to_pandas().set_index("doc_id"))
    assert out.loc[2, "ppl"] > out.loc[1, "ppl"]


def test_chunk_documents_edges(ray_session):
    from driftray.ops.text import chunk_documents

    df = pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b c d e f g h i j",   # 10 toks, 4/2 -> 4 chunks
                 "a b",                   # shorter than one chunk
                 "a b c d e"],            # partial tail chunk
    })
    out = (chunk_documents(rd.from_pandas(df), chunk_tokens=4, overlap=2)
           .to_pandas().sort_values(["doc_id", "chunk_idx"])
           .reset_index(drop=True))
    exp = [
        (0, 0, 4, "a b c d"), (0, 1, 4, "c d e f"),
        (0, 2, 4, "e f g h"), (0, 3, 4, "g h i j"),
        (1, 0, 2, "a b"),
        (2, 0, 4, "a b c d"), (2, 1, 3, "c d e"),
    ]
    assert len(out) == len(exp)
    for row, (d, ci, n, txt) in zip(out.itertuples(index=False), exp):
        assert (row.doc_id, row.chunk_idx, row.n_tokens,
                row.chunk_text) == (d, ci, n, txt)

    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(rd.from_pandas(df), chunk_tokens=4, overlap=4)


@pytest.mark.parametrize("anti", [False, True])
def test_shuffle_semi_join_matches_broadcast(ray_session, anti):
    from driftray.ops.relational import broadcast_join, shuffle_semi_join

    left, right = _skewed_frames(seed=17)
    right = pd.concat([right, right.head(10)], ignore_index=True)  # dup keys
    out = (shuffle_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                             ["k"], anti=anti, num_partitions=4)
           .to_pandas().sort_values("lv").reset_index(drop=True))
    how = "anti" if anti else "semi"
    exp = (broadcast_join(rd.from_pandas(left), right[["k"]], ["k"],
                          how=how)
           .to_pandas().sort_values("lv").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["k", "lv"]], exp[["k", "lv"]])


def test_shuffle_semi_join_right_on(ray_session):
    from driftray.ops.relational import shuffle_semi_join

    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"rk": [2, 3, 3, 9]})
    out = (shuffle_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                             ["k"], right_on=["rk"], num_partitions=2)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(out["k"]) == [2, 3]


def test_bloom_semi_join_exact_matches(ray_session):
    from driftray.ops.relational import bloom_semi_join, shuffle_semi_join

    left, right = _skewed_frames(seed=29)
    out = (bloom_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                           ["k"], num_partitions=4)
           .to_pandas().sort_values("lv").reset_index(drop=True))
    exp = (shuffle_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                             ["k"], num_partitions=4)
           .to_pandas().sort_values("lv").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["k", "lv"]], exp[["k", "lv"]])


def test_bloom_semi_join_prefilter_superset(ray_session):
    from driftray.ops.relational import bloom_semi_join

    left, right = _skewed_frames(seed=31)
    sup = (bloom_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                           ["k"], exact=False)
           .to_pandas())
    true_keys = set(right["k"])
    matched = left[left["k"].isin(true_keys)]
    # no false negatives: every true match survives the probe
    assert set(matched["lv"]) <= set(sup["lv"])


def test_bloom_semi_join_anti_delegates_exact(ray_session):
    from driftray.ops.relational import bloom_semi_join, shuffle_semi_join

    left, right = _skewed_frames(seed=37)
    out = (bloom_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                           ["k"], anti=True, num_partitions=4)
           .to_pandas().sort_values("lv").reset_index(drop=True))
    exp = (shuffle_semi_join(rd.from_pandas(left), rd.from_pandas(right),
                             ["k"], anti=True, num_partitions=4)
           .to_pandas().sort_values("lv").reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["k", "lv"]], exp[["k", "lv"]])


def test_diverse_sample_covers_all_clusters(ray_session):
    from driftray.ops.sampling import diverse_sample

    rng = np.random.default_rng(41)
    # 3 well-separated blobs, heavily imbalanced (400/80/20)
    centers = np.array([[10.0, 0, 0], [0, 10.0, 0], [0, 0, 10.0]])
    sizes = [400, 80, 20]
    vecs, ids = [], []
    for ci, sz in enumerate(sizes):
        vecs.append(centers[ci] + rng.normal(0, 0.2, size=(sz, 3)))
        ids.extend(range(ci * 1000, ci * 1000 + sz))
    df = pd.DataFrame({"vec_id": np.array(ids, dtype=np.int64),
                       "embedding": list(np.concatenate(vecs))})

    out = diverse_sample(rd.from_pandas(df), "vec_id", "embedding",
                         n_per_cluster=5, n_clusters=3, seed=7)
    # exactly 5 per discovered cluster, and every blob represented
    assert (out.groupby("ivf_cluster").size() == 5).all()
    blobs = set(out["vec_id"] // 1000)
    assert blobs == {0, 1, 2}
    # deterministic
    out2 = diverse_sample(rd.from_pandas(df), "vec_id", "embedding",
                          n_per_cluster=5, n_clusters=3, seed=7)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))


def test_rolling_sum_time_matches_bruteforce(ray_session):
    from driftray.ops.windowing import rolling_sum_time_by_key

    rng = np.random.default_rng(53)
    n = 600
    df = pd.DataFrame({
        "k": rng.integers(0, 13, size=n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 3600, size=n), unit="s"),   # planted ties
        "v": rng.integers(-50, 100, size=n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    })
    W = 300  # 5 minutes
    out = (rolling_sum_time_by_key(rd.from_pandas(df), ["k"], "ts", "v",
                                   window_s=W, out_col="s",
                                   num_partitions=8)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # brute force: sum over same-key rows with ts in [t - W, t] — RANGE
    # peer semantics (ties count regardless of row order)
    exp = []
    for _, r in df.sort_values("id").iterrows():
        g = df[df["k"] == r["k"]]
        lo = r["ts"] - pd.Timedelta(seconds=W)
        exp.append(int(g.loc[(g["ts"] >= lo) & (g["ts"] <= r["ts"]),
                             "v"].sum()))
    np.testing.assert_array_equal(out["s"].to_numpy(), np.array(exp))
