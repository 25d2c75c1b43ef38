"""Ops-layer units: relational vs pandas oracles, dedup recall on planted
near-dups, ANN vs exhaustive numpy, text kernels, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rds(ray_session):
    import ray.data as rd

    return rd


# ---------------------------------------------------------------------------
# relational
# ---------------------------------------------------------------------------


class TestRelational:
    def test_broadcast_join_inner(self, rds):
        from driftray.ops.relational import broadcast_join

        fact = pd.DataFrame({"k": [1, 2, 3, 2], "v": [10.0, 20.0, 30.0, 40.0]})
        dim = pd.DataFrame({"k": [1, 2], "name": ["a", "b"]})
        out = broadcast_join(rds.from_pandas(fact), dim, on=["k"],
                             how="inner").to_pandas()
        exp = fact.merge(dim, on="k")
        assert sorted(out["v"]) == sorted(exp["v"])
        assert set(out.columns) == {"k", "v", "name"}

    def test_broadcast_semi_anti(self, rds):
        from driftray.ops.relational import broadcast_join

        fact = pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
        dim = pd.DataFrame({"k": [2]})
        semi = broadcast_join(rds.from_pandas(fact), dim, ["k"], "semi").to_pandas()
        anti = broadcast_join(rds.from_pandas(fact), dim, ["k"], "anti").to_pandas()
        assert list(semi["k"]) == [2]
        assert sorted(anti["k"]) == [1, 3]

    def test_dedup_exact_first_wins(self, rds):
        from driftray.ops.relational import dedup_exact

        df = pd.DataFrame({"key": ["a", "b", "a", "b", "c"],
                           "ord": [3, 1, 1, 2, 5],
                           "payload": ["x3", "y1", "x1", "y2", "z5"]})
        out = dedup_exact(rds.from_pandas(df), ["key"], "ord").to_pandas()
        got = dict(zip(out["key"], out["payload"]))
        assert got == {"a": "x1", "b": "y1", "c": "z5"}  # min ord wins

    def test_top_k_matches_sort(self, rds):
        from driftray.ops.relational import top_k

        rng = np.random.default_rng(3)
        df = pd.DataFrame({"id": np.arange(5000), "x": rng.normal(0, 1, 5000)})
        out = top_k(rds.from_pandas(df).repartition(8), "x", 7).to_pandas()
        exp = df.nlargest(7, "x")
        assert list(out["id"]) == list(exp["id"])

    def test_tumbling_window(self, rds):
        from driftray.ops.relational import tumbling_window_column

        ts = pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:04:59",
                             "2024-01-01 00:05:00"])
        df = pd.DataFrame({"ts": ts})
        out = tumbling_window_column(rds.from_pandas(df), "ts", 300).to_pandas()
        w = out["window_start"].dt.strftime("%H:%M").tolist()
        assert w == ["00:00", "00:00", "00:05"]

    def test_distinct(self, rds):
        from driftray.ops.relational import distinct

        df = pd.DataFrame({"a": ["x", "x", "y"], "b": [1, 1, 2]})
        out = distinct(rds.from_pandas(df), ["a", "b"]).to_pandas()
        assert len(out) == 2


# ---------------------------------------------------------------------------
# dedup — planted near-duplicates must cluster; distinct docs must not
# ---------------------------------------------------------------------------


def _near_dup_corpus():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(40):
        docs.append(" ".join(rng.choice(vocab, size=120)))
    # plant near-dups: docs 40/41 are copies of 0 with one word changed;
    # 42 is a copy of 1 shuffled lightly (still high overlap)
    d0 = docs[0].split()
    d0[5] = "CHANGED"
    docs.append(" ".join(d0))
    docs.append(docs[0])
    d1 = docs[1].split()
    d1[10], d1[11] = d1[11], d1[10]
    docs.append(" ".join(d1))
    return pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})


class TestDedup:
    def test_minhash_lsh_recall_and_precision(self, rds):
        from driftray.ops.dedup import minhash_lsh_dedup

        df = _near_dup_corpus()
        out = minhash_lsh_dedup(rds.from_pandas(df), jaccard_threshold=0.7).to_pandas()
        c = dict(zip(out["doc_id"], out["cluster_id"]))
        assert c[40] == c[0] == c[41] == 0
        assert c[42] == c[1]
        # distinct random docs stay singletons
        singles = out[(out["doc_id"] >= 2) & (out["doc_id"] < 40)]
        assert not singles["is_duplicate"].any()

    def test_simhash_exact_copy(self, rds):
        from driftray.ops.dedup import simhash_dedup

        df = _near_dup_corpus()
        out = simhash_dedup(rds.from_pandas(df)).to_pandas()
        c = dict(zip(out["doc_id"], out["cluster_id"]))
        assert c[41] == c[0]  # identical text → identical simhash

    def test_ngram_jaccard_exact_verification(self, rds):
        from driftray.ops.dedup import ngram_jaccard_dedup

        df = _near_dup_corpus()
        out = ngram_jaccard_dedup(rds.from_pandas(df), threshold=0.9).to_pandas()
        c = dict(zip(out["doc_id"], out["cluster_id"]))
        assert c[41] == c[0]
        assert not out[(out["doc_id"] >= 2) & (out["doc_id"] < 40)]["is_duplicate"].any()

    def test_connected_components_matches_union_find(self, rds):
        """The distributed min-label-propagation fallback must agree with
        the driver union-find on a random graph."""
        from driftray.ops.dedup import (_union_find_clusters,
                                        connected_components)

        rng = np.random.default_rng(17)
        edges = pd.DataFrame({"src": rng.integers(0, 60, 80),
                              "dst": rng.integers(0, 60, 80)})
        edges = edges[edges["src"] != edges["dst"]]
        got = dict(zip(*[connected_components(rds.from_pandas(edges))
                         .to_pandas()[c] for c in ("node", "label")]))
        clusters, _ = _union_find_clusters(
            set(zip(edges["src"], edges["dst"])))
        for node, root in clusters.items():
            assert got[node] == root

    def test_embedding_cosine(self, rds):
        from driftray.ops.dedup import embedding_cosine_dedup

        rng = np.random.default_rng(9)
        V = rng.normal(0, 1, (50, 16))
        V[40] = V[0] + rng.normal(0, 0.01, 16)   # near-dup pair
        df = pd.DataFrame({"vec_id": np.arange(50),
                           "embedding": [v.astype(np.float32) for v in V]})
        out = embedding_cosine_dedup(rds.from_pandas(df), threshold=0.98).to_pandas()
        c = dict(zip(out["vec_id"], out["cluster_id"]))
        assert c[40] == c[0]
        assert out["is_duplicate"].sum() == 1


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------


class TestANN:
    def test_brute_force_matches_numpy(self, rds):
        from driftray.ops.ann import brute_force_topk

        rng = np.random.default_rng(13)
        V = rng.normal(0, 1, (800, 32))
        df = pd.DataFrame({"vec_id": np.arange(800),
                           "embedding": [v.astype(np.float32) for v in V]})
        q = V[17]
        out = brute_force_topk(rds.from_pandas(df).repartition(4), q, k=5).to_pandas()
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        Vf = np.stack([v.astype(np.float32).astype(np.float64) for v in V])
        Vfn = Vf / np.linalg.norm(Vf, axis=1, keepdims=True)
        qf = Vf[17] / np.linalg.norm(Vf[17])
        exp = np.argsort(-(Vfn @ qf))[:5]
        assert list(out["vec_id"]) == list(exp)

    def test_ivf_recalls_exact_neighbor(self, rds):
        from driftray.ops.ann import ivf_topk

        rng = np.random.default_rng(14)
        V = rng.normal(0, 1, (500, 16))
        V[321] = V[55] * 1.01   # same direction → cosine ~1
        df = pd.DataFrame({"vec_id": np.arange(500),
                           "embedding": [v.astype(np.float32) for v in V]})
        out = ivf_topk(rds.from_pandas(df), V[55], k=3, n_clusters=8,
                       nprobe=2).to_pandas()
        assert {55, 321} <= set(out["vec_id"])

    def test_persisted_ivf_index_partition_pruned(self, rds, tmp_path):
        """write_ivf_index writes one hive dir per cluster; ivf_query_index
        lists only the probed dirs and still recalls the planted pair."""
        import glob

        from driftray.ops.ann import ivf_query_index, write_ivf_index

        rng = np.random.default_rng(15)
        V = rng.normal(0, 1, (600, 16))
        V[400] = V[20] * 1.02
        df = pd.DataFrame({"vec_id": np.arange(600),
                           "embedding": [v.astype(np.float32) for v in V]})
        idx = str(tmp_path / "ivf")
        write_ivf_index(rds.from_pandas(df), idx, n_clusters=8)
        dirs = glob.glob(f"{idx}/ivf_cluster=*")
        assert 1 < len(dirs) <= 8
        out = ivf_query_index(idx, V[20], k=3, nprobe=3).to_pandas()
        assert {20, 400} <= set(out["vec_id"])


# ---------------------------------------------------------------------------
# text
# ---------------------------------------------------------------------------


class TestText:
    def test_token_counts(self, rds):
        from driftray.ops.text import TokenCounter

        df = pd.DataFrame({"text": ["one two  three", "", "a-b c!", None]})
        out = TokenCounter()(df.copy())
        assert list(out["n_tokens_ws"]) == [3, 0, 2, 0]
        assert list(out["n_tokens_bpe"]) == [3, 0, 5, 0]  # a,-,b,c,!

    def test_langid(self, rds):
        from driftray.ops.text import LangId

        df = pd.DataFrame({"text": [
            "the cat and the dog sat on a mat with it",
            "der Hund und die Katze ist nicht ein Tier mit",
            "el gato y la casa es un animal que en la mesa",
            "这是一个中文句子 里面有很多汉字 用来测试语言识别",
        ]})
        out = LangId()(df.copy())
        assert list(out["lang_pred"]) == ["en", "de", "es", "zh"]

    def test_quality_monotone(self, rds):
        from driftray.ops.text import QualityScorer

        good = "the quick brown fox jumps over the lazy dog and runs for it " * 3
        bad = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( ))))"
        out = QualityScorer()(pd.DataFrame({"text": [good, bad]}))
        assert out["quality"].iloc[0] > out["quality"].iloc[1]

    def test_fingerprint_stability(self, rds):
        from driftray.ops.text import Fingerprinter

        f = Fingerprinter()
        t = "some document content that is reasonably long for hashing"
        df = pd.DataFrame({"text": [t, t, t + " tail changed"]})
        out = f(df.copy())
        assert out["fingerprint"].iloc[0] == out["fingerprint"].iloc[1]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


class TestMultimodal:
    def test_decode_images_schema_and_determinism(self, rds):
        from driftray.ops.multimodal import decode_images, synth_media_table

        media = rds.from_arrow(synth_media_table(20))
        a = decode_images(media).to_pandas()
        b = decode_images(rds.from_arrow(synth_media_table(20))).to_pandas()
        assert len(a) == 20
        assert set(a.columns) == {"media_id", "kind", "format", "mean_rgb", "thumbnail"}
        pd.testing.assert_series_equal(
            a.sort_values("media_id")["mean_rgb"].map(tuple).reset_index(drop=True),
            b.sort_values("media_id")["mean_rgb"].map(tuple).reset_index(drop=True),
            check_names=False)

    def test_real_decoder_raises_not_implemented(self, rds):
        from driftray.ops.multimodal import ImageDecoder

        with pytest.raises(NotImplementedError):
            ImageDecoder(decoder="pillow")

    def test_frame_sampler_rows(self, rds):
        from driftray.ops.multimodal import sample_frames, synth_media_table

        media = rds.from_arrow(synth_media_table(5, kind="video"))
        out = sample_frames(media, n_frames=3).to_pandas()
        assert len(out) == 15
        assert set(out["frame_idx"]) == {0, 1, 2}


class TestIVFRecall:
    def test_recall_at_10_vs_brute_force(self, rds):
        """IVF is approximate; assert recall@10 >= 0.8 against the exact
        baseline over a realistic corpus (the documented quality bar)."""
        from driftray.ops.ann import brute_force_topk, ivf_topk

        rng = np.random.default_rng(77)
        # clustered corpus (IVF's favorable + realistic regime)
        centers = rng.normal(0, 1, (8, 32))
        V = np.vstack([c + rng.normal(0, 0.3, (250, 32)) for c in centers])
        df = pd.DataFrame({"vec_id": np.arange(len(V)),
                           "embedding": [v.astype(np.float32) for v in V]})
        queries = V[rng.choice(len(V), 5, replace=False)]
        exact = brute_force_topk(rds.from_pandas(df), queries, k=10).to_pandas()
        approx = ivf_topk(rds.from_pandas(df), queries, k=10, n_clusters=8,
                          nprobe=3).to_pandas()
        recalls = []
        for qi in range(5):
            e = set(exact[exact.query_id == qi]["vec_id"])
            a = set(approx[approx.query_id == qi]["vec_id"])
            recalls.append(len(e & a) / 10)
        assert np.mean(recalls) >= 0.8, recalls
