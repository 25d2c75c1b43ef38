"""Round-4/5 operator batch (kept from the earlier test_round5_ops.py): PII redaction, C4-style line cleaning,
benchmark decontamination, Gopher quality rules, weighted epoch
mixing.  Unit-level checks against in-process references (the DuckDB
oracle sweep at sf0.01 lives in tools/check_queries.py: q74-q78)."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _ds(d: dict) -> rd.Dataset:
    return rd.from_arrow(pa.table(d))


# --- PII redaction ------------------------------------------------------

def test_redact_pii_counts_and_replacement(ray_session):
    from driftray.ops.text import redact_pii

    ds = _ds({"id": [1, 2, 3],
              "text": ["mail a@b.com and c.d@e.org now",
                       "call +1-555-123-4567 from 10.0.0.1",
                       "nothing sensitive here"]})
    out = redact_pii(ds).to_pandas().sort_values("id")
    assert out["n_email"].tolist() == [2, 0, 0]
    assert out["n_phone"].tolist() == [0, 1, 0]
    assert out["n_ipv4"].tolist() == [0, 1, 0]
    assert out["text"].tolist() == [
        "mail <EMAIL> and <EMAIL> now",
        "call <PHONE> from <IPV4>",
        "nothing sensitive here"]


def test_redact_pii_custom_pattern_and_out_col(ray_session):
    from driftray.ops.text import redact_pii

    ds = _ds({"text": ["ssn 123-45-6789 ok"]})
    out = redact_pii(ds, patterns={"ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}"},
                     out_col="red").to_pandas()
    assert out["red"].iloc[0] == "ssn <SSN> ok"
    assert out["text"].iloc[0] == "ssn 123-45-6789 ok"  # original kept
    assert out["n_ssn"].iloc[0] == 1


def test_redact_pii_null_and_empty(ray_session):
    from driftray.ops.text import redact_pii

    ds = _ds({"text": pa.array(["", None, "x@y.io"], type=pa.string())})
    out = redact_pii(ds).to_pandas()
    assert out["n_email"].fillna(-1).tolist() == [0, -1, 1]
    assert out["text"].tolist()[2] == "<EMAIL>"


# --- C4-style line cleaning ---------------------------------------------

def test_line_cleaner_predicates(ray_session):
    from driftray.ops.text import clean_lines

    doc = "\n".join([
        "This line has enough words.",     # kept
        "Too short.",                      # dropped: 2 words
        "no terminal punctuation at all",  # dropped: no punct
        'He said "stop!"',                 # kept: quote after punct
        "one two three?",                  # kept
    ])
    ds = _ds({"doc_id": [1, 2], "text": [doc, "nothing kept here"]})
    out = (clean_lines(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_lines_kept"].tolist() == [3, 0]
    assert out["n_lines_dropped"].tolist() == [2, 1]
    assert out["clean_text"].iloc[0] == "\n".join([
        "This line has enough words.",
        'He said "stop!"',
        "one two three?"])
    assert out["clean_text"].iloc[1] == ""


def test_line_cleaner_null_text_and_min_words(ray_session):
    from driftray.ops.text import clean_lines

    ds = _ds({"doc_id": [1, 2],
              "text": pa.array([None, "a b."], type=pa.string())})
    out = (clean_lines(ds, min_words=2).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_lines_kept"].tolist() == [0, 1]
    assert out["clean_text"].tolist() == ["", "a b."]


# --- Benchmark decontamination ------------------------------------------

def _brute_contamination(train: dict, ev_texts: list, n: int) -> dict:
    """Reference: per train doc, count token windows whose n-gram occurs
    in any eval doc."""
    def grams(text):
        toks = [t for t in text.lower().split(" ") if t]
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]

    ev = set()
    for t in ev_texts:
        ev.update(grams(t))
    return {i: sum(g in ev for g in grams(t)) for i, t in train.items()}


@pytest.mark.parametrize("spill_threshold", [10**9, 0])
def test_decontaminate_matches_bruteforce(ray_session, spill_threshold):
    from driftray.ops.curation import decontaminate

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    train = {i: " ".join(rng.choice(vocab, size=12)) for i in range(40)}
    # plant exact eval n-grams inside two train docs
    ev_texts = [" ".join(rng.choice(vocab, size=10)) for _ in range(3)]
    train[0] = "x0 " + ev_texts[0] + " x1"
    train[1] = ev_texts[1]
    n = 5
    expect = _brute_contamination(train, ev_texts, n)

    tds = _ds({"doc_id": list(train), "text": list(train.values())})
    eds = _ds({"doc_id": list(range(len(ev_texts))), "text": ev_texts})
    out = decontaminate(tds, eds, n=n, spill_threshold=spill_threshold,
                        num_partitions=4).to_pandas()
    got = dict(zip(out["doc_id"], out["n_contaminated"]))
    assert got == expect
    assert expect[0] > 0 and expect[1] > 0  # planted hits detected


def test_decontaminate_short_docs_and_empty_eval(ray_session):
    from driftray.ops.curation import decontaminate

    tds = _ds({"doc_id": [1, 2], "text": ["too short", "a b c"]})
    eds = _ds({"doc_id": [9], "text": ["also short"]})
    out = decontaminate(tds, eds, n=8).to_pandas().sort_values("doc_id")
    assert out["n_contaminated"].tolist() == [0, 0]
    assert len(out) == 2  # every train doc keeps a row


# --- Gopher quality rules -------------------------------------------------

def test_gopher_stats_counters_and_keep(ray_session):
    from driftray.ops.text import gopher_stats

    good = ("the cat and the dog went to the market with a basket "
            "full of fresh fruit and they came home happy")  # 20 words
    short = "the of"                                          # below floor
    symbols = "the of and ### ... ### words with symbols everywhere"
    ds = _ds({"doc_id": [1, 2, 3], "text": [good, short, symbols]})
    out = (gopher_stats(ds, min_words=10).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    g = out.iloc[0]
    assert g["n_words"] == len(good.split())
    assert g["sum_word_len"] == len(good.replace(" ", ""))
    assert g["n_alpha_words"] == g["n_words"]  # all tokens alphabetic
    assert g["n_stopwords"] >= 2 and g["keep"] == 1

    assert out.iloc[1]["keep"] == 0            # word floor
    s = out.iloc[2]
    assert s["n_hash_chars"] == 6 and s["n_ellipsis"] == 1
    assert s["keep"] == 0                      # symbol ratio > 0.1


def test_gopher_stats_empty_and_null(ray_session):
    from driftray.ops.text import gopher_stats

    ds = _ds({"doc_id": [1, 2],
              "text": pa.array([None, ""], type=pa.string())})
    out = gopher_stats(ds, min_words=1).to_pandas().sort_values("doc_id")
    assert out["n_words"].tolist() == [0, 0]
    assert out["keep"].tolist() == [0, 0]


# --- Weighted epoch mixing ------------------------------------------------

def test_repeat_by_weight_integer_weights(ray_session):
    from driftray.ops.curation import repeat_by_weight

    ds = _ds({"k": [1, 2, 3], "g": ["a", "a", "b"], "v": [10, 20, 30]})
    out = (repeat_by_weight(ds, "k", "g", {"a": 2.0, "b": 3.0})
           .to_pandas().sort_values(["k", "epoch"]).reset_index(drop=True))
    got = out.groupby("k")["epoch"].agg(["count", "max"])
    assert got.loc[1].tolist() == [2, 1]
    assert got.loc[2].tolist() == [2, 1]
    assert got.loc[3].tolist() == [3, 2]
    assert (out[out.k == 3]["v"] == 30).all()  # payload replicated


def test_repeat_by_weight_fractional_deterministic(ray_session):
    from driftray.ops.curation import repeat_by_weight

    n = 400
    ds = _ds({"k": list(range(n)), "g": ["a"] * n})
    out1 = repeat_by_weight(ds, "k", "g", {"a": 1.5}).to_pandas()
    out2 = repeat_by_weight(ds, "k", "g", {"a": 1.5}).to_pandas()
    # deterministic: identical copy sets across runs
    c1 = out1.groupby("k").size().sort_index()
    c2 = out2.groupby("k").size().sort_index()
    assert (c1 == c2).all()
    assert set(c1.unique()) == {1, 2}
    # ~half the keys get the extra copy
    assert abs((c1 == 2).mean() - 0.5) < 0.1
    # subsampling: weight < 1 drops rows deterministically
    sub = repeat_by_weight(ds, "k", "g", {"a": 0.25}).to_pandas()
    assert abs(len(sub) / n - 0.25) < 0.1
    assert (sub["epoch"] == 0).all()


def test_repeat_by_weight_default_and_fast_backend(ray_session):
    from driftray.ops.curation import repeat_by_weight

    ds = _ds({"k": [1, 2], "g": ["a", "zz"]})
    out = (repeat_by_weight(ds, "k", "g", {"a": 2.0}, default=1.0,
                            method="fast")
           .to_pandas().groupby("k").size())
    assert out.loc[1] == 2 and out.loc[2] == 1


# --- Distributed prefix sum / sequence packing ------------------------------

def test_prefix_sum_by_group_matches_pandas(ray_session):
    from driftray.ops.curation import prefix_sum_by_group

    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], size=n),
        "ord": rng.permutation(n),
        "v": rng.integers(1, 50, size=n)})
    expect = df.sort_values(["g", "ord"]).assign(
        cum_before=lambda d: d.groupby("g")["v"].cumsum() - d["v"])

    out = (prefix_sum_by_group(_ds(df.to_dict("list")), "g", "v", "ord",
                               n_buckets=8, num_partitions=4)
           .to_pandas().sort_values(["g", "ord"]).reset_index(drop=True))
    exp = expect.reset_index(drop=True)
    assert (out["cum_before"].to_numpy()
            == exp["cum_before"].to_numpy()).all()


def test_pack_sequences_boundaries(ray_session):
    from driftray.ops.curation import pack_sequences

    # one group, tokens 30+40+30: docs start at 0, 30, 70 -> doc 2
    # straddles the 64-token boundary, doc 3 lands in seq 1 offset 6
    ds = _ds({"g": ["x"] * 3, "i": [1, 2, 3], "tok": [30, 40, 30]})
    out = (pack_sequences(ds, "g", "tok", "i", seq_len=64, n_buckets=4,
                          num_partitions=2)
           .to_pandas().sort_values("i").reset_index(drop=True))
    assert out["seq_id"].tolist() == [0, 0, 1]
    assert out["seq_offset"].tolist() == [0, 30, 6]


def test_prefix_sum_empty_input(ray_session):
    from driftray.ops.curation import prefix_sum_by_group

    ds = _ds({"g": pa.array([], type=pa.string()),
              "ord": pa.array([], type=pa.int64()),
              "v": pa.array([], type=pa.int64())})
    out = prefix_sum_by_group(ds, "g", "v", "ord")
    # (Ray's to_pandas drops columns on 0-row datasets; the Dataset
    # schema is the contract downstream stages consume)
    assert out.count() == 0 and "cum_before" in out.schema().names
