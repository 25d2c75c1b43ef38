"""Round-5 operator batch: PII redaction, C4-style line cleaning,
benchmark decontamination.  Unit-level checks against in-process
references (the DuckDB oracle sweep at sf0.01 lives in
tools/check_queries.py: q74/q75/q76)."""

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
