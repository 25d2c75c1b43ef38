"""Driver-contract guard: a fast subset of queries() checked against
oracle_sql() via DuckDB at sf0.001 (the full sweep lives in
tools/check_queries.py at sf0.01)."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
FAST = ["q01_pricing_summary", "q03_topk_orders", "q07_customers_with_orders",
        "q09_windowed_events", "q13_sha256_documents", "q15_ann_topk",
        "q17_lang_profiles", "q21_per_source_latest",
        "q140_documents_expectations", "q141_cusum_daily",
        "q142_bpe_pair_counts", "q143_median_digest_band",
        "q144_tree_split", "q145_daily_psi_js", "q146_value_drift_ks",
        "q147_mg_exact_regime", "q148_bm25_scores", "q149_dsir_weights",
        "q150_bigram_lm"]


@pytest.fixture(scope="module")
def harness(ray_session):
    import duckdb

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return entrymod, con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(harness, name):
    import pyarrow as pa

    import ray.data as rd

    entrymod, con = harness
    res = entrymod.queries()[name](SF)
    if isinstance(res, rd.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    sql = con.sql(entrymod.oracle_sql()[name]).df()
    assert sorted(res.columns) == sorted(sql.columns)
    assert len(res) == len(sql)
    pd.testing.assert_frame_equal(canon(res), canon(sql), check_dtype=False,
                                  rtol=1e-9, atol=1e-9)


def test_entry_returns_verdicts(harness):
    entrymod, _ = harness
    out = entrymod.entry()
    assert len(out) >= 2
    assert {"table", "n_rows", "n_violations", "passed"} <= set(out.columns)


def test_every_query_has_callable(harness):
    entrymod, _ = harness
    qs = entrymod.queries()
    assert len(qs) >= 35
    for name, fn in qs.items():
        assert callable(fn), name
    for name in entrymod.oracle_sql():
        assert name in qs
