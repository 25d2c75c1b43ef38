"""News-pipeline conformance: the Ray pipeline vs a pure-Python replay of
the reference scan semantics (news.py:476-602) under the engine's pinned
first-wins dedup rule (SURVEY.md D2/D3, §5.2#4)."""

import numpy as np
import pandas as pd
import pytest

from driftray.fixtures import headlines
from driftray.state import SeenKeysStore


def scan_oracle(df: pd.DataFrame, seen: set, *, location=None, first_scan=False,
                per_source=20):
    """Reference-shaped replay, pinned semantics: per-source limit by
    arrival, first-wins dedup on title|url then title|source, location
    substring filter, seen-key filter, sort desc by published_date ('' for
    null).  Returns (rows, updated seen)."""
    df = df.sort_values("seq", kind="stable")
    df = df.groupby("source", group_keys=False).head(per_source)
    df = df.drop_duplicates(["title", "url"], keep="first")
    df = df.drop_duplicates(["title", "source"], keep="first")
    if location:
        loc = location.lower()
        mask = (df["title"].fillna("").str.lower().str.contains(loc, regex=False)
                | df["description"].fillna("").str.lower().str.contains(loc, regex=False))
        df = df[mask]
    if not first_scan:
        key = df["title"].astype(str) + "|" + df["url"].astype(str)
        df = df[~key.isin(seen)]
    seen = seen | set(df["title"].astype(str) + "|" + df["url"].astype(str))
    out = df.copy()
    out["published_date"] = out["published_date"].fillna("")
    return out.sort_values("published_date", ascending=False, kind="stable"), seen


@pytest.fixture(scope="module")
def fixture_df(ray_session):
    return headlines(n_scans=4, per_scan=60).to_pandas()


def run_both(fixture_df, tmp_path, location=None):
    import ray.data as rd

    from driftray.pipelines.news import run_monitor

    ds = rd.from_pandas(fixture_df)
    scans = sorted(fixture_df["scan_id"].unique())
    results = run_monitor(ds, scans=scans, state_path=str(tmp_path / "seen.parquet"),
                          location=location)
    seen: set = set()
    oracle_results = []
    for i, s in enumerate(scans):
        out, seen = scan_oracle(fixture_df[fixture_df.scan_id == s], seen,
                                location=location, first_scan=(i == 0))
        oracle_results.append(out)
    return results, oracle_results


class TestNewsConformance:
    def test_scan_outputs_match_oracle(self, fixture_df, tmp_path):
        results, oracle = run_both(fixture_df, tmp_path)
        for got_t, want in zip(results, oracle):
            got = got_t.to_pandas()
            assert len(got) == len(want), (len(got), len(want))
            # set equality on the dedup key (sort ties can reorder rows)
            gk = set(got["title"] + "|" + got["url"])
            wk = set(want["title"].astype(str) + "|" + want["url"].astype(str))
            assert gk == wk
            # newest-first ordering on the filled date column
            dates = got["published_date"].tolist()
            assert dates == sorted(dates, reverse=True)

    def test_no_key_ever_repeats_across_scans(self, fixture_df, tmp_path):
        results, _ = run_both(fixture_df, tmp_path)
        seen: set = set()
        for t in results:
            got = t.to_pandas()
            keys = set(got["title"] + "|" + got["url"])
            assert not (keys & seen)
            seen |= keys

    def test_location_filter(self, fixture_df, tmp_path):
        results, oracle = run_both(fixture_df, tmp_path, location="springfield")
        for got_t, want in zip(results, oracle):
            assert got_t.num_rows == len(want)
            got = got_t.to_pandas()
            ok = (got["title"].str.lower().str.contains("springfield")
                  | got["description"].fillna("").str.lower().str.contains("springfield"))
            assert ok.all()

    def test_state_survives_restart(self, fixture_df, tmp_path):
        """W5 fix: a NEW store loaded from disk still filters scan-1 repeats
        (the reference loses its seen-set on restart, news.py:365)."""
        import ray.data as rd

        from driftray.pipelines.news import news_scan

        ds0 = rd.from_pandas(fixture_df[fixture_df.scan_id == 0])
        store = SeenKeysStore()
        out0, store = news_scan(ds0, store, first_scan=True)
        store.save(str(tmp_path / "state.parquet"))

        store2 = SeenKeysStore.load(str(tmp_path / "state.parquet"))
        assert len(store2) == len(store) > 0
        out0b, _ = news_scan(rd.from_pandas(fixture_df[fixture_df.scan_id == 0]),
                             store2, first_scan=False)
        assert out0b.num_rows == 0  # everything already seen


class TestSeenKeysStore:
    def test_roundtrip_and_probe(self, tmp_path):
        from driftray.sketches import hash64

        keys = hash64(np.array([f"k{i}" for i in range(5000)], dtype=object))
        st = SeenKeysStore()
        st.add(keys[:3000])
        st.save(str(tmp_path / "s.parquet"))
        st2 = SeenKeysStore.load(str(tmp_path / "s.parquet"))
        got = st2.contains(keys)
        assert got[:3000].all() and not got[3000:].any()
