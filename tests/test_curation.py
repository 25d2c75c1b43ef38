"""token_budget_select vs a pandas window-function oracle."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rds(ray_session):
    import ray.data as rd

    return rd


def _oracle(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    out = []
    for g, grp in df.groupby("g"):
        grp = grp.sort_values("oid")
        keep = grp["tok"].cumsum() <= budget
        out.append(grp[keep])
    return pd.concat(out).sort_values(["g", "oid"]).reset_index(drop=True)


class TestTokenBudgetSelect:
    def test_matches_window_function_oracle(self, rds):
        from driftray.ops.curation import token_budget_select

        rng = np.random.default_rng(21)
        n = 3000
        df = pd.DataFrame({
            "g": rng.choice(["en", "de", "fr"], n),
            "oid": np.arange(n),
            "tok": rng.integers(1, 50, n),
        })
        got = (token_budget_select(rds.from_pandas(df), "g", "tok", "oid",
                                   budget=4000, n_buckets=16)
               .to_pandas().sort_values(["g", "oid"]).reset_index(drop=True))
        exp = _oracle(df, 4000)
        assert len(got) == len(exp)
        assert (got["oid"].to_numpy() == exp["oid"].to_numpy()).all()
        # budget respected exactly, maximally
        for g, grp in got.groupby("g"):
            assert grp["tok"].sum() <= 4000
            nxt = df[(df["g"] == g) & (~df["oid"].isin(set(grp["oid"])))]
            if len(nxt):
                first_dropped = nxt.sort_values("oid").iloc[0]
                assert grp["tok"].sum() + first_dropped["tok"] > 4000

    def test_group_entirely_under_budget_kept_whole(self, rds):
        from driftray.ops.curation import token_budget_select

        df = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 5,
                           "oid": np.arange(10),
                           "tok": [1] * 5 + [1000] * 5})
        got = token_budget_select(rds.from_pandas(df), "g", "tok", "oid",
                                  budget=2500, n_buckets=4).to_pandas()
        assert len(got[got["g"] == "a"]) == 5      # fits entirely
        assert len(got[got["g"] == "b"]) == 2      # 2×1000 ≤ 2500 < 3×1000


def test_temperature_weights_properties():
    import numpy as np

    from driftray.ops.curation import temperature_weights

    counts = {"a": 100, "b": 900, "c": 4000}
    for alpha in (0.0, 0.3, 0.5, 1.0):
        w = temperature_weights(counts, alpha)
        # expected output size preserved
        assert abs(sum(w[g] * n for g, n in counts.items())
                   - sum(counts.values())) < 1e-6
        if alpha < 1:
            assert w["a"] > w["b"] > w["c"]     # small groups upsampled
    # alpha=1 is a no-op mix
    w1 = temperature_weights(counts, 1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in w1.values())
    # alpha=0 equalizes group contributions
    w0 = temperature_weights(counts, 0.0)
    contrib = {g: w0[g] * counts[g] for g in counts}
    assert np.ptp(list(contrib.values())) < 1e-6
