"""Distributed statistics operators: per-group OLS regression and
categorical mutual information.

The reference's profiling surface stops at per-column moments
(`/root/reference/DESIGN.md:331-392` quality reports); these extend it to
RELATIONSHIPS between columns — the next question a data-validation run
asks ("is price still linear in quantity per flag?", "how much does
`lang` actually tell you about `source`?"), and standard
feature-diagnostics for training-data curation.

Both are sufficient-statistics reductions — the 100 TB shape:

* ``grouped_ols`` — per batch, each group folds to six scalars
  (n, Σx, Σy, Σxx, Σxy, Σyy) via ONE pandas C-kernel groupby; a
  group-cardinality ``groupby().sum`` merges partials; slope/intercept/r²
  close over the six sums.  Nothing row-scale ever shuffles.
* ``mutual_information`` — joint (a, b) counts via per-batch partial
  combine + one vocabulary-sized exchange; marginals fold FROM the joint
  (never rescanning rows); the Σ p·log2 term reduces with a final scalar
  aggregate.  I(A;B) = Σ_ab p(ab)·log2(p(ab)/(p(a)p(b))).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

__all__ = ["grouped_ols", "mutual_information", "fd_violations",
           "grouped_mad_outliers"]


def fd_violations(ds: rd.Dataset, lhs_cols: list[str], rhs_cols: list[str],
                  num_partitions: int | None = None) -> pd.DataFrame:
    """Functional-dependency check: does ``lhs -> rhs`` hold?

    Returns one row: ``n_lhs`` (distinct LHS keys) and ``n_violating``
    (LHS keys mapping to more than one distinct RHS value) — the schema
    normalization / dirty-join-key screen (Deequ's ``hasUniqueness``
    composite cousin).

    Scale shape: one distinct over (lhs, rhs) — shuffle ∝ distinct pairs,
    not rows — then a key-cardinality groupby-count; both exchanges reuse
    the same hash partitioning.  The result is two scalars.
    """
    from ray.data.aggregate import Count

    from .relational import distinct

    pairs = distinct(ds.select_columns(list(lhs_cols) + list(rhs_cols)),
                     list(lhs_cols) + list(rhs_cols))
    per_key = pairs.groupby(list(lhs_cols)).aggregate(
        Count(alias_name="n_rhs"))

    def verdict(t: pa.Table) -> pa.Table:
        viol = pc.sum(pc.cast(pc.greater(t["n_rhs"], 1), pa.int64())).as_py() or 0
        return pa.table({"n_lhs": pa.array([t.num_rows], pa.int64()),
                         "n_violating": pa.array([viol], pa.int64())})

    # one tiny row per block reaches the driver — two scalars after the sum
    parts = per_key.map_batches(verdict, batch_format="pyarrow").to_pandas()
    return pd.DataFrame([parts.sum().astype("int64")])


def grouped_mad_outliers(ds: rd.Dataset, group_col: str, value_col: str,
                         k: float = 3.0,
                         num_partitions: int = 64) -> rd.Dataset:
    """Per-group robust outlier screen via the median/MAD rule.

    For each group: ``m = median(v)``, ``mad = median(|v - m|)``; a row is
    an outlier iff ``|v - m| > k * mad``.  Unlike the z-score family
    (``ops/anomaly.rolling_zscore``), the MAD rule's breakdown point is
    50% — a contaminated tail cannot drag the threshold toward itself,
    which is the property a dirty-data screen actually needs
    (the reference's quality reports stop at mean/std,
    `/root/reference/DESIGN.md:539-551`).

    Returns one row per group: ``(group, n, n_outliers, median, mad)``.
    Null values are excluded (SQL convention).

    Scale shape: hash-partition by group, ONE vectorized pandas pass per
    partition (two ``groupby().transform("median")`` C kernels + a
    boolean reduction) — per-group overhead is O(#partitions).
    Partitioning assumption: one partition's rows fit in a worker heap;
    for giant single groups use the t-digest quantile path
    (``grouped.grouped_quantile_digest``) and accept its tolerance.

    Exactness note: for integer inputs every median is an exact half
    (average of two int64 middles), ``k * mad`` with small-integer ``k``
    is exactly representable, and the strict ``>`` verdict is therefore
    bit-deterministic — the q187 oracle hash-checks the verdict counts
    against DuckDB's window-free median CTE formulation.
    """
    from .grouped import partitioned_group_apply

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[value_col])
        if len(df) == 0:
            return pd.DataFrame({group_col: df[group_col],
                                 "n": pd.Series([], dtype="int64"),
                                 "n_outliers": pd.Series([], dtype="int64"),
                                 "median": pd.Series([], dtype="float64"),
                                 "mad": pd.Series([], dtype="float64")})
        v = df[value_col].astype(np.float64)
        g = df[group_col]
        med = v.groupby(g, sort=False, observed=True).transform("median")
        dev = (v - med).abs()
        mad = dev.groupby(g, sort=False, observed=True).transform("median")
        out = (dev > k * mad)
        agg = (pd.DataFrame({group_col: g, "__out": out.astype(np.int64),
                             "__med": med, "__mad": mad})
               .groupby(group_col, sort=False, observed=True)
               .agg(n=("__out", "size"), n_outliers=("__out", "sum"),
                    median=("__med", "first"), mad=("__mad", "first"))
               .reset_index())
        agg["n"] = agg["n"].astype(np.int64)
        return agg

    return partitioned_group_apply(
        ds.select_columns([group_col, value_col]), [group_col],
        per_partition, num_partitions=num_partitions)


def grouped_ols(ds: rd.Dataset, group_col: str, x_col: str, y_col: str,
                slope_col: str = "slope", icept_col: str = "intercept",
                r2_col: str = "r2") -> rd.Dataset:
    """Per-group simple linear regression y = a·x + b (least squares),
    with r² — numerically matching SQL ``regr_slope / regr_intercept /
    regr_r2`` (rows where either x or y is null are excluded, the SQL
    convention).

    Returns (group, n, slope, intercept, r2); groups with zero x-variance
    get null slope/intercept/r2 (SQL behavior).
    """
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=[x_col, y_col])
        x = b[x_col].astype(np.float64)
        y = b[y_col].astype(np.float64)
        stats = pd.DataFrame({
            group_col: b[group_col], "n": np.int64(1), "sx": x, "sy": y,
            "sxx": x * x, "sxy": x * y, "syy": y * y,
        })
        # arrow-out: pandas blocks into Ray's sort-based groupby are
        # ~14x slower than arrow blocks (ROUND_NOTES r4)
        return pa.Table.from_pandas(
            stats.groupby(group_col, sort=False, observed=True).sum()
            .reset_index(), preserve_index=False)

    sums = (ds.select_columns([group_col, x_col, y_col])
            .map_batches(partial, batch_format="pandas")
            .groupby(group_col)
            .aggregate(*[Sum(c, alias_name=c)
                         for c in ("n", "sx", "sy", "sxx", "sxy", "syy")]))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sxx = t["sxx"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        syy = t["syy"].to_numpy(zero_copy_only=False)
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        cov = n * sxy - sx * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(varx > 0, cov / varx, np.nan)
            icept = np.where(varx > 0, (sy - slope * sx) / n, np.nan)
            r2 = np.where((varx > 0) & (vary > 0),
                          (cov * cov) / (varx * vary), np.nan)
        return pa.table({group_col: t[group_col],
                         "n": pc.cast(t["n"], pa.int64()),
                         slope_col: pa.array(slope),
                         icept_col: pa.array(icept),
                         r2_col: pa.array(r2)})

    return sums.map_batches(finish, batch_format="pyarrow")


def mutual_information(ds: rd.Dataset, a_col: str, b_col: str,
                       out_col: str = "mi_bits") -> pd.DataFrame:
    """Mutual information I(A;B) in bits between two categorical columns.

    Joint counts reduce via per-batch partial combine + one
    joint-vocabulary-sized exchange; the marginals fold from the joint
    counts (two tiny groupbys over |A|·|B| rows — rows are never
    re-scanned); the final Σ n_ab·log2(N·n_ab/(n_a·n_b)) closes with a
    scalar aggregate.  Returns one row: (n, mi_bits).  Null category
    values count as their own category (SQL oracle mirrors with
    COALESCE).
    """
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = (b.groupby([a_col, b_col], sort=False, observed=True,
                         dropna=False)
               .size().rename("cnt").reset_index())
        # arrow-out: see grouped_ols note
        return pa.Table.from_pandas(out, preserve_index=False)

    joint = (ds.select_columns([a_col, b_col])
             .map_batches(partial, batch_format="pandas")
             .groupby([a_col, b_col]).aggregate(Sum("cnt", alias_name="cnt"))
             .materialize())  # |A|·|B| rows — feeds three consumers

    ma = joint.groupby(a_col).aggregate(Sum("cnt", alias_name="na"))
    mb = joint.groupby(b_col).aggregate(Sum("cnt", alias_name="nb"))
    na = {r[a_col]: r["na"] for r in ma.take_all()}
    nb = {r[b_col]: r["nb"] for r in mb.take_all()}
    total = float(sum(na.values()))

    import ray
    na_ref, nb_ref = ray.put(na), ray.put(nb)

    def contrib(t: pa.Table) -> pa.Table:
        da, db = ray.get(na_ref), ray.get(nb_ref)
        nab = t["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        va = np.array([da[v] for v in t[a_col].to_pylist()], np.float64)
        vb = np.array([db[v] for v in t[b_col].to_pylist()], np.float64)
        term = nab * np.log2(total * nab / (va * vb))
        return pa.table({"term": pa.array(term)})

    s = joint.map_batches(contrib, batch_format="pyarrow").sum("term")
    return pd.DataFrame({"n": [int(total)],
                         out_col: [float(s) / total if total else 0.0]})
