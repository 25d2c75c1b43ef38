"""Graph operators over edge-list Datasets: PageRank and bipartite
co-occurrence.

`ops/dedup.connected_components` already gives the engine one iterative
graph primitive (pointer doubling, O(log diameter) rounds); these add the
other two every entity-graph workload asks of a data platform: importance
scoring over a directed graph (PageRank — power iteration as chained
Dataset jobs) and "items sharing a context" pair mining (co-occurrence —
the item-item similarity count behind recommenders and entity linkage).

Scale shape:
* ``pagerank`` — the rank vector and the edge list stay DATASETS end to
  end; one iteration = join(edges ⋈ ranks on src, hash) + groupby(dst)
  sum + a union+groupby ZERO-FILL back onto the node set (3 key-hash
  exchanges, each ∝ edges/nodes, never collected; the zero-fill is
  deliberately NOT a left-outer join — a join whose side descends from
  another join loses schema on empty hash partitions, ROUND_NOTES r3).
  The edge list and node/out-degree table build once up front (the
  degree via a union+groupby, no join) and the rank Dataset carries its
  node's out-degree so the dangling mass is one scalar aggregate per
  round.  Iteration count is explicit and small (power iteration
  converges geometrically at factor=damping).
* ``cooccurrence_pairs`` — hash-partition by the shared context; pairs
  are generated per partition with a vectorized merge (explosion bounded
  by ``max_per_context``, the standard cap: a context shared by
  thousands of items contributes O(cap²), not O(deg²)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .grouped import partitioned_group_apply

__all__ = ["pagerank", "cooccurrence_pairs"]


def pagerank(edges: rd.Dataset, src_col: str, dst_col: str,
             damping: float = 0.85, iterations: int = 3,
             rank_col: str = "rank",
             num_partitions: int | None = None) -> rd.Dataset:
    """PageRank over a directed edge list, exact power iteration:
    ``r_{t+1}(n) = (1-d)/N + d·(Σ_{(m,n)∈E} r_t(m)/deg(m) + dang_t/N)``
    where ``dang_t`` is the rank mass sitting on nodes with no out-edges
    (redistributed uniformly — the standard convention).

    Parallel edges are collapsed first (DISTINCT on (src, dst)); the node
    set is src ∪ dst.  Returns one row per node: ``(node, rank)``,
    summing to 1.  ``iterations`` is explicit — each round is 3 key-hash
    exchanges; rank error decays ∝ damping^t.
    """
    from ray.data.aggregate import Max, Sum

    from .relational import adaptive_join_partitions, distinct

    P = adaptive_join_partitions(num_partitions)
    e = distinct(edges.select_columns([src_col, dst_col]),
                 [src_col, dst_col]).materialize()   # reused every round

    # node table WITH out-degree in one exchange (no join): union of
    # (src, 1) and (dst, 0) rows, groupby-sum — deg==0 marks dangling.
    # The node column is NAMED src_col throughout the iteration so the
    # per-round join's right side is the materialized ranks Dataset with
    # ZERO lazy ops on top: even a lazy rename over materialized blocks
    # loses schema on empty hash-shuffle partitions (ROUND_NOTES r3/r4).
    def deg_rows(col: str, one: bool):
        def fn(t: pa.Table) -> pa.Table:
            v = np.ones(t.num_rows, np.int64) if one else \
                np.zeros(t.num_rows, np.int64)
            return pa.table({src_col: t[col], "__deg": pa.array(v)})
        return fn

    node_deg = (e.map_batches(deg_rows(src_col, True),
                              batch_format="pyarrow")
                .union(e.map_batches(deg_rows(dst_col, False),
                                     batch_format="pyarrow"))
                .groupby(src_col)
                .aggregate(Sum("__deg", alias_name="__deg"))
                # repartition launders out the ZERO-COLUMN empty blocks a
                # union+groupby emits for empty hash partitions — they
                # bypass map UDFs entirely and crash any later join whose
                # shuffle partition receives only empties (r4 gotcha)
                .repartition(P).materialize())
    n_nodes = node_deg.count()

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            src_col: t[src_col],
            "__deg": pc.cast(t["__deg"], pa.int64()),
            rank_col: pa.array(np.full(t.num_rows, 1.0 / n_nodes))})

    ranks = node_deg.map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        # dangling mass in ONE scalar aggregate over ranks
        def mass(t: pa.Table) -> pa.Table:
            r = t[rank_col].to_numpy(zero_copy_only=False)
            d = t["__deg"].to_numpy(zero_copy_only=False)
            return pa.table({"__dang": pa.array(np.where(d == 0, r, 0.0))})

        dang = float(ranks.map_batches(mass, batch_format="pyarrow")
                     .sum("__dang") or 0.0)

        # contributions: edges ⋈ ranks on src — both sides are PURELY
        # materialized datasets (see naming note above)
        contrib = e.join(ranks, join_type="inner", on=(src_col,),
                         num_partitions=P)

        def scale(t: pa.Table) -> pa.Table:
            r = t[rank_col].to_numpy(zero_copy_only=False)
            d = t["__deg"].to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.table({src_col: t[dst_col], "__c": pa.array(r / d)})

        sums = (contrib.map_batches(scale, batch_format="pyarrow")
                .groupby(src_col).aggregate(Sum("__c", alias_name="__c")))

        # zero-fill WITHOUT a join (empty-partition-proof): union the
        # node set as (node, deg, c=0) rows with the contribution sums
        # as (node, deg=0, c) rows; groupby(node) re-derives both
        def as_zero(t: pa.Table) -> pa.Table:
            return pa.table({src_col: t[src_col], "__deg": t["__deg"],
                             "__c": pa.array(np.zeros(t.num_rows))})

        def as_contrib(t: pa.Table) -> pa.Table:
            return pa.table({
                src_col: t[src_col],
                "__deg": pa.array(np.zeros(t.num_rows, np.int64)),
                "__c": pc.cast(t["__c"], pa.float64())})

        merged = (ranks.map_batches(as_zero, batch_format="pyarrow")
                  .union(sums.map_batches(as_contrib,
                                          batch_format="pyarrow"))
                  .groupby(src_col)
                  .aggregate(Max("__deg", alias_name="__deg"),
                             Sum("__c", alias_name="__c")))

        base = (1.0 - damping) / n_nodes + damping * dang / n_nodes

        def finish(t: pa.Table) -> pa.Table:
            c = t["__c"].to_numpy(zero_copy_only=False)
            return pa.table({src_col: t[src_col],
                             "__deg": pc.cast(t["__deg"], pa.int64()),
                             rank_col: pa.array(base + damping * c)})

        ranks = (merged.map_batches(finish, batch_format="pyarrow")
                 .repartition(P).materialize())   # see node_deg note

    def out(t: pa.Table) -> pa.Table:
        return pa.table({"node": t[src_col], rank_col: t[rank_col]})

    return ranks.map_batches(out, batch_format="pyarrow")


def cooccurrence_pairs(ds: rd.Dataset, context_col: str, item_col: str,
                       min_count: int = 2, max_per_context: int = 256,
                       num_partitions: int = 64) -> rd.Dataset:
    """Item-item co-occurrence counts: for every unordered item pair
    (a < b) sharing a context (user, session, order, document), how many
    contexts they share.  The workhorse behind co-purchase similarity,
    related-entity mining and blocking for record linkage.

    Distinct (context, item) pairs reduce first (multiplicity inside one
    context must not double-count); contexts hash-partition; per
    partition a single vectorized self-merge emits each context's
    ordered pairs.  ``max_per_context`` caps the quadratic blowup of hot
    contexts (a context at the cap contributes O(cap²) pairs; the cap
    drops the context's TAIL items deterministically by item order —
    log-audit at call sites if coverage matters).  Pairs below
    ``min_count`` are filtered after the final count aggregate.
    """
    from ray.data.aggregate import Sum

    from .relational import distinct

    pairs_in = distinct(ds.select_columns([context_col, item_col]),
                        [context_col, item_col])

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([context_col, item_col], kind="mergesort")
        g = g.groupby(context_col, sort=False).head(max_per_context)
        m = g.merge(g, on=context_col, suffixes=("_a", "_b"))
        m = m[m[f"{item_col}_a"] < m[f"{item_col}_b"]]
        out = (m.groupby([f"{item_col}_a", f"{item_col}_b"], sort=False)
               .size().rename("n_shared").reset_index())
        return out

    counts = partitioned_group_apply(pairs_in, [context_col], gen_pairs,
                                     num_partitions=num_partitions)
    total = (counts.groupby([f"{item_col}_a", f"{item_col}_b"])
             .aggregate(Sum("n_shared", alias_name="n_shared")))

    def keep(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_shared"], pa.int64())
        t = t.set_column(t.schema.get_field_index("n_shared"),
                         "n_shared", n)
        return t.filter(pc.greater_equal(n, min_count))

    return total.map_batches(keep, batch_format="pyarrow")
