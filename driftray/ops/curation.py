"""Curation operators for training-data pipelines beyond dedup/quality.

``token_budget_select`` — per-group token-budget selection ("data
mixing"): keep each group's rows, in a deterministic order, until the
group's running token sum exceeds its budget.  The pretraining-mix
primitive: cap each language/source at N tokens.

Distributed shape (no global sort, nothing corpus-scale on the driver):
  1. one tiny aggregate finds the order-column range → fixed-width order
     BUCKETS (the prefix-sum granularity);
  2. ``groupby(group, bucket).sum(tokens)`` — output is groups×buckets
     rows (small, collected);
  3. the driver prefix-sums each group's bucket series and finds the
     CUTOFF bucket (first bucket whose cumulative sum crosses the
     budget) + the remaining budget entering it;
  4. rows of cutoff buckets only (∝ 1/n_buckets of the input) are
     fetched and resolved exactly (within-bucket cumsum per group);
  5. one streaming filter keeps rows below the cutoff bucket, plus the
     exact winners inside it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from .pool import actor_pool


def token_budget_select(ds: rd.Dataset, group_col: str, token_col: str,
                        order_col: str, budget: int,
                        n_buckets: int = 256) -> rd.Dataset:
    """Keep each group's first rows by ``order_col`` whose running
    ``token_col`` sum stays ≤ ``budget`` (SQL:
    ``SUM(tok) OVER (PARTITION BY group ORDER BY ord) <= budget``).

    ``order_col`` must be numeric and unique per row (a doc id).  The
    partitioning assumption is only that ONE bucket's rows per group fit
    on the driver for the exact boundary resolution — raise
    ``n_buckets`` if a single bucket could be large."""
    from ray.data.aggregate import Max, Min, Sum

    # the planning passes (range, bucket sums, cutoff fetch) touch only
    # these three columns — materialize the pruned projection ONCE so a
    # lazy upstream (e.g. a tokenizer stage) is not re-executed per pass
    meta = ds.select_columns(
        list(dict.fromkeys([group_col, order_col, token_col]))).materialize()

    rng = meta.select_columns([order_col]).aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi"))
    if rng is None or rng.get("lo") is None:
        return ds  # empty input → nothing to budget
    lo, hi = int(rng["lo"]), int(rng["hi"])
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(pc.subtract(
            pc.cast(t[order_col], pa.int64()), lo), width)), pa.int64())
        return pa.table({group_col: t[group_col], "__b": b,
                         token_col: t[token_col]})

    per_bucket = (meta.map_batches(add_bucket, batch_format="pyarrow")
                  .groupby([group_col, "__b"])
                  .aggregate(Sum(token_col, alias_name="tok")).to_pandas())

    cutoff: dict = {}    # group -> (cutoff bucket, remaining budget before it)
    full_below: dict = {}  # group -> first bucket NOT fully kept
    for g, grp in per_bucket.groupby(group_col):
        grp = grp.sort_values("__b")
        cum = grp["tok"].cumsum()
        over = cum > budget
        if not over.any():
            full_below[g] = int(grp["__b"].max()) + 1  # keep everything
            continue
        i = int(np.argmax(over.to_numpy()))
        cb = int(grp["__b"].iloc[i])
        before = int(cum.iloc[i - 1]) if i > 0 else 0
        full_below[g] = cb
        cutoff[g] = (cb, budget - before)

    cut_ref = ray.put({g: cb for g, (cb, _) in cutoff.items()})
    below_ref = ray.put(full_below)

    # exact boundary: fetch cutoff-bucket rows only, cumsum per group.
    # Plain task-pool functions, NOT actor pools: the only per-worker
    # state is a ray.get of a broadcast ref (plasma-cached), so an actor
    # pool would pay ~1 s of startup per planning pass for nothing.
    boundary: dict = {}  # group -> max order value kept inside cutoff bucket
    if cutoff:
        def fetch_cutoff(t: pa.Table) -> pa.Table:
            cut = ray.get(cut_ref)
            ordv = np.asarray(pc.cast(t[order_col], pa.int64()).to_numpy(
                zero_copy_only=False))
            b = pd.Series((ordv - lo) // width)
            gs = t[group_col].to_pandas().reset_index(drop=True)
            want = (b == gs.map(cut)).fillna(False)
            return t.filter(pa.array(want.to_numpy(dtype=bool)))

        cand = (meta.map_batches(fetch_cutoff,
                                 batch_format="pyarrow").to_pandas())
        for g, grp in cand.groupby(group_col):
            grp = grp.sort_values(order_col)
            keep = grp[token_col].cumsum() <= cutoff[g][1]
            if keep.any():
                boundary[g] = int(grp.loc[keep, order_col].max())

    bnd_ref = ray.put(boundary)

    def keep_within_budget(t: pa.Table) -> pa.Table:
        below_m, cut_m, bnd_m = ray.get([below_ref, cut_ref, bnd_ref])
        ordv = np.asarray(pc.cast(t[order_col], pa.int64()).to_numpy(
            zero_copy_only=False))
        b = pd.Series((ordv - lo) // width)
        gs = t[group_col].to_pandas().reset_index(drop=True)
        below = gs.map(below_m)
        cutb = gs.map(cut_m)
        bnd = gs.map(bnd_m)
        keep = ((b < below).fillna(False)
                | ((b == cutb) & (pd.Series(ordv) <= bnd)).fillna(False))
        return t.filter(pa.array(keep.to_numpy(dtype=bool)))

    # if the caller's dataset carries nothing beyond the three planning
    # columns, filter the MATERIALIZED projection instead of re-executing
    # the (possibly expensive, e.g. tokenizer) upstream a second time
    src = meta if set(ds.schema().names) <= {group_col, order_col,
                                             token_col} else ds
    return src.map_batches(keep_within_budget, batch_format="pyarrow")


# --- Benchmark decontamination -----------------------------------------

def _ngram_hash_frame(batch: pd.DataFrame, id_col: str, text_col: str,
                      n: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_ids, int64 n-gram hashes) for every length-``n`` token
    window in the batch.  Tokenization = split on single spaces with
    empties dropped (mirrors DuckDB ``list_filter(string_split(text,' '),
    x -> x <> '')`` so an SQL oracle reproduces it exactly).  Hashing is
    pandas' vectorized 64-bit siphash over the joined n-gram strings —
    deterministic across processes (fixed default key), re-viewed as
    int64 (the repo's shuffle-key convention: uint64 degrades to
    pickled-object blocks through Ray groupby/sort)."""
    empty = (np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    if len(batch) == 0:
        return empty
    toks_per_doc = (batch[text_col].fillna("").str.lower()
                    .str.split(" "))
    flat = toks_per_doc.explode()
    flat = flat[flat.notna() & (flat != "")]
    if len(flat) < n:
        return empty
    ids = batch[id_col].to_numpy()[
        batch.index.get_indexer(flat.index)].astype(np.int64)
    toks = flat.to_numpy(dtype=object)
    m = len(toks) - n + 1
    joined = toks[:m].copy()
    for j in range(1, n):
        joined = joined + " "
        joined = joined + toks[j:m + j]
    valid = ids[:m] == ids[n - 1:]
    if not valid.any():
        return empty
    h = pd.util.hash_array(joined[valid].astype(object)).view(np.int64)
    return ids[:m][valid], h


class _NgramHasher:
    """map_batches stage: explode a text column into per-batch-distinct
    (id, ngh) n-gram hash rows."""

    def __init__(self, id_col: str, text_col: str, n: int,
                 keep_id: bool = True):
        self.id_col, self.text_col, self.n = id_col, text_col, n
        self.keep_id = keep_id

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not self.keep_id:
            # No real id column: synthesize a positional one so n-grams
            # never straddle document boundaries.
            batch = batch.assign(**{self.id_col: np.arange(len(batch))})
        ids, h = _ngram_hash_frame(batch, self.id_col, self.text_col,
                                   self.n)
        if not self.keep_id:
            return pd.DataFrame({"ngh": np.unique(h)})
        return pd.DataFrame({self.id_col: ids, "ngh": h})


def decontaminate(ds: rd.Dataset, eval_ds: rd.Dataset,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 8, spill_threshold: int = 2_000_000,
                  num_partitions: int = 32) -> rd.Dataset:
    """Flag training documents that share any token ``n``-gram with an
    evaluation/benchmark set (test-set decontamination, the standard
    pre-training hygiene pass — GPT-3 §C / PaLM §7 style).

    Returns ``(id_col, n_contaminated)`` — one row per input document,
    ``n_contaminated`` = number of token windows whose n-gram occurs
    anywhere in ``eval_ds`` (0 for clean docs).

    Scale shape, two tiers:
      * **broadcast** (eval sets are small by nature): distinct eval
        n-gram hashes are collected once, sorted, ``ray.put`` — each doc
        batch probes via ``np.isin`` (binary search), no shuffle at all.
      * **spill** (distinct eval hashes > ``spill_threshold``): doc
        n-gram hashes become a Dataset and contamination is a
        large-large ``shuffle_semi_join`` on the 8-byte hash followed by
        ONE groupby-sum over (matched rows as 1) ∪ (id spine as 0) —
        nothing corpus-scale ever reaches the driver.

    64-bit hashing means a ~2e-13 false-positive chance per candidate
    pair at 1 M distinct eval n-grams — negligible for a keep/drop gate.
    """
    proj = ds.select_columns([id_col, text_col])
    eval_hashes = eval_ds.select_columns([text_col]).map_batches(
        _NgramHasher("__no_id", text_col, n, keep_id=False),
        batch_format="pandas")
    from .relational import distinct
    eval_hashes = distinct(eval_hashes, ["ngh"]).materialize()
    n_eval = eval_hashes.count()

    if n_eval <= spill_threshold:
        arr = np.sort(np.concatenate(
            [b["ngh"].to_numpy(zero_copy_only=False)
             for b in eval_hashes.iter_batches(batch_format="pyarrow")]
            or [np.array([], dtype=np.int64)]))
        ref = ray.put(arr)

        class Flagger:
            def __init__(self, ref, id_col, text_col, n):
                self.arr = ray.get(ref)
                self.id_col, self.text_col, self.n = id_col, text_col, n

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                ids, h = _ngram_hash_frame(batch, self.id_col,
                                           self.text_col, self.n)
                hits = np.zeros(len(batch), dtype=np.int64)
                if len(h):
                    m = np.isin(h, self.arr, assume_unique=False)
                    if m.any():
                        s = pd.Series(1, index=ids[m]).groupby(level=0).sum()
                        pos = pd.Index(batch[self.id_col]).get_indexer(s.index)
                        hits[pos] = s.to_numpy()
                return pd.DataFrame({self.id_col: batch[self.id_col],
                                     "n_contaminated": hits})

        return proj.map_batches(
            Flagger, batch_format="pandas", concurrency=actor_pool(),
            fn_constructor_kwargs={"ref": ref, "id_col": id_col,
                                   "text_col": text_col, "n": n})

    # spill: large-large semi join on the hash
    from ray.data.aggregate import Sum

    from .relational import shuffle_semi_join
    doc_ng = proj.map_batches(_NgramHasher(id_col, text_col, n),
                              batch_format="pandas")
    matched = shuffle_semi_join(doc_ng, eval_hashes, on=["ngh"],
                                num_partitions=num_partitions)

    # Per-doc count + zero-fill as ONE groupby-sum over a union: each
    # matched n-gram row contributes 1, each spine row contributes 0.
    # (A left_outer Dataset.join back onto the spine would be the obvious
    # shape, but a join whose right side descends from another join loses
    # schema metadata for empty hash partitions and Acero rejects the
    # zero-column empty table — "No match for FieldRef"; the union-sum is
    # also one fewer shuffle.)
    cnt_schema = pa.schema([(id_col, pa.int64()),
                            ("n_contaminated", pa.int64())])

    def _count_rows(fill: int):
        def f(t: pa.Table) -> pa.Table:
            if t.num_columns == 0:  # empty shuffle partition, "." schema
                return cnt_schema.empty_table()
            return pa.table({
                id_col: pc.cast(t[id_col], pa.int64()),
                "n_contaminated": pa.array(
                    np.full(t.num_rows, fill, dtype=np.int64))})
        return f

    spine = (distinct(proj.select_columns([id_col]), [id_col])
             .map_batches(_count_rows(0), batch_format="pyarrow"))
    ones = matched.map_batches(_count_rows(1), batch_format="pyarrow")
    return (spine.union(ones).groupby(id_col)
            .aggregate(Sum("n_contaminated", alias_name="n_contaminated")))


# --- Weighted corpus mixing by repetition --------------------------------

def repeat_by_weight(ds: rd.Dataset, key_col: str, group_col: str,
                     weights: dict, default: float = 1.0,
                     seed: int = 42, method: str = "md5",
                     epoch_col: str = "epoch") -> rd.Dataset:
    """Deterministic corpus mixing by repetition ("epochs per source",
    the Gopher/LLaMA pretraining-mix primitive): every row of group
    ``g`` appears ``floor(w_g)`` times plus one more with probability
    ``frac(w_g)``, decided by the row's key hash — so re-runs, resumes
    and growing inputs all reproduce the same copies.  Copies are
    labeled ``0..k-1`` in ``epoch_col``.  Weights below 1 subsample
    (``w=0.2`` keeps a deterministic 20 %); the two hash backends are
    ``ops.sampling``'s (``md5`` = DuckDB-verifiable, ``fast`` =
    vectorized splitmix64 for integer keys at production scale).

    Stateless per-batch ``np.repeat`` expansion — no shuffle, no driver
    state; output size scales by the mean weight, never by corpus size
    in any single worker."""
    from .sampling import _HEX_BITS, _unit_hash, fraction_to_hex

    plan = {}  # group -> (base copies, extra-copy threshold in [0,1])
    for g, w in {**weights}.items():
        if w < 0:
            raise ValueError(f"weight for {g!r} must be >= 0, got {w}")
        base = int(np.floor(w))
        frac = float(w) - base
        thr = (int(fraction_to_hex(frac), 16) / float(1 << _HEX_BITS)
               if method == "md5" else frac)
        plan[g] = (base, thr)
    dbase = int(np.floor(default))
    dfrac = float(default) - dbase
    dthr = (int(fraction_to_hex(dfrac), 16) / float(1 << _HEX_BITS)
            if method == "md5" else dfrac)

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            b = b.copy()
            b[epoch_col] = pd.Series([], dtype="int64")
            return b
        groups = b[group_col]
        base = groups.map({g: p[0] for g, p in plan.items()}).fillna(
            dbase).to_numpy(dtype=np.int64)
        thr = groups.map({g: p[1] for g, p in plan.items()}).fillna(
            dthr).to_numpy(dtype=np.float64)
        u = _unit_hash(b[key_col].to_numpy(), seed, method)
        k = base + (u < thr)
        idx = np.repeat(np.arange(len(b)), k)
        out = b.iloc[idx].reset_index(drop=True)
        starts = np.concatenate(([0], np.cumsum(k)[:-1]))
        out[epoch_col] = (np.arange(int(k.sum()), dtype=np.int64)
                          - np.repeat(starts, k))
        return out

    return ds.map_batches(expand, batch_format="pandas")


# --- Exact distributed prefix sum + sequence packing ---------------------

def prefix_sum_by_group(ds: rd.Dataset, group_col: str, value_col: str,
                        order_col: str, out_col: str = "cum_before",
                        n_buckets: int = 256,
                        num_partitions: int = 64) -> rd.Dataset:
    """EXCLUSIVE per-group running sum ordered by ``order_col`` (SQL:
    ``SUM(v) OVER (PARTITION BY g ORDER BY ord ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``, null → 0) — the distributed prefix-sum
    primitive behind sequence packing and budget selection.

    Scale shape (no global sort):
      1. fixed-width ORDER BUCKETS over the order-column range (one tiny
         Min/Max aggregate);
      2. ``groupby(group, bucket).sum`` → groups×buckets rows on the
         driver, turned into each bucket's exclusive START offset;
      3. ``partitioned_group_apply`` on (group, bucket): each hash
         partition sorts once by (group, bucket, order) and runs ONE
         pandas cumsum C kernel for all its keys, adding the broadcast
         start offsets.

    Partitioning assumption: one hash partition (≈ #(group,bucket) pairs
    / P buckets' rows) fits in a worker — raise ``n_buckets`` /
    ``num_partitions`` as data grows.  ``order_col`` must be integer and
    unique within a group for a deterministic order."""
    from ray.data.aggregate import Max, Min, Sum

    from .grouped import partitioned_group_apply

    proj_cols = list(dict.fromkeys([group_col, order_col, value_col]))
    meta = ds.select_columns(proj_cols)

    rng = meta.select_columns([order_col]).aggregate(
        Min(order_col, alias_name="lo"), Max(order_col, alias_name="hi"))
    if rng is None or rng.get("lo") is None:
        # empty input: Ray skips map stages entirely, so build the
        # empty-but-schema'd result directly
        sch = pa.schema(list(zip(ds.schema().names, ds.schema().types))
                        + [(out_col, pa.int64())])
        return rd.from_arrow(sch.empty_table())
    lo, hi = int(rng["lo"]), int(rng["hi"])
    width = max(1, (hi - lo + n_buckets) // n_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(pc.subtract(
            pc.cast(t[order_col], pa.int64()), lo), width)), pa.int64())
        return t.append_column("__b", b)

    per_bucket = (meta.map_batches(add_bucket, batch_format="pyarrow")
                  .groupby([group_col, "__b"])
                  .aggregate(Sum(value_col, alias_name="tok")).to_pandas())

    starts: dict = {}  # (group, bucket) -> exclusive prefix entering it
    for g, grp in per_bucket.groupby(group_col):
        grp = grp.sort_values("__b")
        cum = grp["tok"].cumsum().shift(fill_value=0)
        for b, s in zip(grp["__b"], cum):
            starts[(g, int(b))] = int(s)
    starts_ref = ray.put(starts)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(starts_ref)
        df = df.sort_values([group_col, "__b", order_col],
                            kind="mergesort").reset_index(drop=True)
        within = (df.groupby([group_col, "__b"], sort=False)[value_col]
                  .cumsum() - df[value_col])
        base = pd.Series(
            [st[(g, b)] for g, b in zip(df[group_col], df["__b"])],
            index=df.index, dtype="int64")
        df[out_col] = (within + base).astype("int64")
        return df.drop(columns=["__b"])

    src = meta if set(ds.schema().names) <= set(proj_cols) else ds
    bucketed = src.map_batches(add_bucket, batch_format="pyarrow")
    return partitioned_group_apply(bucketed, [group_col, "__b"], scan,
                                   num_partitions=num_partitions)


def pack_sequences(ds: rd.Dataset, group_col: str, token_col: str,
                   order_col: str, seq_len: int,
                   n_buckets: int = 256,
                   num_partitions: int = 64) -> rd.Dataset:
    """GPT-style sequence packing: concatenate each group's documents in
    ``order_col`` order and cut every ``seq_len`` tokens — each doc gets
    ``seq_id`` (which training sequence its first token lands in) and
    ``seq_offset`` (position within that sequence); docs straddle
    boundaries, exactly like pretraining concat-and-chunk.  Pure
    arithmetic over the exclusive prefix sum, so the whole op streams."""
    cb = prefix_sum_by_group(ds, group_col, token_col, order_col,
                             out_col="__cb", n_buckets=n_buckets,
                             num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        cbv = pc.cast(t["__cb"], pa.int64())
        t = t.drop_columns(["__cb"])
        t = t.append_column("seq_id", pc.cast(
            pc.floor(pc.divide(cbv, seq_len)), pa.int64()))
        return t.append_column("seq_offset", pc.subtract(
            cbv, pc.multiply(t["seq_id"], seq_len)))

    return cb.map_batches(finish, batch_format="pyarrow")


def temperature_weights(counts: dict, alpha: float,
                        target_total: int | None = None) -> dict:
    """Temperature-based corpus mixing weights (the T5/Gopher
    ``p_g ∝ share_g^alpha`` rebalance): returns epochs-per-group weights
    for :func:`repeat_by_weight` such that group g contributes
    ``share_g^alpha / Σ share^alpha`` of ``target_total`` rows (default:
    keep the corpus size).  ``alpha < 1`` upsamples small groups,
    ``alpha = 1`` is a no-op, ``alpha = 0`` equalizes groups.

    Driver-side arithmetic over one tiny count dict — the heavy lifting
    stays in ``repeat_by_weight``'s stateless per-batch expansion."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    if any(n <= 0 for n in counts.values()):
        raise ValueError("group counts must be positive")
    tot = sum(counts.values())
    pw = {g: (n / tot) ** alpha for g, n in sorted(counts.items())}
    z = sum(pw.values())
    tgt = tot if target_total is None else target_total
    return {g: pw[g] / z * tgt / counts[g] for g in counts}


def dsir_weights(ds: rd.Dataset, target_col: str, id_col: str = "doc_id",
                 text_col: str = "text", alpha: float = 0.5,
                 n_buckets: int | None = None) -> rd.Dataset:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by how target-like its unigram distribution is —
    ``w(doc) = Σ_tokens [ ln p̂_target(t) − ln p̂_corpus(t) ]`` with
    add-``alpha`` smoothing over the shared feature space.  Selecting
    top-weight (or Gumbel-resampled) docs upsamples data that looks like
    the target domain.

    ``target_col`` is a boolean/int column marking the target subset
    (e.g. ``lang == 'en'`` or "is curated wiki").  Feature space:

    * ``n_buckets=None`` — raw tokens; the count table and broadcast
      log-ratio model are VOCABULARY-sized.  Exactly SQL-expressible
      (the oracle path).
    * ``n_buckets=B`` — DSIR's hashed n-gram trick: features are
      ``hash64(token) mod B``, so the model is a fixed-size float array
      (B entries, the paper uses 10⁴) no matter the corpus vocabulary —
      the 100 TB path.

    Distributed shape: ONE tagged-count pass (per-batch partial
    ``(feat, n_target, n_all)`` → ``groupby.sum`` exchange, shuffle ∝
    per-batch vocabulary), model built driver-side from the vocab/B-sized
    table and broadcast via ``ray.put`` once, then one streaming scoring
    pass (vectorized searchsorted / direct indexing).  Output: ``id_col``,
    ``n_tokens``, ``dsir_weight`` — docs with 0 tokens are omitted (no
    feature evidence either way)."""
    from ..sketches import hash64
    from .text import _explode_tokens

    def partial(batch: pd.DataFrame) -> pa.Table:
        ids, toks = _explode_tokens(batch, id_col, text_col)
        if len(toks) == 0:
            return pa.table({"feat": pa.array([], pa.string()),
                             "ct": pa.array([], pa.int64()),
                             "ca": pa.array([], pa.int64())})
        flag = (pd.Series(batch[target_col].to_numpy(),
                          index=batch[id_col].to_numpy())
                .astype(bool).loc[ids].to_numpy())
        if n_buckets is not None:
            feat = (hash64(toks).view(np.int64) % n_buckets).astype("U")
        else:
            feat = toks
        df = pd.DataFrame({"f": feat, "t": flag})
        g = df.groupby("f", sort=False)["t"].agg(["sum", "count"])
        return pa.table({
            "feat": pa.array(g.index.to_numpy(dtype=object), pa.string()),
            "ct": pa.array(g["sum"].to_numpy(np.int64)),
            "ca": pa.array(g["count"].to_numpy(np.int64))})

    from ray.data.aggregate import Sum

    cdf = (ds.map_batches(partial, batch_format="pandas")
           .groupby("feat")
           .aggregate(Sum("ct", alias_name="ct"),
                      Sum("ca", alias_name="ca")).to_pandas())
    feats = np.sort(cdf["feat"].to_numpy(dtype=object))
    order = cdf.set_index("feat").loc[feats]
    ct = order["ct"].to_numpy(np.float64)
    ca = order["ca"].to_numpy(np.float64)
    nv = len(feats)
    tt, ta = float(ct.sum()), float(ca.sum())
    lr = (np.log((ct + alpha) / (tt + alpha * nv))
          - np.log((ca + alpha) / (ta + alpha * nv)))
    ref = ray.put((feats, lr))

    class Scorer:
        def __init__(self):
            self.feats, self.lr = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "dsir_weight": pd.Series([], dtype="float64")})
            ids, toks = _explode_tokens(batch, id_col, text_col)
            if len(toks) == 0:
                return empty
            if n_buckets is not None:
                feat = (hash64(toks).view(np.int64)
                        % n_buckets).astype("U")
            else:
                feat = toks
            pos = np.searchsorted(self.feats, feat)
            pos_c = np.clip(pos, 0, len(self.feats) - 1)
            hit = self.feats[pos_c] == feat
            # every scored token was counted in the training pass, so a
            # miss is impossible when scoring the same corpus; scoring a
            # NEW corpus against this model gets the smoothing-only ratio
            miss_lr = float(np.log((alpha / (tt + alpha * nv)))
                            - np.log((alpha / (ta + alpha * nv))))
            val = np.where(hit, self.lr[pos_c], miss_lr)
            g = (pd.DataFrame({"d": ids, "v": val})
                 .groupby("d", sort=False)["v"].agg(["count", "sum"]))
            return pd.DataFrame({
                id_col: g.index.to_numpy(),
                "n_tokens": g["count"].to_numpy(np.int64),
                "dsir_weight": g["sum"].to_numpy(np.float64)})

    return ds.map_batches(Scorer, batch_format="pandas",
                          concurrency=actor_pool())


def dup_ngram_stats(ds: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", n: int = 3,
                    min_docs: int = 2,
                    num_partitions: int = 64) -> rd.Dataset:
    """Per-document duplicate n-gram fraction — the corpus SELF-overlap
    score (the within-corpus companion of ``decontaminate``'s
    train-vs-eval overlap): for every document, how many of its
    ``n``-token windows carry an n-gram that occurs in ≥ ``min_docs``
    DISTINCT documents.  High-fraction docs are boilerplate/templated
    content (Lee et al. 2022 §4 use exactly this signal to rank
    training-data duplication).

    Distributed shape — two key-hash exchanges, nothing corpus-sized on
    the driver and no broadcast (dup-gram vocabulary may itself be huge
    at 100 TB, so unlike ``decontaminate`` there is no small side):

    1. one ``map_batches`` pass explodes windows into counted
       ``(doc, ngh, cnt)`` rows (vectorized ``_ngram_hash_frame``,
       64-bit siphash; per-batch multiplicity pre-aggregated so each
       window still counts once but repeats ship as one row);
    2. hash-partition by ``ngh`` (``partitioned_group_apply``): within a
       partition each gram's global distinct-doc count is computable
       exactly (all rows of a gram co-locate); rows are flagged
       dup/non-dup and collapsed to per-doc partials ``(doc, n_windows,
       n_dup)`` — output ∝ distinct docs per partition;
    3. ``groupby(doc).sum`` merges partials; a final vectorized pass
       adds ``dup_fraction``.

    Docs with < ``n`` tokens have no windows and emit no row (mirrors
    the oracle's n-gram join).  Returns ``(id_col, n_windows,
    n_dup_windows, dup_fraction)``.  64-bit hashes stand in for the raw
    n-gram strings (~2^-64 pair collision odds — the ``decontaminate``
    convention, driver-attested green at sf0.01 in round 4)."""
    from .grouped import partitioned_group_apply

    def window_rows(batch: pd.DataFrame) -> pa.Table:
        # arrow out: pandas blocks into the downstream shuffle are ~14x
        # slower through Ray's sort-based exchange (ROUND_NOTES r4).
        # Per-batch (doc, gram) multiplicity pre-aggregation: templated /
        # boilerplate corpora repeat grams within a doc, so the exchange
        # ships one counted row per distinct (doc, gram) instead of one
        # row per window.
        ids, h = _ngram_hash_frame(batch, id_col, text_col, n)
        g = (pd.DataFrame({"doc": ids, "ngh": h})
             .groupby(["doc", "ngh"], sort=False).size().reset_index())
        return pa.table({"doc": pa.array(g["doc"].to_numpy(np.int64)),
                         "ngh": pa.array(g["ngh"].to_numpy(np.int64)),
                         "cnt": pa.array(g[0].to_numpy(np.int64))})

    rows = ds.select_columns([id_col, text_col]).map_batches(
        window_rows, batch_format="pandas")

    def per_gram(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "nw": pd.Series([], dtype="int64"),
                                 "ndup": pd.Series([], dtype="int64")})
        # rows are (doc, ngh, cnt) with (doc, ngh) possibly split across
        # source batches — nunique over doc stays exact regardless
        ndocs = df.groupby("ngh", sort=False)["doc"].transform("nunique")
        cnt = df["cnt"].to_numpy(np.int64)
        dup = np.where(ndocs.to_numpy() >= min_docs, cnt, 0)
        g = (pd.DataFrame({"d": df["doc"].to_numpy(), "w": cnt, "x": dup})
             .groupby("d", sort=False)[["w", "x"]].sum())
        return pd.DataFrame({id_col: g.index.to_numpy(),
                             "nw": g["w"].to_numpy(np.int64),
                             "ndup": g["x"].to_numpy(np.int64)})

    partials = partitioned_group_apply(rows, ["ngh"], per_gram,
                                       num_partitions=num_partitions)

    # per-doc merge as a second PART_COL exchange with an arrow-native
    # in-partition sum — ~3x the sort-based groupby(doc).Sum on the
    # same partials (0.6 s vs 1.7 s at 167 k partial rows, 32 CPUs)
    def doc_sum(t: pa.Table) -> pa.Table:
        g = t.group_by([id_col]).aggregate([("nw", "sum"),
                                            ("ndup", "sum")])
        # arrow group_by emits aggregate columns first, keys last
        return pa.table({id_col: g[id_col],
                         "n_windows": g["nw_sum"],
                         "n_dup_windows": g["ndup_sum"]})

    summed = partitioned_group_apply(partials, [id_col], doc_sum,
                                     num_partitions=32,
                                     batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        frac = pc.divide(pc.cast(t["n_dup_windows"], pa.float64()),
                         pc.cast(t["n_windows"], pa.float64()))
        return t.append_column("dup_fraction", frac)

    return summed.map_batches(finish, batch_format="pyarrow")


def source_ngram_overlap(ds: rd.Dataset, group_col: str = "source",
                         text_col: str = "text", n: int = 3,
                         num_partitions: int = 64) -> pd.DataFrame:
    """Pairwise n-gram Jaccard overlap BETWEEN corpus slices (sources /
    languages / snapshots): for every unordered pair (a, b) of
    ``group_col`` values, ``J = |grams_a ∩ grams_b| / |grams_a ∪
    grams_b|`` over each slice's DISTINCT n-gram set.  The
    corpus-composition diagnostic: which sources are near-copies of
    each other, which are genuinely novel.

    Distributed shape: one explode pass emits per-batch-distinct
    ``(ngh, group)`` rows; ONE hash exchange by ``ngh`` co-locates each
    gram's groups, and every partition collapses to a tiny G×G
    co-occurrence matrix via a boolean pivot + matmul (G = distinct
    groups, presumed small — sources, languages).  The driver sums
    |partitions| G² matrices: intersection = off-diagonal, per-group
    distinct-gram counts = diagonal.  Nothing gram-scale ever leaves
    the exchange.  Returns a pandas DataFrame ``(group_a, group_b,
    n_common, n_a, n_b, jaccard)``, every unordered pair, a < b."""
    from .grouped import partitioned_group_apply

    def gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        # hash windows per ROW (positional id) so n-grams never straddle
        # document boundaries, then map each window to its row's group
        b = batch.assign(__rid=np.arange(len(batch), dtype=np.int64))
        ids, h = _ngram_hash_frame(b, "__rid", text_col, n)
        if len(h) == 0:
            return pa.table({"ngh": pa.array([], pa.int64()),
                             "grp": pa.array([], pa.string())})
        grp = batch[group_col].to_numpy(dtype=object)[ids]
        df = (pd.DataFrame({"ngh": h, "grp": grp.astype(str)})
              .drop_duplicates(ignore_index=True))
        return pa.table({"ngh": pa.array(df["ngh"].to_numpy()),
                         "grp": pa.array(df["grp"], pa.string())})

    rows = ds.select_columns([group_col, text_col]).map_batches(
        gram_rows, batch_format="pandas")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"ga": pd.Series([], dtype="str"),
                                 "gb": pd.Series([], dtype="str"),
                                 "c": pd.Series([], dtype="int64")})
        df = df.drop_duplicates()          # global distinct: ngh co-located
        piv = (df.assign(one=1)
               .pivot_table(index="ngh", columns="grp", values="one",
                            fill_value=0, aggfunc="max"))
        m = piv.to_numpy(dtype=np.int64)
        co = m.T @ m                       # G×G co-occurrence (diag = |grams_g|)
        groups = piv.columns.to_numpy(dtype=object)
        ga, gb, c = [], [], []
        for i in range(len(groups)):
            for j in range(i, len(groups)):
                ga.append(groups[i]); gb.append(groups[j])
                c.append(int(co[i, j]))
        return pd.DataFrame({"ga": ga, "gb": gb,
                             "c": np.asarray(c, dtype=np.int64)})

    parts = partitioned_group_apply(rows, ["ngh"], per_part,
                                    num_partitions=num_partitions)
    co = (parts.groupby(["ga", "gb"]).sum("c").to_pandas()
          .rename(columns={"sum(c)": "c"}))
    diag = (co[co["ga"] == co["gb"]].set_index("ga")["c"].to_dict())
    groups = sorted(diag)
    out = []
    for i, a in enumerate(groups):
        for b in groups[i + 1:]:
            m = co[(co["ga"] == a) & (co["gb"] == b)]["c"]
            ncommon = int(m.iloc[0]) if len(m) else 0
            na, nb = diag[a], diag[b]
            out.append((a, b, ncommon, na, nb,
                        ncommon / (na + nb - ncommon)))
    return pd.DataFrame(out, columns=["group_a", "group_b", "n_common",
                                      "n_a", "n_b", "jaccard"])


def semantic_decontaminate(ds: rd.Dataset, eval_ds: rd.Dataset,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           threshold: float = 0.8,
                           round_decimals: int = 4) -> rd.Dataset:
    """Embedding-space test-set decontamination — the semantic companion
    of :func:`decontaminate`'s n-gram overlap: flag every training row
    whose embedding is cosine-similar (``>= threshold``) to ANY
    evaluation-set embedding.  Catches paraphrased / translated /
    reformatted benchmark leakage that exact n-grams miss.

    Scale shape: eval sets are small (10^4–10^5 rows even for large
    suites), so the L2-normalized eval matrix is collected once,
    ``ray.put`` once, and every ``map_batches`` task streams train
    batches through ONE ``X @ E.T`` matmul — no shuffle, no join, output
    one row per train row.  At 100 TB the cost is a single read-through
    of the train embeddings; the eval matrix (d × |eval| floats) rides
    the object store to each task.

    ``max_sim`` is rounded to ``round_decimals`` BEFORE the threshold
    compare so the flag is reproducible against a DuckDB
    ``list_cosine_similarity`` oracle (the q15 convention: engine and
    SQL agree at 4 decimals).  Returns ``(id_col, max_sim,
    contaminated)`` for every train row; an empty eval set yields
    ``max_sim = -1.0`` and no flags."""
    ev = eval_ds.select_columns([vec_col]).to_pandas()
    if len(ev):
        E = np.stack(ev[vec_col].to_numpy()).astype(np.float64)
        E = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
    else:
        E = None
    ref = ray.put(E)

    def score(batch: pd.DataFrame) -> pa.Table:
        En = ray.get(ref)
        ids = batch[id_col].to_numpy(np.int64)
        if En is None or len(batch) == 0:
            ms = np.full(len(batch), -1.0)
        else:
            X = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                                1e-12)
            ms = (Xn @ En.T).max(axis=1)
        ms = np.round(ms, round_decimals)
        return pa.table({
            id_col: pa.array(ids),
            "max_sim": pa.array(ms, pa.float64()),
            "contaminated": pa.array((ms >= threshold).astype(np.int64))})

    return ds.select_columns([id_col, vec_col]).map_batches(
        score, batch_format="pandas")
