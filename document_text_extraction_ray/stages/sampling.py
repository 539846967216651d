"""Deterministic sampling, split assignment, and sequence-packing operators —
the corpus-curation steps of a training-data pipeline (sample a pilot set,
carve train/val/test, pack documents into token-budget bins).

All decisions derive from md5 of the row id (or a per-key ordered prefix
sum), never an RNG: re-running any shard reproduces the same output, a
failed partition can be retried without re-sampling the world, and the same
predicate is expressible in SQL (DuckDB md5 / SUM OVER), which is how the
oracles check these end-to-end.

Scale notes: sampling and splitting are embarrassingly parallel row-local
map_batches; packing shuffles once on the partition key (bins are
per-source, so the global-order dependence is confined to one group).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa


def md5_prefix(value) -> str:
    """First hex byte (2 lowercase hex chars) of md5(str(value)) — the
    deterministic 0..255 bucket every operator here keys on."""
    return hashlib.md5(str(value).encode("utf-8")).hexdigest()[:2]


def _prefix_column(batch: pa.Table, id_column: str) -> list:
    return [md5_prefix(v) for v in batch.column(id_column).to_pylist()]


def hash_sample(ds, id_column: str, rate_hex: str = "1a"):
    """Deterministic Bernoulli-style sample: keep rows whose md5 prefix is
    lexicographically below ``rate_hex`` (e.g. '1a' = 26/256 ~ 10.2%).

    Unlike ``ds.random_sample`` this is stable under retries and resharding
    — the membership of a row depends only on its id."""

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array([p < rate_hex for p in _prefix_column(batch, id_column)],
                        pa.bool_())
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_hash_sample(ds, id_column: str, strata_column: str,
                           rates: dict, default_hex: str = "1a"):
    """Per-stratum deterministic sampling: each stratum gets its own
    md5-prefix bound (e.g. downsample an over-represented domain to 5% and
    keep a rare one at 50%) — the mix-rebalancing step of a training
    pipeline.  Row-local and retry-stable like ``hash_sample``; no
    shuffle."""

    def keep(batch: pa.Table) -> pa.Table:
        ps = _prefix_column(batch, id_column)
        strata = batch.column(strata_column).to_pylist()
        mask = [
            p < rates.get(s, default_hex) for p, s in zip(ps, strata)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


SPLIT_BOUNDS = (("val", "1a"), ("test", "34"))  # 26/256 each; rest = train


def assign_split(ds, id_column: str, out_column: str = "split"):
    """Deterministic train/val/test assignment from the id hash:
    prefix < '1a' -> val, < '34' -> test, else train (~10/10/80)."""

    def assign(batch: pa.Table) -> pa.Table:
        labels = []
        for p in _prefix_column(batch, id_column):
            for name, bound in SPLIT_BOUNDS:
                if p < bound:
                    labels.append(name)
                    break
            else:
                labels.append("train")
        return batch.append_column(out_column, pa.array(labels, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def token_budget_bins(ds, key_column: str, order_column: str,
                      tokens_column: str, budget: int = 5000,
                      out_column: str = "bin_id"):
    """Sequence-packing bin assignment: within each ``key_column`` group,
    rows ordered by ``order_column`` are assigned
    bin_id = floor(exclusive-prefix-sum(tokens) / budget).

    This is the streaming 'chunk by cumulative token budget' packing used to
    build ~budget-token training shards; the prefix-sum semantics (a doc may
    straddle a boundary and belongs to the bin its prefix sum starts in) is
    exactly SUM() OVER in SQL, which the oracle exploits.  One shuffle on the
    key; global order dependence confined to each group."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_column, kind="mergesort").copy()
        prior = g[tokens_column].cumsum() - g[tokens_column]
        g[out_column] = (prior // budget).astype("int64")
        return g

    from .aggregate import bucketed_map_groups

    return bucketed_map_groups(ds, key_column, fold)


def weighted_hash_sample(ds, id_column: str, weight_column: str,
                         max_weight: int):
    """Deterministic WEIGHTED sampling: row kept with probability
    weight/max_weight, decided by its md5 — retry/reshard-stable like
    ``hash_sample``, but importance-weighted (e.g. sample long documents
    proportionally to length for a pilot set).

    Integer-exact predicate (no float thresholds to drift vs SQL):
    ``int(md5[:4], 16) * max_weight < 65536 * weight`` — i.e. the 16-bit
    md5 prefix falls below the weight's share of 65536.  Rows at full
    weight are always kept.  Row-local, no shuffle."""

    def keep(batch: pa.Table) -> pa.Table:
        import numpy as np

        h = np.array([
            int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:4], 16)
            for v in batch.column(id_column).to_pylist()
        ], np.int64)
        w = batch.column(weight_column).to_numpy(zero_copy_only=False) \
                 .astype(np.int64)
        mask = h * max_weight < 65536 * w
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_per_group(ds, key_column: str, id_column: str, n: int,
                     n_buckets: int = 32):
    """Deterministic n-per-group uniform sample: within each key, rows rank
    by (md5(id) hex, id) and the first ``n`` survive — the reproducible
    replacement for per-group reservoir sampling (reservoirs depend on
    arrival order; an md5 rank is a fixed random permutation, stable under
    retries / resharding / cluster size).

    One bucketed exchange on the key + a whole-bucket vectorized fold.
    Returns (key, id, rnk) with rnk = 1..n per key.  Use for per-domain
    training-data caps where the cap must be an unbiased sample rather
    than domain_cap's smallest-id prefix."""
    import pandas as pd

    from .aggregate import bucketed_fold

    def with_hash(t: pa.Table) -> pa.Table:
        h = [md5_prefix_full(v) for v in t.column(id_column).to_pylist()]
        return pa.table({
            key_column: t.column(key_column),
            id_column: t.column(id_column),
            "__h": pa.array(h, pa.string()),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_column, "__h", id_column], kind="mergesort")
        g = g.groupby(key_column, sort=False).head(n).copy()
        g["rnk"] = g.groupby(key_column, sort=False).cumcount() + 1
        g["rnk"] = g["rnk"].astype("int64")
        return g[[key_column, id_column, "rnk"]]

    thin = ds.select_columns([key_column, id_column]).map_batches(
        with_hash, batch_format="pyarrow")
    return bucketed_fold(thin, key_column, fold, n_buckets=n_buckets)


def md5_prefix_full(value) -> str:
    """Full md5 hex of str(value) — the per-group sampling rank key
    (DuckDB replay: md5(CAST(col AS VARCHAR)))."""
    return hashlib.md5(str(value).encode("utf-8")).hexdigest()


def pack_sequences(ds, key_column: str, order_column: str,
                   tokens_column: str, text_column: str, budget: int = 5000,
                   sep: str = "\n\n", max_docs_per_pack: int | None = None,
                   n_buckets: int = 32):
    """SEQUENCE PACKING — the step after bin assignment: documents are
    chunked by cumulative token budget (``token_budget_bins``), then each
    (key, bin) becomes ONE packed training sequence: the member texts
    concatenated in order with ``sep`` as the document boundary, plus the
    member count.  Two bucketed exchanges total (bin assignment on the
    key, concat on the composite (key, bin)); ``max_docs_per_pack``
    bounds a pathological bin (a run of zero-token docs never advances
    the prefix sum) the way grouped_concat caps hot keys."""
    from .aggregate import grouped_concat

    binned = token_budget_bins(ds, key_column, order_column, tokens_column,
                               budget=budget)
    return grouped_concat(binned, [key_column, "bin_id"], text_column,
                          [order_column], sep=sep, out_column="packed",
                          n_buckets=n_buckets, max_items=max_docs_per_pack)


def mixture_resample(ds, strata_column: str, id_column: str,
                     target_weights: dict, n_buckets: int = 32):
    """Resample a corpus DOWN to a target domain mixture (the DoReMi /
    pile-construction step): given relative integer ``target_weights``
    per stratum (e.g. {"web": 6, "wiki": 3, "code": 1}), keep a
    hash-deterministic subset whose per-stratum sizes sit in the target
    ratio — the largest such subset the corpus supports (the scarcest
    stratum relative to its weight binds; that stratum keeps ~everything).

    Integer-exact plan, fully SQL-replayable:
      1. one thin pre-aggregated count per stratum (a #strata-row table —
         dimension-sized, collected to the driver like percentile_filter's
         bounds table);
      2. scale = min_s floor(c_s * 10^6 / w_s); quota t_s =
         floor(scale * w_s / 10^6)  (<= c_s by construction);
      3. row-local keep: md5_16(id) * c_s < 65536 * t_s — the corpus
         itself never shuffles, and the predicate is retry/reshard-stable
         (same md5 contract as ``hash_sample``).
    Kept sizes are hash-binomial around the quotas (exact-quota sampling
    would need a per-stratum top-k by hash instead — heavier exchange).
    Strata absent from ``target_weights`` are dropped (weight 0)."""
    from .aggregate import pre_aggregated_count

    counts = pre_aggregated_count(ds, strata_column, alias="__n",
                                  n_buckets=min(n_buckets, 8)).take_all()
    c = {r[strata_column]: int(r["__n"]) for r in counts}
    scale = min(
        (c[s] * 1_000_000) // w
        for s, w in target_weights.items() if w > 0 and s in c
    )
    quota = {s: min((scale * w) // 1_000_000, c.get(s, 0))
             for s, w in target_weights.items() if w > 0}

    def keep(batch: pa.Table) -> pa.Table:
        import numpy as np

        strata = batch.column(strata_column).to_pylist()
        h = np.array([
            int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:4], 16)
            for v in batch.column(id_column).to_pylist()
        ], np.int64)
        cs = np.array([c.get(s, 0) for s in strata], np.int64)
        ts = np.array([quota.get(s, 0) for s in strata], np.int64)
        return batch.filter(pa.array(h * cs < 65536 * ts))

    return ds.map_batches(keep, batch_format="pyarrow")


def rendezvous_rebalance_stats(ds, key_col: str, n_old: int, n_new: int,
                               n_buckets: int = 8):
    """RENDEZVOUS (highest-random-weight) hashing — the consistent
    partitioner: key k goes to argmax_w md5_u64(f"{k}:{w}").  Growing the
    worker set from ``n_old`` to ``n_new`` moves ONLY the keys whose new
    argmax is a new worker (expected n_keys·(n_new-n_old)/n_new) — no
    ring, no virtual nodes, deterministic, SQL-replayable
    (md5_number_lower).  The shard-rebalancing planner for ingestion
    actors and bucketed storage.

    Returns per-worker (worker, n_old_keys, n_new_keys, n_stayed) — the
    movement report; row-local argmax + one bucketed combine."""
    import pyarrow as pa

    from ..functions.textstats import md5_u64
    from .aggregate import bucketed_combine

    def partial(t: pa.Table) -> pa.Table:
        acc: dict = {}
        for k in t.column(key_col).to_pylist():
            hs = [md5_u64(f"{k}:{w}") for w in range(n_new)]
            w_old = max(range(n_old), key=lambda w: (hs[w], -w))
            w_new = max(range(n_new), key=lambda w: (hs[w], -w))
            o = acc.setdefault(w_old, [0, 0, 0])
            o[0] += 1
            if w_old == w_new:
                o[2] += 1
            acc.setdefault(w_new, [0, 0, 0])[1] += 1
        ws = sorted(acc)
        return pa.table({
            "worker": pa.array(ws, pa.int64()),
            "po": pa.array([acc[w][0] for w in ws], pa.int64()),
            "pn": pa.array([acc[w][1] for w in ws], pa.int64()),
            "ps": pa.array([acc[w][2] for w in ws], pa.int64()),
        })

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("worker").aggregate(
            [("po", "sum"), ("pn", "sum"), ("ps", "sum")])
        return pa.table({"worker": g.column("worker"),
                         "n_old_keys": g.column("po_sum"),
                         "n_new_keys": g.column("pn_sum"),
                         "n_stayed": g.column("ps_sum")})

    return bucketed_combine(
        ds.select_columns([key_col]).map_batches(
            partial, batch_format="pyarrow"),
        "worker", combine, n_buckets)


def budget_allocation(ds, key_col: str, budget: int, weight_col=None,
                      n_buckets: int = 32):
    """Exact integer apportionment of a global budget across keys by the
    LARGEST-REMAINDER method (Hamilton apportionment): quota_k =
    floor(budget * w_k / W) plus +1 for the ``budget - sum(floor)`` keys
    with the largest remainders (ties broken by key ascending).  Quotas
    sum to ``budget`` EXACTLY — the crawl-budget / sampling-quota
    allocator where proportional rounding must not leak or overshoot.

    ``weight_col`` None counts rows per key; otherwise weights are summed
    per key.  Plan: one bucketed count/sum exchange builds the key-shaped
    weight table; two SCALAR driver reductions (W and the floor-sum —
    single numbers, never row data); one dataset sort ranks remainders
    via ``global_row_number`` (driver holds one row per BLOCK).  The
    quota table is key-bounded; all arithmetic is int64 — ``budget * W``
    must fit (documented overflow contract).

    Output: (key, weight, quota)."""
    import numpy as np
    import pyarrow.compute as pc

    from .aggregate import pre_aggregated_count, pre_aggregated_sum
    from .windows import global_row_number

    if weight_col is None:
        w = pre_aggregated_count(ds, key_col, n_buckets=n_buckets,
                                 alias="weight")
    else:
        w = pre_aggregated_sum(ds, key_col, weight_col,
                               n_buckets=n_buckets)
        w = w.map_batches(
            lambda t: pa.table({key_col: t.column(key_col),
                                "weight": pc.cast(
                                    t.column(f"sum_{weight_col}"),
                                    pa.int64())}),
            batch_format="pyarrow")
    w = w.materialize()
    total = int(w.sum("weight"))
    if total <= 0:
        raise ValueError("budget_allocation: total weight must be > 0")

    def floors(t: pa.Table) -> pa.Table:
        wt = t.column("weight").to_numpy(zero_copy_only=False) \
              .astype(np.int64)
        base = budget * wt // total
        rem = budget * wt % total
        return pa.table({key_col: t.column(key_col),
                         "weight": pa.array(wt, pa.int64()),
                         "base": pa.array(base, pa.int64()),
                         "rem": pa.array(rem, pa.int64())})

    fl = w.map_batches(floors, batch_format="pyarrow").materialize()
    leftover = budget - int(fl.sum("base"))

    ranked = global_row_number(fl, ["rem", key_col],
                               descending=[True, False], out_column="rn")

    def finish(t: pa.Table) -> pa.Table:
        rn = t.column("rn").to_numpy(zero_copy_only=False).astype(np.int64)
        base = t.column("base").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        return pa.table({
            key_col: t.column(key_col),
            "weight": t.column("weight"),
            "quota": pa.array(base + (rn <= leftover), pa.int64())})

    return ranked.map_batches(finish, batch_format="pyarrow")
