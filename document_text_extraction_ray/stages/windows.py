"""Streaming-shaped operators over the ordered events log (ray_guide
"Streaming-shaped workloads"): tumbling / sliding windows and gap-based
sessionization, all expressed as grouped computation over epoch buckets or
per-key sorted folds.  Ordering assumption: events are processed per key,
sorted by ``ts`` inside each group; groups themselves are unordered.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum


def tumbling_window(ds, ts_col: str, key_col: str, value_col: str,
                    width_s: int = 3600):
    """count + sum per (key, floor(ts/width)) — one grouped aggregate."""

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column(ts_col), pa.int64())
        win = pc.multiply(pc.divide(us, width_s * 1_000_000), width_s)
        return pa.table(
            {
                key_col: t.column(key_col),
                "window_s": pc.cast(win, pa.int64()),
                value_col: t.column(value_col),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby([key_col, "window_s"])
        .aggregate(Count(alias_name="n_events"), Sum(value_col, alias_name="total_value"))
    )


def sliding_window(ds, ts_col: str, key_col: str, value_col: str,
                   width_s: int = 3600, slide_s: int = 900):
    """Sliding windows via explode-to-overlapping-buckets: each event lands in
    width/slide windows -> one grouped aggregate.  Cost multiplies rows by the
    overlap factor — keep width/slide small (the standard explode strategy)."""
    k = width_s // slide_s

    def explode(t: pa.Table) -> pa.Table:
        us = t.column(ts_col).cast(pa.int64()).to_pylist()
        keys = t.column(key_col).to_pylist()
        vals = t.column(value_col).to_pylist()
        out_k, out_w, out_v = [], [], []
        for ts, key, val in zip(us, keys, vals):
            sec = ts // 1_000_000
            last_start = (sec // slide_s) * slide_s
            for i in range(k):
                start = last_start - i * slide_s
                if start <= sec < start + width_s:
                    out_k.append(key)
                    out_w.append(start)
                    out_v.append(val)
        return pa.table(
            {
                key_col: pa.array(out_k),
                "window_s": pa.array(out_w, pa.int64()),
                value_col: pa.array(out_v),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby([key_col, "window_s"])
        .aggregate(Count(alias_name="n_events"), Sum(value_col, alias_name="total_value"))
    )


def global_row_number(ds, sort_cols, descending=False, out_column="rn"):
    """Global ROW_NUMBER over the whole dataset: one dataset sort, then a
    tiny per-block summary pass (one row per block: first-row key +
    row count) collected to the driver, offsets broadcast back, and each
    block numbers itself with a vectorized arange.

    The driver holds ONE ROW PER BLOCK (not per row) — the pattern scales
    to any corpus whose block count is driver-sized.  The sort key
    (including tie-break columns) must be UNIQUE per row: the first-row
    key identifies each block when offsets are applied."""
    import numpy as np
    import ray

    import functools

    if isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    desc = (
        [descending] * len(sort_cols) if isinstance(descending, bool)
        else list(descending)
    )
    sorted_ds = ds.sort(sort_cols, descending=descending).materialize()

    def summarize(b: pa.Table) -> pa.Table:
        ktypes = [b.schema.field(c).type for c in sort_cols]
        if b.num_rows == 0:
            arrays = {f"__k{i}": pa.array([], t)
                      for i, t in enumerate(ktypes)}
            arrays["__n"] = pa.array([], pa.int64())
        else:
            arrays = {
                f"__k{i}": pa.array([b.column(c)[0].as_py()], t)
                for i, (c, t) in enumerate(zip(sort_cols, ktypes))
            }
            arrays["__n"] = pa.array([b.num_rows], pa.int64())
        return pa.table(arrays)

    # One row PER BLOCK (typed first key + row count); blocks are disjoint
    # key ranges after the sort, so ordering summaries by their typed first
    # keys (respecting per-column direction) reproduces the global block
    # order regardless of the take_all enumeration order.
    summaries = sorted_ds.map_batches(
        summarize, batch_size=None, batch_format="pyarrow"
    ).take_all()

    def cmp(a, bb):
        for i in range(len(sort_cols)):
            x, y = a[f"__k{i}"], bb[f"__k{i}"]
            if x is None or y is None:
                raise ValueError(
                    "global_row_number: null sort-key values are not "
                    "supported (the key must be unique and orderable)"
                )
            if x == y:
                continue
            lt = x < y
            return (1 if desc[i] else -1) if lt else (-1 if desc[i] else 1)
        return 0

    offs = {}
    acc = 0
    for s in sorted(summaries, key=functools.cmp_to_key(cmp)):
        key = "\x00".join(str(s[f"__k{i}"]) for i in range(len(sort_cols)))
        if key in offs:
            # Two blocks share a first key => the sort key is not unique
            # per row; silent offset overwrite would corrupt every rn in
            # both blocks.  Fail loudly instead.
            raise ValueError(
                "global_row_number requires a per-row-unique sort key "
                f"(add a tie-break id column); duplicate block key: {key!r}"
            )
        offs[key] = acc
        acc += s["__n"]
    ref = ray.put(offs)

    def number(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_column, pa.array([], pa.int64()))
        table = ray.get(ref)
        first = "\x00".join(str(b.column(c)[0].as_py()) for c in sort_cols)
        base = table[first]
        rn = np.arange(base + 1, base + 1 + b.num_rows, dtype=np.int64)
        return b.append_column(out_column, pa.array(rn, pa.int64()))

    return sorted_ds.map_batches(number, batch_size=None, batch_format="pyarrow")


def moving_avg(ds, key_col: str, order_cols, value_col: str, window: int = 5,
               out_column: str = "moving_avg"):
    """Per-key trailing moving average (AVG OVER ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW): one bucketed shuffle on the key, per-key
    sorted pandas rolling mean."""
    import pandas as pd

    from .aggregate import bucketed_map_groups

    if isinstance(order_cols, str):
        order_cols = [order_cols]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort").copy()
        g[out_column] = (
            g[value_col].rolling(window, min_periods=1).mean()
        )
        return g

    return bucketed_map_groups(ds, key_col, fold)


def sessionize(ds, ts_col: str, key_col: str, gap_s: int = 1800):
    """Gap-based sessions per key: a new session starts when the inter-event
    gap exceeds ``gap_s``.  One shuffle (groupby key), then a per-key sorted
    fold — the per-document-ordered-fold pattern of the reference (M16)
    lifted to the stream shape.

    Returns (key, session_id, session_start_s, session_end_s, n_events) with
    session_id = epoch-seconds of the session's first event (deterministic)."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        # Unit-safe epoch seconds regardless of datetime64 resolution (ns/us).
        secs = g[ts_col].to_numpy().astype("datetime64[s]").astype("int64")
        starts = [0]
        for i in range(1, len(secs)):
            if secs[i] - secs[i - 1] > gap_s:
                starts.append(i)
        rows = []
        key = g[key_col].iloc[0]
        starts.append(len(secs))
        for a, b in zip(starts, starts[1:]):
            rows.append(
                {
                    key_col: key,
                    "session_id": int(secs[a]),
                    "session_start_s": int(secs[a]),
                    "session_end_s": int(secs[b - 1]),
                    "n_events": b - a,
                }
            )
        return pd.DataFrame(rows)

    from .aggregate import bucketed_map_groups

    return bucketed_map_groups(ds, key_col, fold)


def rank_features(ds, key_col: str, order_cols, n_tiles: int = 4):
    """Per-key rank window functions in one fold: ROW_NUMBER (``rn``),
    PERCENT_RANK and CUME_DIST as e6 fixed-point integers (floor division,
    so the SQL replay is bit-exact — computed from rn/n, NOT float window
    functions), and NTILE(``n_tiles``) with DuckDB/ANSI tile sizing (the
    first n % k tiles get the extra row).

    One bucketed shuffle on the key, per-key vectorized numpy fold.
    ``order_cols`` must be a total order within a key (include a unique id
    as tie-break) or ranks are nondeterministic."""
    import pandas as pd

    from .aggregate import bucketed_map_groups

    if isinstance(order_cols, str):
        order_cols = [order_cols]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort").copy()
        n = len(g)
        rn = np.arange(1, n + 1, dtype=np.int64)
        g["rn"] = rn
        g["pct_rank_e6"] = (rn - 1) * 1_000_000 // max(n - 1, 1)
        g["cume_dist_e6"] = rn * 1_000_000 // n
        base, rem = divmod(n, n_tiles)
        boundary = rem * (base + 1)
        if base == 0:
            tile = rn  # fewer rows than tiles: one row per tile
        else:
            tile = np.where(
                rn <= boundary,
                (rn - 1) // (base + 1) + 1,
                rem + (rn - 1 - boundary) // base + 1,
            ).astype(np.int64)
        g["tile"] = tile
        return g

    return bucketed_map_groups(ds, key_col, fold)


def range_window_sum(ds, key_col: str, ts_col: str, value_col: str,
                     range_s: int, order_tiebreak=None,
                     out_column: str = "range_sum"):
    """Trailing TIME-RANGE window aggregate (SQL ``SUM(value) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN range_s PRECEDING AND
    CURRENT ROW)``): for each row, the sum of the key's values within the
    trailing ``range_s`` seconds INCLUSIVE — the time-based sibling of the
    ROWS windows (``moving_avg``).

    One bucketed shuffle on the key; per-key two-pointer numpy pass
    (cumsum + searchsorted on the sorted epoch array), so a key's cost is
    O(n log n) in its own rows.  SQL RANGE semantics: rows SHARING the
    current timestamp are all included, so the output is well-defined
    under ties regardless of ``order_tiebreak`` (which only fixes row
    order in the output)."""
    import pandas as pd

    from .aggregate import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        order = [ts_col] + (list(order_tiebreak) if order_tiebreak else [])
        g = g.sort_values(order, kind="mergesort").copy()
        raw = g[ts_col].to_numpy()
        if np.issubdtype(raw.dtype, np.datetime64):
            secs = raw.astype("datetime64[s]").astype("int64")
        else:
            secs = raw.astype("int64")  # already epoch seconds
        vals = g[value_col].to_numpy()
        # dtype-preserving prefix: int values stay int64 (hash-exact).
        cum = np.concatenate([np.zeros(1, vals.dtype), np.cumsum(vals)])
        # first index inside the window: ts > current - range_s - 1
        lo = np.searchsorted(secs, secs - range_s, side="left")
        # last index: all rows sharing the current ts (RANGE semantics)
        hi = np.searchsorted(secs, secs, side="right")
        g[out_column] = cum[hi] - cum[lo]
        return g

    return bucketed_map_groups(ds, key_col, fold)


def merge_interval_rows(s: np.ndarray, e: np.ndarray):
    """One key's interval coalescing kernel: sort by (start, end), merge
    while next.start <= running max end (closed intervals — touching
    merges).  Returns [(start, end, n_intervals), ...] islands.  Shared by
    the Dataset stage's fold and the property tests."""
    order = np.lexsort((e, s))
    s, e = s[order], e[order]
    rows = []
    cur_s, cur_e, n = int(s[0]), int(e[0]), 1
    for i in range(1, len(s)):
        if s[i] <= cur_e:
            cur_e = max(cur_e, int(e[i]))
            n += 1
        else:
            rows.append((cur_s, cur_e, n))
            cur_s, cur_e, n = int(s[i]), int(e[i]), 1
    rows.append((cur_s, cur_e, n))
    return rows


def merge_intervals(ds, key_col: str, start_col: str, end_col: str):
    """Coalesce overlapping-or-touching [start, end] intervals per key
    (gaps-and-islands): intervals sorted by (start, end) merge while the
    next start <= the running max end.  Returns (key, start, end,
    n_intervals) — one row per merged island, integer-exact.

    One bucketed shuffle on the key, per-key sorted numpy fold (the
    ``sessionize`` shape).  The classic uses: dedup retry-inflated event
    spans, merge crawl-visit windows before sessionizing, coalesce span
    annotations after substring dedup."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        islands = merge_interval_rows(
            g[start_col].to_numpy(dtype=np.int64),
            g[end_col].to_numpy(dtype=np.int64))
        out = pd.DataFrame(islands, columns=[start_col, end_col,
                                             "n_intervals"]).astype("int64")
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    from .aggregate import bucketed_map_groups

    return bucketed_map_groups(ds.select_columns(
        [key_col, start_col, end_col]), key_col, fold)


def transition_counts(ds, key_col: str, order_cols, type_col: str,
                      n_buckets: int = 32):
    """Markov transition-matrix counts over per-key ordered event streams:
    for each key, sort its events by ``order_cols`` and count adjacent
    (from_type, to_type) pairs; return corpus-wide (from_type, to_type, n).
    The LAG() OVER (PARTITION BY key ORDER BY ...) bigram — the statistic
    behind next-event prediction, user-journey graphs, and anomaly scores.

    Plan: ONE bucketed exchange on the key (key-complete buckets), then a
    fully vectorized in-bucket fold — sort by (key, order), shift, mask
    rows where the key changes, pyarrow group-count the surviving pairs.
    The per-bucket partials are at most |types|^2 rows, so the final
    combine is a second tiny bucketed exchange on the pair."""
    from .aggregate import bucketed_fold

    if isinstance(order_cols, str):
        order_cols = [order_cols]
    cols = [key_col, *order_cols, type_col]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        if len(g) < 2:
            return pd.DataFrame({"from_type": pd.Series([], dtype=object),
                                 "to_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        keys = g[key_col].to_numpy()
        types = g[type_col].to_numpy()
        same = keys[1:] == keys[:-1]
        pairs = pd.DataFrame({"from_type": types[:-1][same],
                              "to_type": types[1:][same]})
        out = (pairs.groupby(["from_type", "to_type"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    partials = bucketed_fold(ds.select_columns(cols), key_col, fold,
                             n_buckets=n_buckets)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["from_type", "to_type"], sort=False)["n"]
               .sum().reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    return bucketed_fold(partials, ["from_type", "to_type"], combine,
                         n_buckets=min(n_buckets, 8))


def window_dedup(ds, key_cols, ts_col: str, id_col: str,
                 min_gap_s: int, n_buckets: int = 32):
    """Burst deduplication over an event log: within each key tuple
    (e.g. user_id + event_type), DROP a row when it arrives less than
    ``min_gap_s`` seconds after its predecessor in (ts, id) order — the
    standard retry/double-fire suppression for clickstreams and crawler
    fetch logs.  LAG semantics (gap measured to the previous RAW row, not
    the previous kept row), so the result is exactly SQL-replayable:
    keep iff prev_ts IS NULL OR ts - prev_ts >= min_gap_s.

    ONE bucketed exchange on the key tuple; the in-bucket fold is one
    vectorized sort + shift + mask (no per-group Python).  Returns the
    kept rows' (key..., id) columns."""
    from .aggregate import bucketed_fold

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = [*key_cols, ts_col, id_col]
    gap_us = int(min_gap_s) * 1_000_000

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*key_cols, ts_col, id_col], kind="mergesort")
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
        same = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            prev_same = np.ones(len(g) - 1, dtype=bool)
            for k in key_cols:
                kv = g[k].to_numpy()
                prev_same &= kv[1:] == kv[:-1]
            keep_tail = ~prev_same | (us[1:] - us[:-1] >= gap_us)
            same[1:] = keep_tail
        return g.loc[same, [*key_cols, id_col]]

    return bucketed_fold(ds.select_columns(cols), key_cols, fold,
                         n_buckets=n_buckets)


def value_ranks(ds, key_col: str, value_col: str, carry_cols=(),
                n_buckets: int = 32):
    """RANK() and DENSE_RANK() per key ordered by a (tie-prone) value —
    the two window functions ``rank_features`` cannot express (it
    requires a unique total order; these are DEFINED by ties).  One
    bucketed exchange on the key; the in-bucket fold is fully vectorized
    (sort + run-boundary masks + cumulative maxima — no per-group
    Python).  Returns (key, value, *carry, rnk, drnk)."""
    from .aggregate import bucketed_fold

    carry_cols = list(carry_cols)
    cols = [key_col, value_col, *carry_cols]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, value_col], kind="mergesort")
        n = len(g)
        if n == 0:
            out = g.copy()
            out["rnk"] = pd.Series([], dtype="int64")
            out["drnk"] = pd.Series([], dtype="int64")
            return out
        keys = g[key_col].to_numpy()
        vals = g[value_col].to_numpy()
        idx = np.arange(n, dtype=np.int64)
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        new_run = new_key | np.r_[True, vals[1:] != vals[:-1]]
        key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        rn = idx - key_start + 1
        runs = np.cumsum(new_run)
        out = g.copy()
        out["rnk"] = rn[run_start]
        out["drnk"] = runs - runs[key_start] + 1
        return out

    return bucketed_fold(ds.select_columns(cols), key_col, fold,
                         n_buckets=n_buckets)


def fill_forward(ds, key_col: str, order_cols, value_col: str,
                 n_buckets: int = 32):
    """Per-key forward fill (gap fill): each row's ``value_col`` becomes
    the last NON-NULL value at or before it in ``order_cols`` order —
    SQL ``LAST_VALUE(x IGNORE NULLS) OVER (PARTITION BY key ORDER BY ...
    ROWS UNBOUNDED PRECEDING)``.  Rows before a key's first non-null
    stay null.  The time-series gap-fill / as-of-state primitive.

    One bucketed exchange on the key; the in-bucket fold is one
    vectorized pandas ``groupby().ffill()`` over the sorted bucket — no
    per-group Python.  Values pass through unchanged (no arithmetic), so
    float columns stay bit-identical to their source."""
    from .aggregate import bucketed_fold

    order_cols = [order_cols] if isinstance(order_cols, str) \
        else list(order_cols)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort")
        g[value_col] = g.groupby(key_col, sort=False)[value_col].ffill()
        return g

    return bucketed_fold(ds, key_col, fold, n_buckets=n_buckets)


def time_weighted_stats(ds, key_col: str, ts_col: str, value_col: str,
                        id_col: str, scale: int = 100):
    """TIME-WEIGHTED average inputs per key (the irregular-sample /
    telemetry aggregate: a value holds until the next observation):
    integer numerator ``twa_num = sum(v_e * dt)`` and denominator
    ``twa_den = last_ts - first_ts`` in seconds, with ``v_e =
    round(value * scale)`` — the division happens at the consumer, so
    nothing float crosses engines.  Keys with fewer than 2 events have no
    time span and are dropped.

    Tie handling: rows are totally ordered by (ts, id) on BOTH engines —
    among same-timestamp rows only the last one's value spans to the next
    distinct timestamp, so the tiebreak id makes the result exact, not
    order-lucky.  One bucketed exchange, vectorized per-key diff fold."""
    import pandas as pd

    from .aggregate import bucketed_fold

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "__sec", id_col], kind="mergesort")
        out = []
        for key, grp in g.groupby(key_col, sort=False):
            if len(grp) < 2:
                continue
            sec = grp["__sec"].to_numpy()
            v = grp["__v"].to_numpy()
            dt = sec[1:] - sec[:-1]
            out.append({key_col: key, "n_events": len(grp),
                        "twa_num": int((v[:-1] * dt).sum()),
                        "twa_den": int(sec[-1] - sec[0])})
        if not out:
            return pd.DataFrame({key_col: pd.Series(dtype=g[key_col].dtype),
                                 "n_events": pd.Series(dtype="int64"),
                                 "twa_num": pd.Series(dtype="int64"),
                                 "twa_den": pd.Series(dtype="int64")})
        return pd.DataFrame(out)

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        raw = t.column(ts_col)
        if pa.types.is_timestamp(raw.type):
            sec = pc.cast(pc.floor(pc.divide(
                pc.cast(raw, pa.int64()), 1_000_000)), pa.int64()) \
                if raw.type.unit == "us" else pc.cast(raw, pa.int64())
        else:
            sec = pc.cast(raw, pa.int64())
        v = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column(value_col), pa.float64()),
            pa.scalar(float(scale)))), pa.int64())
        return pa.table({key_col: t.column(key_col),
                         id_col: t.column(id_col),
                         "__sec": sec, "__v": v})

    prepped = ds.select_columns(
        [key_col, id_col, ts_col, value_col]
    ).map_batches(prep, batch_format="pyarrow")
    return bucketed_fold(prepped, key_col, fold)


def rolling_distinct(ds, ts_col: str, user_col: str, window_days: int = 7):
    """Rolling DISTINCT-user count (the WAU/MAU telemetry aggregate): for
    every day T, how many distinct users had an event in the trailing
    ``window_days`` window [T-W+1, T].  Exact, not sketched.

    Distinct counts don't decompose over windows, so the classic exact
    plan: (1) row-local DISTINCT (user, day) partials (per-batch
    drop_duplicates — the wire carries at most users x active-days rows);
    (2) each pair explodes into the W target days it contributes to
    (x W, but over the already-distinct pairs); (3) ONE bucketed exchange
    on the target day, per-day vectorized nunique.  A hot day is bounded
    at its own reducer.  Days near the data's end report genuinely
    partial trailing windows (T ranges to max_day + W - 1); slice at the
    consumer if you only want fully-covered days."""
    import pandas as pd
    import pyarrow.compute as pc

    from .aggregate import bucketed_fold

    def prep(t: pa.Table) -> pa.Table:
        raw = t.column(ts_col)
        if pa.types.is_timestamp(raw.type):
            us = pc.cast(raw, pa.int64())
            day = pc.divide(us, 86_400_000_000)
        else:
            day = pc.divide(pc.cast(raw, pa.int64()), 86_400)
        base = pa.table({user_col: t.column(user_col),
                         "day": pc.cast(day, pa.int64())})
        df = base.to_pandas().drop_duplicates()
        reps = pd.DataFrame({
            user_col: np.repeat(df[user_col].to_numpy(), window_days),
            "day": (np.repeat(df["day"].to_numpy(), window_days)
                    + np.tile(np.arange(window_days, dtype=np.int64),
                              len(df))),
        }).drop_duplicates()
        return pa.Table.from_pandas(reps, preserve_index=False)

    exploded = ds.select_columns([user_col, ts_col]).map_batches(
        prep, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.drop_duplicates()
               .groupby("day", sort=False)[user_col].nunique()
               .rename("n_users").reset_index())
        agg["n_users"] = agg["n_users"].astype("int64")
        return agg

    return bucketed_fold(exploded, "day", fold)


def _count_inversions(values: np.ndarray) -> int:
    """Mergesort inversion count: pairs (i < j) with values[i] >
    values[j] (strict — ties are concordant), O(n log n).  Iterative
    bottom-up merge so a long key costs no Python recursion."""
    a = np.asarray(values)
    n = len(a)
    inv = 0
    width = 1
    a = a.copy()
    buf = np.empty_like(a)
    while width < n:
        for lo in range(0, n, 2 * width):
            mid = min(lo + width, n)
            hi = min(lo + 2 * width, n)
            if mid == hi:
                buf[lo:hi] = a[lo:hi]    # lone run: carry into the swap buffer
                continue
            # count cross inversions: left[i] > right[j]
            left, right = a[lo:mid], a[mid:hi]
            # for each right element, how many left elements exceed it
            pos = np.searchsorted(left, right, side="right")
            inv += int((len(left) - pos).sum())
            merged = np.concatenate([left, right])
            merged.sort(kind="mergesort")
            buf[lo:hi] = merged
        a, buf = buf, a
        width *= 2
    return inv


def inversion_counts(ds, key_col: str, order_cols, value_col: str):
    """Per-key INVERSION COUNT between the ordering ``order_cols`` (a
    total order — include a unique id tie-break) and ``value_col``: the
    number of pairs i < j (in order) with value_i > value_j — the Kendall
    tau-a numerator's discordant half, integer-exact (values are only
    COMPARED, never added, so float value columns are safe).  Zero means
    monotone non-decreasing; n(n-1)/2 means strictly reversed — the
    rank-disorder statistic for "does engagement decay over a session".

    One bucketed shuffle on the key; per-key sorted numpy mergesort
    count, O(n log n) in the key's own rows.  Returns (key, n_rows,
    n_inversions)."""
    import pandas as pd

    from .aggregate import bucketed_map_groups

    if isinstance(order_cols, str):
        order_cols = [order_cols]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort")
        vals = g[value_col].to_numpy()
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "n_rows": np.array([len(g)], np.int64),
            "n_inversions": np.array([_count_inversions(vals)], np.int64),
        })

    return bucketed_map_groups(ds, key_col, fold)


def nearest_event_join(ds, key_col: str, ts_col: str, type_col: str,
                       left_type: str, right_type: str,
                       id_col: str = "event_id", n_buckets: int = 32):
    """BIDIRECTIONAL as-of join within a stream: for every ``left_type``
    event, the NEAREST ``right_type`` event of the same key in either
    time direction (asof joins look only backward; sensor alignment and
    cause-attribution want the closer of before/after).  Deterministic
    tie policy: equal distance -> the EARLIER right event; equal
    timestamp rights -> the smallest id.

    One bucketed shuffle of only the two event types' thin rows; per-key
    sorted searchsorted fold, O(n log n).  Left events whose key has no
    right events drop out (inner semantics).  Returns (key, event_id,
    nearest_id, delta_us) with delta_us = left_ts - right_ts (signed
    microseconds)."""
    import pandas as pd
    import pyarrow.compute as _pc

    from .aggregate import bucketed_map_groups

    def prep(t: pa.Table) -> pa.Table:
        m = _pc.is_in(t.column(type_col),
                      value_set=pa.array([left_type, right_type]))
        return t.filter(m)

    thin = ds.select_columns([key_col, ts_col, type_col, id_col]) \
        .map_batches(prep, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        lefts = g[g[type_col] == left_type]
        rights = g[g[type_col] == right_type] \
            .sort_values([ts_col, id_col], kind="mergesort")
        empty = pd.DataFrame({
            key_col: pd.Series(dtype=g[key_col].dtype),
            id_col: pd.Series(dtype="int64"),
            "nearest_id": pd.Series(dtype="int64"),
            "delta_us": pd.Series(dtype="int64")})
        if len(lefts) == 0 or len(rights) == 0:
            return empty
        r_ts = rights[ts_col].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        r_id = rights[id_col].to_numpy(dtype=np.int64)
        l_ts = lefts[ts_col].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        idx = np.searchsorted(r_ts, l_ts, side="left")
        prev = np.clip(idx - 1, 0, len(r_ts) - 1)
        nxt = np.clip(idx, 0, len(r_ts) - 1)
        d_prev = np.abs(l_ts - r_ts[prev])
        d_next = np.abs(r_ts[nxt] - l_ts)
        # no previous right exists when idx == 0; no next when idx == len
        d_prev = np.where(idx == 0, np.iinfo(np.int64).max, d_prev)
        d_next = np.where(idx == len(r_ts), np.iinfo(np.int64).max, d_next)
        # tie -> earlier right event (prev)
        pick_prev = d_prev <= d_next
        chosen = np.where(pick_prev, prev, nxt)
        return pd.DataFrame({
            key_col: lefts[key_col].to_numpy(),
            id_col: lefts[id_col].to_numpy(dtype=np.int64),
            "nearest_id": r_id[chosen],
            "delta_us": l_ts - r_ts[chosen],
        })

    return bucketed_map_groups(thin, key_col, fold)


def scd2_history(ds, key_col: str, ts_col: str, state_col: str,
                 id_col: str = "event_id"):
    """Build the SCD TYPE-2 history table from an event stream: per key,
    consecutive equal states collapse into one validity interval
    (valid_from = first event's ts, valid_to = next interval's
    valid_from, -1 sentinel + is_current=1 for the open tail) — the
    warehouse dimension-versioning op, and the inverse of
    ``fill_forward``.

    One bucketed shuffle on the key; per-key sorted gaps-and-islands
    fold ((ts, id) total order so same-timestamp ties are exact).
    Returns (key, state, valid_from_us, valid_to_us, n_events,
    is_current)."""
    import pandas as pd

    from .aggregate import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        st = g[state_col].to_numpy()
        new_run = np.ones(len(g), dtype=bool)
        new_run[1:] = st[1:] != st[:-1]
        run_id = np.cumsum(new_run)
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({state_col: st, "run": run_id, "us": us})
        runs = df.groupby("run", sort=True).agg(
            state=(state_col, "first"), valid_from_us=("us", "min"),
            n_events=("us", "size")).reset_index(drop=True)
        runs["valid_to_us"] = runs["valid_from_us"].shift(-1) \
            .fillna(-1).astype("int64")
        runs["is_current"] = np.where(
            runs["valid_to_us"] == -1, 1, 0).astype("int64")
        runs.insert(0, key_col, g[key_col].iloc[0])
        runs["n_events"] = runs["n_events"].astype("int64")
        return runs[[key_col, "state", "valid_from_us", "valid_to_us",
                     "n_events", "is_current"]]

    thin = ds.select_columns([key_col, ts_col, state_col, id_col])
    return bucketed_map_groups(thin, key_col, fold)


def rrf_fuse(rank_tables, id_col: str = "id", rank_col: str = "rank",
             k_const: int = 60, scale: int = 10**6, n_buckets: int = 16):
    """Reciprocal-rank fusion of N ranked lists (Cormack & Clarke's RRF
    — the standard hybrid-search combiner for lexical + vector
    retrieval): fused score = Σ_lists 1/(k + rank), computed in FIXED
    POINT as ``scale // (k_const + rank)`` so the sum is an exact
    integer — order-independent, hash-replayable, and rank-identical to
    the float formula for any corpus smaller than ``scale`` ranks.

    Input: Datasets of (id, rank) with rank 1-based; a document absent
    from a list simply contributes nothing (standard RRF).  Plan: each
    list maps row-locally to integer contributions, one union, ONE
    id-bucketed pre-aggregated sum — returns (id, rrf_q, n_lists)."""
    from .aggregate import pre_aggregated_sum

    def to_contrib(t: pa.Table) -> pa.Table:
        r = np.asarray(pc.cast(t.column(rank_col), pa.int64()))
        return pa.table({
            id_col: t.column(id_col),
            "contrib": pa.array(scale // (k_const + r), pa.int64())})

    parts = [t.map_batches(to_contrib, batch_format="pyarrow")
             for t in rank_tables]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    s = pre_aggregated_sum(u, id_col, "contrib", n_buckets=n_buckets)
    return s.map_batches(
        lambda t: pa.table({id_col: t.column(id_col),
                            "rrf_q": t.column("sum_contrib"),
                            "n_lists": t.column("n_rows")}),
        batch_format="pyarrow")


def scd2_lookup(probes, history, key_col: str, ts_col: str, id_col: str,
                state_col: str = "state",
                valid_from: str = "valid_from_us",
                valid_to: str = "valid_to_us",
                missing: str = "__none__", n_buckets: int = 32):
    """Point-in-time dimension lookup against an SCD Type-2 history: for
    every probe (key, ts) return the state whose validity interval
    covers ts (``valid_from <= ts < valid_to``; -1 = open tail) — the
    warehouse "as of" join ``fill_forward`` cannot express when the
    state table and the probe stream are DIFFERENT datasets.  Probes
    before the key's first interval (or inside a gap, for non-contiguous
    histories) get ``missing``.

    Both timestamp columns are int64 microseconds.  Plan: union-tag the
    thin projections, ONE key-bucketed exchange, per-key vectorized
    searchsorted fold.  Empty intervals (valid_from == valid_to, from
    same-timestamp state flaps) sort BEFORE their covering sibling and
    are skipped by the right-edge searchsorted, matching the SQL
    interval predicate."""
    from .aggregate import bucketed_map_groups

    INF = np.int64(2**62)

    def tag_hist(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            key_col: t.column(key_col),
            "us": pc.cast(t.column(valid_from), pa.int64()),
            "to": pc.cast(t.column(valid_to), pa.int64()),
            state_col: t.column(state_col),
            id_col: pa.array(np.full(n, -1, np.int64), pa.int64()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
        })

    def tag_probe(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            key_col: t.column(key_col),
            "us": pc.cast(t.column(ts_col), pa.int64()),
            "to": pa.array(np.zeros(n, np.int64), pa.int64()),
            state_col: pa.nulls(n, pa.string()),
            id_col: pc.cast(t.column(id_col), pa.int64()),
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
        })

    tagged = history.select_columns(
        [key_col, valid_from, valid_to, state_col]).map_batches(
        tag_hist, batch_format="pyarrow").union(
        probes.select_columns([key_col, ts_col, id_col]).map_batches(
            tag_probe, batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        h = g[g["side"] == 0].copy()
        p = g[g["side"] == 1]
        out = pd.DataFrame({
            id_col: p[id_col].to_numpy().astype(np.int64),
            key_col: p[key_col],
            "us": p["us"].to_numpy().astype(np.int64)})
        if h.empty:
            out[state_col] = missing
            return out.sort_values(id_col)
        to = h["to"].to_numpy().astype(np.int64)
        h["_to_inf"] = np.where(to == -1, INF, to)
        h = h.sort_values(["us", "_to_inf"], kind="mergesort")
        hus = h["us"].to_numpy().astype(np.int64)
        hto = h["_to_inf"].to_numpy().astype(np.int64)
        hstate = h[state_col].to_numpy()
        idx = np.searchsorted(hus, out["us"].to_numpy(), side="right") - 1
        ok = idx >= 0
        safe = np.maximum(idx, 0)
        covered = ok & (out["us"].to_numpy() < hto[safe])
        out[state_col] = np.where(covered, hstate[safe], missing)
        return out.sort_values(id_col)

    return bucketed_map_groups(tagged, key_col, fold,
                               n_buckets=n_buckets)


def running_distinct(ds, key_col: str, order_cols, value_col: str,
                     id_col: str = None, n_buckets: int = 32):
    """Per-key RUNNING DISTINCT COUNT ordered by ``order_cols``: after
    each event, how many distinct values the key has seen so far — the
    catalog-growth / unique-pages-per-host-over-time curve.  The window
    form engines refuse (COUNT(DISTINCT) OVER is unsupported SQL almost
    everywhere); the replay is SUM() OVER a first-occurrence flag.

    One bucketed shuffle on the key; per-key sorted vectorized
    ``duplicated`` + cumsum fold.  ``order_cols`` must totally order
    each key's rows (append an id tie-break)."""
    from .aggregate import bucketed_map_groups

    if isinstance(order_cols, str):
        order_cols = [order_cols]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_cols), kind="mergesort").copy()
        first = (~g.duplicated(value_col)).astype(np.int64)
        g["n_distinct_so_far"] = first.cumsum()
        return g

    cols = [key_col, value_col] + list(order_cols) + \
        ([id_col] if id_col and id_col not in order_cols else [])
    return bucketed_map_groups(ds.select_columns(list(dict.fromkeys(cols))),
                               key_col, fold, n_buckets=n_buckets)


def streaks(ds, key_col: str, value_col: str, n_buckets: int = 32):
    """Gaps-and-islands per key over an INTEGER value column (active
    days, sequence numbers): distinct values are grouped into maximal
    runs of consecutive integers; returns per key the distinct-value
    count, the number of runs, and the longest run — the
    engagement-streak / sequence-integrity statistic (n_runs > 1 means
    gaps; max_streak is the longest unbroken stretch).

    One key-bucketed exchange of thin (key, value) pairs; whole-bucket
    vectorized fold: sort, drop_duplicates, then the value - rank trick
    (consecutive values share value - cumcount, the SQL
    DENSE_RANK-difference replay) — no per-key Python loop."""
    from .aggregate import bucketed_fold

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[key_col, value_col]].drop_duplicates() \
            .sort_values([key_col, value_col], kind="mergesort")
        grp = g.groupby(key_col, sort=False)
        island = g[value_col].to_numpy(np.int64) \
            - grp.cumcount().to_numpy(np.int64)
        runs = g.assign(__island=island).groupby(
            [key_col, "__island"], sort=False).size().reset_index(name="ln")
        out = runs.groupby(key_col, sort=False).agg(
            n_values=("ln", "sum"), n_streaks=("ln", "size"),
            max_streak=("ln", "max")).reset_index()
        for c in ("n_values", "n_streaks", "max_streak"):
            out[c] = out[c].astype("int64")
        return out

    return bucketed_fold(ds.select_columns([key_col, value_col]),
                         key_col, fold, n_buckets=n_buckets)


def ntile_cume(ds, key_col: str, order_col: str, n_tiles: int = 4,
               n_buckets: int = 32):
    """NTILE(n) and CUME_DIST per key ordered by a UNIQUE order column —
    the quantile-bucket / percentile-position window pair (``NTILE(n)
    OVER (PARTITION BY key ORDER BY v)`` and ``CUME_DIST() OVER ...``).
    CUME_DIST is emitted as exact INTEGER sufficient statistics
    (``cume_num`` = rows with value <= current, ``cume_den`` = partition
    size): the ratio is a float, the numerator/denominator pair is
    hash-exact.  ``order_col`` must be unique per key (SQL's NTILE is
    nondeterministic under ties; requiring a total order keeps both
    engines bit-identical).

    One bucketed exchange on the key; in-bucket fold fully vectorized
    (sort + per-key position arithmetic; NTILE's uneven-split rule —
    first ``n_rows %% n`` tiles get the extra row — replayed with
    integer division, no per-group Python).  Returns
    (key, order_col, tile, cume_num, cume_den)."""
    from .aggregate import bucketed_fold

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, order_col], kind="mergesort")
        n = len(g)
        if n == 0:
            out = g.copy()
            for c in ("tile", "cume_num", "cume_den"):
                out[c] = pd.Series([], dtype="int64")
            return out
        keys = g[key_col].to_numpy()
        idx = np.arange(n, dtype=np.int64)
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        key_start = np.maximum.accumulate(np.where(new_key, idx, 0))
        pos = idx - key_start                      # 0-based within key
        starts = idx[new_key]
        sizes = np.diff(np.r_[starts, n])
        size_of = np.repeat(sizes, sizes)          # partition size per row
        # NTILE: first (size % n) tiles have ceil(size/n) rows
        base = size_of // n_tiles
        extra = size_of % n_tiles
        cut = extra * (base + 1)                   # rows in the big tiles
        big = pos < cut
        tile = np.where(
            big,
            pos // np.maximum(base + 1, 1),
            np.where(base > 0, extra + (pos - cut) // np.maximum(base, 1),
                     0),
        ) + 1
        out = g.copy()
        out["tile"] = tile.astype("int64")
        out["cume_num"] = (pos + 1).astype("int64")
        out["cume_den"] = size_of.astype("int64")
        return out

    return bucketed_fold(ds.select_columns([key_col, order_col]),
                         key_col, fold, n_buckets=n_buckets)
