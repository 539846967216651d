"""Streaming-shaped operators over the ordered events log (ray_guide
"Streaming-shaped workloads"): tumbling / sliding windows and gap-based
sessionization, all expressed as grouped computation over epoch buckets or
per-key sorted folds.  Ordering assumption: events are processed per key,
sorted by ``ts`` inside each group; groups themselves are unordered.
"""

from __future__ import annotations

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
