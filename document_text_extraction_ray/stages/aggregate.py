"""Aggregation-at-scale helpers (ray_guide "Aggregation at scale"):
partial pre-aggregation before the shuffle, and hot-key salting.

A bare ``groupby(key).aggregate(...)`` shuffles every row.  These helpers
shrink the exchange:
  * ``pre_aggregated_sum`` — combine per batch first (one row per key per
    batch crosses the wire), then reduce the small partials;
  * ``salted_sum`` — skewed hot keys are split into ``n_salt`` sub-keys so
    no single reducer drowns, then a second tiny reduce folds the salt out.

Both are exactly equal to the naive aggregate (tests assert it) — they are
physical-plan rewrites, not approximations.
"""

from __future__ import annotations

import zlib

import pandas as pd
from ray.data.aggregate import Count, Sum


def pre_aggregated_sum(ds, key: str, value: str):
    """groupby(key) -> (sum(value), count) with per-batch partial combine.

    The shuffle moves at most (distinct keys per batch) rows per batch
    instead of every row."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(key, sort=False)[value].agg(["sum", "count"]).reset_index()
        return g.rename(columns={"sum": "partial_sum", "count": "partial_count"})

    partials = ds.select_columns([key, value]).map_batches(
        partial, batch_format="pandas"
    )
    return partials.groupby(key).aggregate(
        Sum("partial_sum", alias_name=f"sum_{value}"),
        Sum("partial_count", alias_name="n_rows"),
    )


def salted_sum(ds, key: str, value: str, hot_keys, n_salt: int = 8):
    """groupby(key) -> sum(value) with hot keys split across ``n_salt``
    sub-reducers (salt = crc32(row value) — deterministic, data-derived, no
    RNG).  Stage 1 reduces (key, salt) groups; stage 2 folds salts out.
    The second shuffle is tiny: |keys| + |hot| * n_salt rows."""
    hot = frozenset(hot_keys)

    def add_salt(batch: pd.DataFrame) -> pd.DataFrame:
        def salt_of(row_key, row_val):
            if row_key in hot:
                return zlib.crc32(repr(row_val).encode()) % n_salt
            return 0

        batch = batch[[key, value]].copy()
        batch["__salt"] = [
            salt_of(k, v) for k, v in zip(batch[key], batch[value])
        ]
        return batch

    salted = ds.map_batches(add_salt, batch_format="pandas")
    stage1 = salted.groupby([key, "__salt"]).aggregate(
        Sum(value, alias_name="partial_sum"),
        Count(alias_name="partial_count"),
    )
    return stage1.groupby(key).aggregate(
        Sum("partial_sum", alias_name=f"sum_{value}"),
        Sum("partial_count", alias_name="n_rows"),
    )
