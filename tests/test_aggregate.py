"""Partial pre-aggregation and hot-key salting equal the naive aggregate."""

import numpy as np
import ray.data
from ray.data.aggregate import Count, Sum

from document_text_extraction_ray.stages.aggregate import (
    pre_aggregated_sum,
    salted_sum,
)


def _skewed(n=5000):
    # key 0 holds ~80% of rows (hot); keys 1..9 share the rest.
    rng = np.random.RandomState(7)
    keys = np.where(rng.rand(n) < 0.8, 0, rng.randint(1, 10, size=n))
    vals = rng.rand(n).round(6)
    return ray.data.from_items(
        [{"k": int(k), "v": float(v)} for k, v in zip(keys, vals)]
    )


def _naive(ds):
    df = (
        ds.groupby("k")
        .aggregate(Sum("v", alias_name="sum_v"), Count(alias_name="n_rows"))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    return df


def test_pre_aggregated_sum_equals_naive():
    ds = _skewed()
    ref = _naive(ds)
    got = pre_aggregated_sum(ds, "k", "v").to_pandas().sort_values("k").reset_index(drop=True)
    assert got["n_rows"].tolist() == ref["n_rows"].tolist()
    assert np.allclose(got["sum_v"], ref["sum_v"])


def test_salted_sum_equals_naive():
    ds = _skewed()
    ref = _naive(ds)
    got = salted_sum(ds, "k", "v", hot_keys={0}, n_salt=8).to_pandas()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["n_rows"].tolist() == ref["n_rows"].tolist()
    assert np.allclose(got["sum_v"], ref["sum_v"])
