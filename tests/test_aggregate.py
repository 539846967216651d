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


def test_distinct_counts_exact_vs_approx():
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        approx_distinct_count,
        exact_distinct_count,
    )

    rng = np.random.RandomState(3)
    rows = [{"g": ["a", "b"][i % 2], "v": int(rng.randint(0, 2000))}
            for i in range(20000)]
    ds = rd.from_items(rows)
    exact = exact_distinct_count(ds, "g", "v").to_pandas().set_index("g")["n_distinct"]
    approx = approx_distinct_count(ds, "g", "v").to_pandas().set_index("g")["approx_distinct"]
    for g in ("a", "b"):
        assert abs(approx[g] - exact[g]) / exact[g] < 0.06, (g, exact[g], approx[g])


def test_running_total():
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import running_total

    rows = [{"k": i % 2, "ord": i, "v": float(i)} for i in range(10)]
    out = running_total(rd.from_items(rows), "k", "ord", "v").to_pandas()
    k0 = out[out["k"] == 0].sort_values("ord")["running_total"].tolist()
    assert k0 == [0.0, 2.0, 6.0, 12.0, 20.0]  # cumsum of 0,2,4,6,8


def test_running_total_multi_order_no_composite_key():
    """Two-column ordering (ts, event_id) — the composite int key ts_us*2^20
    + id silently wrapped int64 for 2024-era timestamps (VERDICT r1 #1)."""
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import running_total

    # 2024 timestamps (ts_us ~1.7e15: the old composite key wrapped) with
    # duplicated ts values so the event_id tie-break is exercised.
    base = pd.Timestamp("2024-05-01 12:00:00")
    rows = []
    for i in range(40):
        rows.append({
            "event_id": 40 - i,                          # reversed ids
            "ts": base + pd.Timedelta(seconds=i // 3),   # ties every 3 rows
            "user_id": i % 4,
            "value": float(i),
        })
    df = pd.DataFrame(rows)
    out = running_total(rd.from_pandas(df), "user_id", ["ts", "event_id"],
                        "value").to_pandas()
    ref = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    ref = ref.assign(expected=ref.groupby("user_id")["value"].cumsum())
    merged = out.merge(ref[["event_id", "expected"]], on="event_id")
    assert np.allclose(merged["running_total"], merged["expected"])


def test_bucketed_combine_matches_ray_groupby_with_nulls_and_negatives():
    import pyarrow as pa

    import ray.data as rd
    from document_text_extraction_ray.stages.aggregate import (
        pre_aggregated_sum,
    )

    rows = [{"k": k, "v": float(i)} for i, k in enumerate(
        [-5, -5, 3, 3, 3, None, None, 2**60, 2**60, 0]
    )]
    ds = rd.from_arrow(pa.Table.from_pylist(
        rows, schema=pa.schema([("k", pa.int64()), ("v", pa.float64())])
    ))
    got = pre_aggregated_sum(ds, "k", "v").to_pandas()
    got = {r["k"]: (r["sum_v"], r["n_rows"]) for _, r in got.iterrows()}
    import math
    # nulls group together (pandas groupby drops them server-side is NOT
    # acceptable — pyarrow group_by keeps a null group)
    assert got[-5] == (1.0, 2)
    assert got[3] == (9.0, 3)
    assert got[2**60] == (15.0, 2)
    assert got[0] == (9.0, 1)
    null_keys = [k for k in got if k is None or (isinstance(k, float) and math.isnan(k))]
    assert len(null_keys) == 1
    assert got[null_keys[0]] == (11.0, 2)


def test_bucketed_map_groups_skewed_hot_key():
    import pandas as pd

    import ray.data as rd
    from document_text_extraction_ray.stages.aggregate import (
        bucketed_map_groups,
    )

    # one key holds 90% of rows; groups must still be key-complete
    rows = [{"k": "hot", "v": i} for i in range(900)]
    rows += [{"k": f"c{i}", "v": i} for i in range(100)]
    ds = rd.from_items(rows)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"k": g["k"].iloc[0], "n": len(g),
                              "s": int(g["v"].sum())}])

    out = bucketed_map_groups(ds, "k", fold).to_pandas().set_index("k")
    assert out.loc["hot", "n"] == 900
    assert out.loc["hot", "s"] == sum(range(900))
    assert len(out) == 101


def test_bucketed_map_groups_multi_key_and_string_keys():
    import pandas as pd

    import ray.data as rd
    from document_text_extraction_ray.stages.aggregate import (
        bucketed_map_groups,
    )

    rows = [{"a": f"x{i % 3}", "b": i % 2, "v": i} for i in range(60)]
    ds = rd.from_items(rows)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"a": g["a"].iloc[0], "b": g["b"].iloc[0],
                              "n": len(g)}])

    out = bucketed_map_groups(ds, ["a", "b"], fold).to_pandas()
    assert len(out) == 6
    assert set(out["n"]) == {10}


def test_bucketed_map_groups_equals_ray_groupby_randomized():
    """Equivalence on seeded random data: the bucketed exchange must return
    exactly the per-key folds Ray's key-sort groupby produces."""
    import numpy as np
    import pandas as pd

    import ray.data as rd
    from document_text_extraction_ray.stages.aggregate import (
        bucketed_map_groups,
    )

    rng = np.random.RandomState(7)
    rows = [
        {"k": int(rng.randint(-50, 50)), "v": float(rng.rand())}
        for _ in range(2000)
    ]
    ds = rd.from_items(rows)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v", kind="mergesort")
        return pd.DataFrame([{"k": g["k"].iloc[0], "n": len(g),
                              "vmin": g["v"].iloc[0], "vmax": g["v"].iloc[-1]}])

    a = (
        ds.groupby("k").map_groups(fold, batch_format="pandas")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    b = (
        bucketed_map_groups(ds, "k", fold)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_map_groups_keeps_null_key_group():
    """Null-key rows must form their own group, exactly as Ray's
    groupby(key).map_groups does (review finding: pandas dropna default
    silently dropped them)."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from document_text_extraction_ray.stages.aggregate import (
        bucketed_map_groups,
    )

    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"k": 1, "v": 1}, {"k": 1, "v": 2}, {"k": None, "v": 5}],
        schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
    ))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"k": g["k"].iloc[0], "n": len(g),
                              "s": int(g["v"].sum())}])

    out = bucketed_map_groups(ds, "k", fold).to_pandas()
    assert len(out) == 2
    nn = out[out["k"].notna()]
    assert nn["n"].iloc[0] == 2 and nn["s"].iloc[0] == 3
    null_row = out[out["k"].isna()]
    assert null_row["n"].iloc[0] == 1 and null_row["s"].iloc[0] == 5


def test_grouped_quantiles_null_key_no_crash():
    import pyarrow as pa

    import ray.data as rd
    from document_text_extraction_ray.stages.aggregate import (
        grouped_quantiles,
    )

    ds = rd.from_arrow(pa.Table.from_pylist(
        [{"g": "a", "v": 1}, {"g": "a", "v": 2}, {"g": None, "v": 5}],
        schema=pa.schema([("g", pa.string()), ("v", pa.int64())]),
    ))
    out = grouped_quantiles(ds, "g", "v").to_pandas()
    assert len(out) == 2
    assert out[out["g"].isna()]["p50"].iloc[0] == 5


def test_bucketed_fold_equals_bucketed_map_groups():
    """The whole-bucket vectorized fold and the per-group fold are the
    same operator at different granularity — same keys, same results."""
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        bucketed_fold,
        bucketed_map_groups,
    )

    rows = [{"k": f"key{i % 7}", "v": i} for i in range(100)]
    ds = rd.from_items(rows)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"k": g["k"].iloc[0], "s": int(g["v"].sum()),
                              "n": len(g)}])

    def whole_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", sort=False).agg(
            s=("v", "sum"), n=("v", "size")).reset_index()
        out["s"] = out["s"].astype(int)
        return out

    a = bucketed_map_groups(rd.from_items(rows), "k", per_group,
                            n_buckets=4).to_pandas()
    b = bucketed_fold(ds, "k", whole_bucket, n_buckets=4).to_pandas()
    a = a.sort_values("k").reset_index(drop=True)
    b = b.sort_values("k").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rank_features_matches_window_semantics():
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.windows import rank_features

    rows = [{"k": i % 3, "id": i, "v": (i * 7) % 11} for i in range(25)]
    out = (rank_features(rd.from_items(rows), "k", ["v", "id"], n_tiles=4)
           .to_pandas().sort_values(["k", "rn"]).reset_index(drop=True))
    for k, g in out.groupby("k"):
        n = len(g)
        rn = g["rn"].to_numpy()
        assert (rn == np.arange(1, n + 1)).all()
        # ordered by (v, id)
        ordered = g[["v", "id"]].values.tolist()
        assert ordered == sorted(ordered)
        assert (g["pct_rank_e6"].to_numpy()
                == (rn - 1) * 1_000_000 // max(n - 1, 1)).all()
        assert (g["cume_dist_e6"].to_numpy() == rn * 1_000_000 // n).all()
        # ANSI NTILE: first n%4 tiles one row bigger, sizes differ by <=1
        sizes = g.groupby("tile").size()
        assert sizes.max() - sizes.min() <= 1
        assert g["tile"].is_monotonic_increasing


def test_pivot_counts_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import pivot_counts

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": rng.randint(0, 6, 200),
        "cat": rng.choice(["a", "b", "c"], 200),
        "val": rng.uniform(-5, 50, 200).round(2),
    })
    out = (pivot_counts(rd.from_pandas(df), "k", "cat", ["a", "b"],
                        value_col="val", n_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for cat in ["a", "b"]:
        sub = df[df["cat"] == cat]
        exp_n = sub.groupby("k").size().reindex(out["k"], fill_value=0)
        assert (out[f"n_{cat}"].to_numpy() == exp_n.to_numpy()).all()
        cents = np.where(sub["val"] >= 0, np.floor(sub["val"] * 100 + 0.5),
                         np.ceil(sub["val"] * 100 - 0.5)).astype(np.int64)
        exp_s = (pd.Series(cents, index=sub.index).groupby(sub["k"]).sum()
                 .reindex(out["k"], fill_value=0))
        assert (out[f"sum_{cat}_e2"].to_numpy() == exp_s.to_numpy()).all()
    # category 'c' ignored: no n_c column
    assert "n_c" not in out.columns


def test_histogram_quantiles_within_bin_width():
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        grouped_quantiles,
        histogram_quantiles,
    )

    rng = np.random.RandomState(11)
    rows = [{"k": int(i % 4), "v": float(x)}
            for i, x in enumerate(rng.gamma(2.0, 10.0, 4000))]
    ds = rd.from_items(rows)
    approx = (histogram_quantiles(ds, "k", "v", ps=(0.5, 0.9), n_bins=512)
              .to_pandas().set_index("k").sort_index())
    exact = (grouped_quantiles(ds, "k", "v", ps=(0.5, 0.9))
             .to_pandas().set_index("k").sort_index())
    vmax = max(r["v"] for r in rows)
    vmin = min(r["v"] for r in rows)
    w = (vmax - vmin) / 512
    for k in range(4):
        assert abs(approx.loc[k, "hq50"] - exact.loc[k, "p50"]) <= w + 1e-9
        assert abs(approx.loc[k, "hq90"] - exact.loc[k, "p90"]) <= w + 1e-9
        assert approx.loc[k, "n_rows"] == exact.loc[k, "n_rows"] == 1000


def test_heavy_hitters_exact_when_k_exceeds_vocab():
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import heavy_hitters

    rows = [{"w": f"w{i % 7}"} for i in range(700)]
    out = (heavy_hitters(rd.from_items(rows), "w", k=16)
           .to_pandas().sort_values("w").reset_index(drop=True))
    assert len(out) == 7
    assert (out["est"] == 100).all()
    assert (out["n_total"] == 700).all()


def test_heavy_hitters_zipf_bound():
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import heavy_hitters

    rng = np.random.RandomState(5)
    words = [f"t{z}" for z in rng.zipf(1.5, 20000) if z < 5000]
    n = len(words)
    k = 64
    out = (heavy_hitters(rd.from_items([{"w": w} for w in words]), "w", k=k)
           .to_pandas().set_index("w"))
    import collections

    true = collections.Counter(words)
    bound = 2 * n / (k + 1)
    assert int(out["n_total"].iloc[0]) == n
    for w, est in out["est"].items():
        assert 0 < est <= true[w]
        assert true[w] - est <= bound + 1e-9
    # every value heavier than the bound must survive the sketch
    for w, c in true.items():
        if c > bound:
            assert w in out.index


def test_heavy_hitters_int_values():
    """Non-string value columns keep their type end-to-end (ADVICE r3)."""
    from document_text_extraction_ray.stages.aggregate import heavy_hitters

    ids = [7] * 50 + [8] * 30 + list(range(100, 110))
    out = (heavy_hitters(ray.data.from_items([{"uid": i} for i in ids]), "uid",
                         k=64).to_pandas())
    assert out["uid"].dtype == np.int64 or str(out["uid"].dtype) == "int64"
    got = dict(zip(out["uid"], out["est"]))
    assert got[7] == 50 and got[8] == 30
    assert int(out["n_total"].iloc[0]) == len(ids)


def test_grouped_concat_max_items_bounds_hot_key():
    """A hot key (one user, 10k events) produces a BOUNDED row under
    max_items while n reports the true count (VERDICT r3 #5)."""
    from document_text_extraction_ray.stages.aggregate import grouped_concat

    rows = [{"u": 1, "e": f"e{i:05d}", "t": i} for i in range(10_000)]
    rows += [{"u": 2, "e": f"x{i}", "t": i} for i in range(3)]
    ds = ray.data.from_items(rows).repartition(8)
    out = grouped_concat(ds, "u", "e", ["t"], max_items=16).to_pandas() \
        .set_index("u")
    assert out.loc[1, "n"] == 10_000
    seq1 = out.loc[1, "seq"].split("|")
    assert seq1 == [f"e{i:05d}" for i in range(16)]  # first 16 in order
    assert out.loc[2, "seq"] == "x0|x1|x2" and out.loc[2, "n"] == 3
    # uncapped path unchanged
    full = grouped_concat(ds, "u", "e", ["t"]).to_pandas().set_index("u")
    assert full.loc[2, "seq"] == "x0|x1|x2"
    assert len(full.loc[1, "seq"].split("|")) == 10_000


def test_cube_sum_matches_pandas_cube():
    from itertools import combinations

    from document_text_extraction_ray.stages.aggregate import cube_sum

    rows = [{"a": f"a{i % 2}", "b": f"b{i % 3}", "v": i} for i in range(60)]
    out = cube_sum(ray.data.from_items(rows), ["a", "b"], "v").to_pandas()
    import pandas as pd
    df = pd.DataFrame(rows)
    # 4 levels for 2 keys: (a,b), (a,), (b,), ()
    assert len(out) == 6 + 2 + 3 + 1
    grand = out[(out["a"] == "ALL") & (out["b"] == "ALL")]
    assert int(grand["sum_v"].iloc[0]) == df["v"].sum()
    assert int(grand["n"].iloc[0]) == 60
    only_b = out[(out["a"] == "ALL") & (out["b"] != "ALL")] \
        .set_index("b")["sum_v"]
    ref_b = df.groupby("b")["v"].sum()
    assert dict(only_b) == dict(ref_b)
    fine = out[(out["a"] != "ALL") & (out["b"] != "ALL")]
    ref_f = df.groupby(["a", "b"])["v"].sum()
    assert {(r.a, r.b): r.sum_v for r in fine.itertuples()} == dict(ref_f)


def test_grouped_topk_partial_pushdown_exact():
    """Partial per-batch head(k) + bucket fold == global per-key top-k,
    regardless of how rows are sharded (semigroup property)."""
    from document_text_extraction_ray.stages.aggregate import grouped_topk

    rng = np.random.RandomState(3)
    rows = [{"k": int(rng.randint(0, 7)), "v": int(rng.randint(0, 1000)),
             "id": i} for i in range(400)]
    for parts in (2, 9):
        out = grouped_topk(ray.data.from_items(rows).repartition(parts),
                           "k", ["v", "id"], k=4,
                           ascending=[False, True]).to_pandas()
        import pandas as pd
        df = pd.DataFrame(rows).sort_values(["k", "v", "id"],
                                            ascending=[True, False, True])
        ref = df.groupby("k").head(4)
        got = out.sort_values(["k", "rnk"])
        assert list(got["id"]) == list(ref["id"])
        assert list(got.groupby("k")["rnk"].max()) == [4] * 7


# ------------------------------------------------------------ t-digest

def _rank_err(vals, est, p):
    vals = np.sort(vals)
    return abs(np.searchsorted(vals, est, side="right") / len(vals) - p)


def test_tdigest_compress_preserves_weight_and_bounds_centroids():
    from document_text_extraction_ray.stages.aggregate import tdigest_compress

    rng = np.random.RandomState(7)
    v = rng.lognormal(0.0, 1.0, 50_000)
    m, w = tdigest_compress(v, np.ones(len(v)), float(len(v)), delta=100)
    assert w.sum() == float(len(v))
    assert np.all(np.diff(m) >= 0)
    # O(delta * ln n) centroids (~460 measured), tails pinched to weight ~1
    assert len(m) <= 600
    assert w[0] <= 2 and w[-1] <= 2


def test_tdigest_accuracy_and_merge_order_invariance():
    from document_text_extraction_ray.stages.aggregate import (
        tdigest_compress, tdigest_quantile)

    rng = np.random.RandomState(11)
    v = rng.lognormal(0.0, 1.0, 40_000)
    ps = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

    # one-shot digest
    m1, w1 = tdigest_compress(v, np.ones(len(v)), float(len(v)), delta=100)
    # merged digest: 16 partial digests over chunks, re-compressed
    parts = [tdigest_compress(c, np.ones(len(c)), float(len(c)), delta=100)
             for c in np.array_split(v, 16)]
    mm = np.concatenate([p[0] for p in parts])
    mw = np.concatenate([p[1] for p in parts])
    m2, w2 = tdigest_compress(mm, mw, float(mw.sum()), delta=100)
    assert w2.sum() == float(len(v))

    for p in ps:
        assert _rank_err(v, tdigest_quantile(m1, w1, p), p) < 0.01
        assert _rank_err(v, tdigest_quantile(m2, w2, p), p) < 0.015


def test_tdigest_exact_on_tiny_groups():
    # n << delta: the size bound never allows a merge of distinct values,
    # so mid-rank interpolation reproduces order statistics exactly at
    # element ranks.
    from document_text_extraction_ray.stages.aggregate import (
        tdigest_compress, tdigest_quantile)

    v = np.array([3.0, 1.0, 2.0, 5.0, 4.0])
    m, w = tdigest_compress(v, np.ones(5), 5.0, delta=100)
    assert list(m) == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert tdigest_quantile(m, w, 0.5) == 3.0


def test_tdigest_quantiles_dataset_gate(ray_session):
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        grouped_quantiles, tdigest_quantiles)

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": np.repeat(["a", "b", "c"], 6000),
        "v": np.concatenate([rng.lognormal(0, 1, 6000),
                             rng.normal(50, 10, 6000),
                             rng.uniform(-5, 5, 6000)]),
    })
    ds = rd.from_pandas(df).repartition(8)
    approx = tdigest_quantiles(ds, "k", "v", ps=(0.25, 0.5, 0.9),
                               delta=100).to_pandas().set_index("k")
    # rank-error gate against exact order statistics at p +/- 2%
    exact = grouped_quantiles(
        ds, "k", "v",
        ps=(0.23, 0.27, 0.48, 0.52, 0.88, 0.92)).to_pandas().set_index("k")
    for k in ["a", "b", "c"]:
        assert approx.loc[k, "n_rows"] == 6000
        for p in (25, 50, 90):
            lo = exact.loc[k, f"p{p - 2}"]
            hi = exact.loc[k, f"p{p + 2}"]
            assert lo <= approx.loc[k, f"tq{p}"] <= hi, (k, p)


def test_tdigest_quantiles_ignores_nulls(ray_session):
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import tdigest_quantiles

    df = pd.DataFrame({"k": ["a"] * 6, "v": [1.0, None, 2.0, None, 3.0, 4.0]})
    out = tdigest_quantiles(rd.from_pandas(df), "k", "v",
                            ps=(0.5,)).to_pandas()
    assert int(out["n_rows"].iloc[0]) == 4
    assert 1.0 <= float(out["tq50"].iloc[0]) <= 4.0


def test_grouped_mode_tie_break(ray_session):
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import grouped_mode

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3 + ["c"],
        "v": ["x", "y", "x", "y",   "q", "p", "q",   "z"],
    })
    out = grouped_mode(rd.from_pandas(df).repartition(3), "k", "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    # a: x/y tie at 2 -> smallest value "x"; b: q wins 2-1; c: singleton
    assert list(out["mode"]) == ["x", "q", "z"]
    assert list(out["mode_n"]) == [2, 2, 1]


def test_profile_columns_counts(ray_session):
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import profile_columns

    df = pd.DataFrame({
        "a": pd.array([1, 2, 2, None, 3], dtype="Int64"),
        "b": ["x", None, "x", "y", None],
    })
    out = profile_columns(rd.from_pandas(df).repartition(3), ["a", "b"]) \
        .to_pandas().set_index("col")
    assert int(out.loc["a", "n_rows"]) == 5
    assert int(out.loc["a", "n_nulls"]) == 1
    assert int(out.loc["a", "n_distinct"]) == 3
    assert int(out.loc["b", "n_nulls"]) == 2
    assert int(out.loc["b", "n_distinct"]) == 2


def test_profile_columns_rejects_floats(ray_session):
    import pandas as pd
    import pytest
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import profile_columns

    df = pd.DataFrame({"f": [1.5, 2.5]})
    with pytest.raises(Exception):  # TypeError surfaced through Ray
        profile_columns(rd.from_pandas(df), ["f"]).to_pandas()


def test_grouping_sets_sum_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        grouping_sets_sum)

    rng = np.random.RandomState(4)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 300),
        "b": rng.choice(["p", "q", "r"], 300),
        "v": rng.randint(0, 100, 300),
    })
    out = grouping_sets_sum(
        rd.from_pandas(df).repartition(4),
        sets=[["a", "b"], ["b"], []], keys=["a", "b"], value="v").to_pandas()
    # finest level
    fin = df.groupby(["a", "b"], as_index=False)["v"].sum()
    for _, r in fin.iterrows():
        m = out[(out["a"] == r["a"]) & (out["b"] == r["b"])]
        assert int(m["sum_v"].iloc[0]) == int(r["v"])
    # (b) level wears ALL in a
    per_b = df.groupby("b")["v"].sum()
    for b, v in per_b.items():
        m = out[(out["a"] == "ALL") & (out["b"] == b)]
        assert int(m["sum_v"].iloc[0]) == int(v)
    # grand total; and NO (a)-only level was requested
    gt = out[(out["a"] == "ALL") & (out["b"] == "ALL")]
    assert int(gt["sum_v"].iloc[0]) == int(df["v"].sum())
    assert len(out[(out["b"] == "ALL") & (out["a"] != "ALL")]) == 0


def test_bloom_semi_filter_member_mode_join_pruning(ray_session):
    import pandas as pd
    import ray
    import ray.data as rd

    from document_text_extraction_ray.stages.dedup import (
        bloom_semi_filter, build_bloom)

    dim = rd.from_pandas(pd.DataFrame({"k": [2, 5, 7]}))
    fact = rd.from_pandas(pd.DataFrame({"k": list(range(100)),
                                        "v": list(range(100))}))
    bloom_ref = ray.put(build_bloom(dim, "k", m_bits=1 << 12))
    kept = bloom_semi_filter(fact, "k", bloom_ref, m_bits=1 << 12,
                             keep="member").to_pandas()
    # every true member survives (no false negatives — the join-pruning
    # contract); FPs are allowed but bounded
    assert {2, 5, 7} <= set(kept["k"])
    assert len(kept) <= 10


def test_grouped_moments_exact_vs_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import grouped_moments

    rng = np.random.RandomState(8)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 500),
        "x": rng.randint(-50, 50, 500),
        "y": rng.randint(0, 1000, 500),
    })
    out = grouped_moments(rd.from_pandas(df).repartition(5), "k", "x", "y") \
        .to_pandas().set_index("k")
    for k, sub in df.groupby("k"):
        assert int(out.loc[k, "n"]) == len(sub)
        assert int(out.loc[k, "sum_x"]) == int(sub["x"].sum())
        assert int(out.loc[k, "sum_xx"]) == int((sub["x"] ** 2).sum())
        assert int(out.loc[k, "sum_xy"]) == int((sub["x"] * sub["y"]).sum())
        # and the downstream float math is recoverable: covariance
        n = len(sub)
        cov = (int(out.loc[k, "sum_xy"]) / n
               - int(out.loc[k, "sum_x"]) / n * int(out.loc[k, "sum_y"]) / n)
        assert abs(cov - sub["x"].cov(sub["y"], ddof=0)) < 1e-6


def test_grouped_mode_and_tdigest_keep_null_key_group(ray_session):
    import pandas as pd
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        grouped_mode, tdigest_quantiles)

    df = pd.DataFrame({
        "k": ["a", "a", None, None, None],
        "v": ["x", "x", "y", "y", "z"],
        "num": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    ds = rd.from_pandas(df)
    mode = grouped_mode(ds.select_columns(["k", "v"]), "k", "v").to_pandas()
    null_rows = mode[mode["k"].isna()]
    assert len(null_rows) == 1 and null_rows["mode"].iloc[0] == "y"
    td = tdigest_quantiles(ds.select_columns(["k", "num"]), "k", "num",
                           ps=(0.5,)).to_pandas()
    assert int(td.loc[td["k"].isna(), "n_rows"].iloc[0]) == 3


def test_skyline_2d_matches_brute_force():
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import skyline_2d

    rows = [{"id": i, "x": (i * 13) % 23, "y": (i * 7) % 31}
            for i in range(500)]
    ds = rd.from_items(rows)
    out = skyline_2d(ds, "x", "y").to_pandas()
    xs = np.array([r["x"] for r in rows])
    ys = np.array([r["y"] for r in rows])
    ref = {r["id"] for i, r in enumerate(rows)
           if not any((xs >= xs[i]) & (ys >= ys[i])
                      & ((xs > xs[i]) | (ys > ys[i])))}
    assert set(out["id"]) == ref
    assert len(out) > 0


def test_grouped_weighted_quantiles_reference():
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        grouped_weighted_quantiles,
    )

    rng = np.random.default_rng(23)
    rows = []
    for k in range(5):
        for _ in range(80):
            rows.append({"k": k, "v": int(rng.integers(0, 40)),
                         "w": int(rng.integers(1, 9))})
    out = grouped_weighted_quantiles(
        rd.from_items(rows), "k", "v", "w", p_pcts=(50, 90),
        n_buckets=4).to_pandas().set_index("k").sort_index()

    import collections
    for k in range(5):
        agg = collections.Counter()
        for r in rows:
            if r["k"] == k:
                agg[r["v"]] += r["w"]
        vals = sorted(agg)
        tot = sum(agg.values())
        cum = 0
        ref = {}
        for p in (50, 90):
            cum = 0
            for v in vals:
                cum += agg[v]
                if cum * 100 >= p * tot:
                    ref[p] = v
                    break
        assert out.loc[k, "total_w"] == tot
        assert out.loc[k, "wp50"] == ref[50]
        assert out.loc[k, "wp90"] == ref[90]


def test_table_checksum_order_and_partition_invariant():
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import table_checksum

    rows = [{"id": i, "s": f"v{i % 7}"} for i in range(200)]
    a = table_checksum(rd.from_items(rows), ["id", "s"]).to_pandas()
    # reversed row order, different partitioning -> identical checksum
    b = table_checksum(
        rd.from_items(rows[::-1]).repartition(13), ["id", "s"]).to_pandas()
    assert a["n_rows"].iloc[0] == b["n_rows"].iloc[0] == 200
    assert a["checksum"].iloc[0] == b["checksum"].iloc[0]
    # a single changed row flips the checksum
    rows[17] = {"id": 17, "s": "poison"}
    c = table_checksum(rd.from_items(rows), ["id", "s"]).to_pandas()
    assert c["checksum"].iloc[0] != a["checksum"].iloc[0]

    # float columns are rejected loudly
    import pytest

    with pytest.raises(Exception):
        table_checksum(
            rd.from_items([{"x": 1.5}]), ["x"]).to_pandas()


def test_grouped_heavy_hitters_zipf_bound_per_key():
    """Per-key MG: the global guarantees hold independently per key —
    est <= true, true - est <= 2 n_key/(k+1), heavy values survive —
    with each key's own stream length as n_total."""
    import collections

    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        grouped_heavy_hitters,
    )

    rng = np.random.RandomState(7)
    rows = []
    for key, size, a in (("s1", 8000, 1.5), ("s2", 3000, 1.3)):
        for z in rng.zipf(a, size):
            if z < 2000:
                rows.append({"k": key, "w": f"t{z}"})
    k = 48
    out = (grouped_heavy_hitters(
        rd.from_items(rows), "k", "w", k=k).to_pandas())
    for key, grp in out.groupby("k"):
        stream = [r["w"] for r in rows if r["k"] == key]
        true = collections.Counter(stream)
        n = len(stream)
        bound = 2 * n / (k + 1)
        assert (grp["n_total"] == n).all()
        est = grp.set_index("w")["est"]
        for w, e in est.items():
            assert 0 < e <= true[w]
            assert true[w] - e <= bound + 1e-9
        for w, c in true.items():
            if c > bound:
                assert w in est.index


def test_ks_drift_matches_scipy_style_reference():
    """ks_num / (n_a*n_b) equals the classical two-sample D computed by
    brute force; identical distributions give 0."""
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import ks_drift

    rng = np.random.default_rng(3)
    a = rng.integers(0, 50, 300)
    b = rng.integers(10, 60, 200)          # shifted distribution
    rows = ([{"k": "a", "v": int(x)} for x in a]
            + [{"k": "b", "v": int(x)} for x in b]
            + [{"k": "c", "v": int(x)} for x in a])   # c == a exactly
    out = ks_drift(rd.from_items(rows), "k", "v", n_buckets=4) \
        .to_pandas().set_index(["key_a", "key_b"])

    grid = np.unique(np.concatenate([a, b]))
    Fa = np.searchsorted(np.sort(a), grid, side="right")
    Fb = np.searchsorted(np.sort(b), grid, side="right")
    brute = np.abs(Fa * len(b) - Fb * len(a)).max()
    assert out.loc[("a", "b"), "ks_num"] == brute
    assert out.loc[("a", "c"), "ks_num"] == 0          # identical dists
    assert out.loc[("a", "b"), "n_a"] == 300
    assert out.loc[("a", "b"), "n_b"] == 200


def test_kmv_distinct_accuracy_and_merge_stability():
    """KMV estimate lands near the true distinct count for n >> k; the
    sketch is exact below k; estimates are invariant to repartitioning
    (mergeable min-k)."""
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import kmv_distinct

    rows = [{"v": int(i % 2000)} for i in range(6000)]   # 2000 distinct
    out = kmv_distinct(rd.from_items(rows), "v", k=64).to_pandas()
    assert len(out) == 64
    est = out["est"].iloc[0]
    assert abs(est - 2000) < 2000 * 0.35                 # ~1/sqrt(64) err
    # partitioning must not change the sketch
    out2 = kmv_distinct(rd.from_items(rows).repartition(13), "v",
                        k=64).to_pandas()
    assert (out["h"].to_numpy() == out2["h"].to_numpy()).all()
    assert out2["est"].iloc[0] == est

    small = kmv_distinct(rd.from_items(rows[:10]), "v", k=64).to_pandas()
    assert small["est"].iloc[0] == 10                     # exact below k


def test_kmv_set_ops_exact_below_k(ray_session):
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import kmv_set_ops

    # both sides far below k=64 -> every estimate must be EXACT
    rows = [{"side": 0, "v": f"a{i}"} for i in range(20)] + \
        [{"side": 1, "v": f"a{i}"} for i in range(10, 35)] + \
        [{"side": 0, "v": "a3"}]  # duplicate row, must not count twice
    out = kmv_set_ops(rd.from_items(rows), "side", "v", k=64) \
        .to_pandas().iloc[0]
    assert out["n_a_est"] == 20
    assert out["n_b_est"] == 25
    assert out["n_union_est"] == 35
    assert out["inter_members"] == 10
    assert out["n_inter_est"] == 10


def test_kmv_set_ops_estimator_rule_reference(ray_session):
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.functions.textstats import md5_u64
    from document_text_extraction_ray.stages.aggregate import kmv_set_ops

    k = 16
    va = [f"x{i}" for i in range(200)]
    vb = [f"x{i}" for i in range(100, 400)]
    rows = [{"side": 0, "v": v} for v in va] + \
        [{"side": 1, "v": v} for v in vb]
    out = kmv_set_ops(rd.from_items(rows), "side", "v", k=k) \
        .to_pandas().iloc[0]

    def est(hs):
        return len(hs) if len(hs) < k else \
            (len(hs) - 1) * (1 << 64) // int(hs[-1])

    a = np.unique(np.array([md5_u64(v) for v in set(va)],
                           dtype=np.uint64))[:k]
    b = np.unique(np.array([md5_u64(v) for v in set(vb)],
                           dtype=np.uint64))[:k]
    u = np.unique(np.concatenate([a, b]))[:k]
    rho = int(np.isin(u, a[np.isin(a, b)]).sum())
    est_u = est(u)
    assert out["n_a_est"] == est(a)
    assert out["n_b_est"] == est(b)
    assert out["n_union_est"] == est_u
    assert out["inter_members"] == rho
    assert out["n_inter_est"] == rho * est_u // k
    # sanity: estimates in the right ballpark of the true cardinalities
    assert 100 < out["n_a_est"] < 400
    assert 200 < out["n_union_est"] < 800


def test_basket_association_matches_brute_force(ray_session):
    from itertools import combinations

    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        basket_association,
    )

    rows = [{"u": i % 7, "d": i % 3, "item": f"t{(i * 5 + j) % 4}"}
            for i in range(40) for j in range(3)]
    out = basket_association(
        rd.from_items(rows), ["u", "d"], "item", n_buckets=4).to_pandas()

    baskets = {}
    for r in rows:
        baskets.setdefault((r["u"], r["d"]), set()).add(r["item"])
    from collections import Counter
    both = Counter()
    single = Counter()
    for items in baskets.values():
        for it in items:
            single[it] += 1
        for a, b in combinations(sorted(items), 2):
            both[(a, b)] += 1
    got = {(r.item_a, r.item_b): (int(r.n_both), int(r.n_a), int(r.n_b),
                                  int(r.n_baskets))
           for r in out.itertuples()}
    assert got == {(a, b): (n, single[a], single[b], len(baskets))
                   for (a, b), n in both.items()}


def test_rrf_fuse_matches_reference(ray_session):
    import ray.data as rd

    from document_text_extraction_ray.stages.windows import rrf_fuse

    la = [{"id": i, "rank": r + 1} for r, i in enumerate([3, 1, 4, 5])]
    lb = [{"id": i, "rank": r + 1} for r, i in enumerate([1, 5, 9])]
    out = rrf_fuse([rd.from_items(la), rd.from_items(lb)]).to_pandas() \
        .set_index("id").sort_index()
    ref = {}
    for lst in (la, lb):
        for row in lst:
            s, n = ref.get(row["id"], (0, 0))
            ref[row["id"]] = (s + 10**6 // (60 + row["rank"]), n + 1)
    assert {int(i): (int(r["rrf_q"]), int(r["n_lists"]))
            for i, r in out.iterrows()} == ref


def test_countmin_freq_overestimates_and_matches_reference():
    """CM invariants: est >= true for every probe; est equals the exact
    d x w matrix reference built single-process; block layout cannot
    matter (mergeable sums)."""
    from collections import Counter

    from document_text_extraction_ray.functions.textstats import md5_u64
    from document_text_extraction_ray.stages.aggregate import countmin_freq

    rng = np.random.RandomState(7)
    keys = rng.zipf(1.5, 3000) % 97          # skewed, collisions certain
    d, w = 3, 16
    true = Counter(int(k) for k in keys)
    mat = np.zeros((d, w), np.int64)
    for k, c in true.items():
        for i in range(d):
            mat[i, md5_u64(f"{i}:{k}") % w] += c
    probes = sorted(true)[:25]
    ref = {k: min(int(mat[i, md5_u64(f"{i}:{k}") % w]) for i in range(d))
           for k in probes}

    for n_blocks in (1, 7):
        ds = ray.data.from_items(
            [{"user_id": int(k)} for k in keys]).repartition(n_blocks)
        out = countmin_freq(ds, "user_id", probes, d=d, w=w, n_buckets=4)
        got = dict(zip(out["user_id"], out["est"]))
        assert got == ref
        assert all(got[k] >= true[k] for k in probes)
    assert any(ref[k] > true[k] for k in probes)  # collisions occurred


def test_grouped_gini_matches_definition():
    """gini_num/(n*sum) equals the classic mean-absolute-difference form
    G = sum_ij |xi - xj| / (2 n^2 mu); extremes: all-equal -> 0,
    one-owner -> (n-1)/n."""
    from document_text_extraction_ray.stages.aggregate import grouped_gini

    rng = np.random.RandomState(3)
    rows = ([{"k": "a", "v": int(v)} for v in rng.randint(1, 50, 40)]
            + [{"k": "eq", "v": 7} for _ in range(10)]
            + [{"k": "one", "v": 0} for _ in range(9)]
            + [{"k": "one", "v": 100}])
    out = grouped_gini(ray.data.from_items(rows), "k", "v",
                       n_buckets=4).to_pandas().set_index("k")

    df = {"a": [r["v"] for r in rows if r["k"] == "a"]}
    x = np.array(df["a"], np.int64)
    n, s = len(x), x.sum()
    mad = np.abs(x[:, None] - x[None, :]).sum()
    row = out.loc["a"]
    assert row["n"] == n and row["sum_value"] == s
    # num = sum((2r-n-1)x) over sorted == MAD/... : G = num/(n*s) = mad/(2n*s)
    assert 2 * row["gini_num"] == mad
    assert out.loc["eq"]["gini_num"] == 0
    one = out.loc["one"]
    assert one["gini_num"] / (one["n"] * one["sum_value"]) == (10 - 1) / 10


def test_grouped_bootstrap_matches_brute_force(ray_session):
    import ray.data as rd

    from document_text_extraction_ray.functions.textstats import md5_u64
    from document_text_extraction_ray.stages.aggregate import (
        grouped_bootstrap,
    )

    rows = [{"k": f"g{i % 3}", "v": (i * 13 % 40) / 4.0, "id": i}
            for i in range(60)]
    n_reps = 4
    out = grouped_bootstrap(rd.from_items(rows), "k", "v", "id",
                            n_reps=n_reps, n_buckets=4).to_pandas()
    got = {(r.k, r.rep): (r.wsum, r.wn) for r in out.itertuples()}

    ref: dict = {}
    for r in rows:
        c = round(r["v"] * 100)
        for rep in range(n_reps):
            w = md5_u64(f"{r['id']}:{rep}") % 3
            s = ref.setdefault((r["k"], rep), [0, 0])
            s[0] += w * c
            s[1] += w
    assert got == {k: tuple(v) for k, v in ref.items()}
    # mean-1 multiplier: replicate weight totals hover around group size
    import numpy as np
    wns = np.array([v[1] for v in ref.values()])
    assert wns.min() > 0


def test_exact_percentiles_matches_numpy(ray_session):
    import numpy as np
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        exact_percentiles,
    )

    rng = np.random.RandomState(7)
    vals = np.concatenate([rng.randint(0, 10**7, 5000),
                           np.full(100, 424242),   # heavy tie
                           [0, 10**7 - 1]])        # extremes
    rows = [{"v": float(x) / 100.0} for x in vals]
    out = exact_percentiles(rd.from_items(rows), "v",
                            percents=(1, 25, 50, 75, 99)).to_pandas() \
        .set_index("pct")
    sv = np.sort(vals)
    n = len(sv)
    for pct in (1, 25, 50, 75, 99):
        rank = (pct * n + 99) // 100
        assert out.loc[pct, "value"] == sv[rank - 1]
        assert out.loc[pct, "n_rows"] == n


def test_time_decayed_counts_halving_and_horizon(ray_session):
    """Each day back halves the weight; rows past the horizon weigh 0 but
    still count in n."""
    import datetime as dt

    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.stages.aggregate import (
        time_decayed_counts)

    base = dt.datetime(2024, 3, 10, 12, 0, 0)
    rows = [
        {"k": "a", "ts": base},                            # age 0
        {"k": "a", "ts": base - dt.timedelta(days=1)},     # age 1
        {"k": "a", "ts": base - dt.timedelta(days=1)},     # age 1
        {"k": "b", "ts": base - dt.timedelta(days=50)},    # past horizon
        {"k": "b", "ts": base},                            # age 0
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    df = time_decayed_counts(ds, "k", "ts", horizon=40) \
        .to_pandas().set_index("k")
    w0 = 1 << 40
    assert df.loc["a", "decayed"] == w0 + 2 * (w0 // 2)
    assert df.loc["a", "n"] == 3
    assert df.loc["b", "decayed"] == w0  # the 50-day-old row weighs 0
    assert df.loc["b", "n"] == 2
