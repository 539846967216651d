"""Deterministic sampling / split / sequence-packing operators."""

import numpy as np
import pandas as pd
import ray.data as rd

from document_text_extraction_ray.stages.sampling import (
    assign_split,
    hash_sample,
    md5_prefix,
    token_budget_bins,
)


def _docs(n=400):
    return rd.from_items(
        [{"doc_id": i, "src": f"s{i % 3}", "n_tokens": 100 + (i * 37) % 900}
         for i in range(n)]
    )


def test_hash_sample_deterministic_and_rate():
    ds = _docs()
    a = sorted(hash_sample(ds, "doc_id", rate_hex="1a").to_pandas()["doc_id"])
    b = sorted(hash_sample(ds, "doc_id", rate_hex="1a").to_pandas()["doc_id"])
    assert a == b  # same membership on re-run (retry-stable)
    assert a == [i for i in range(400) if md5_prefix(i) < "1a"]
    assert 0.04 < len(a) / 400 < 0.20  # ~26/256


def test_assign_split_partitions_everything():
    out = assign_split(_docs(), "doc_id").to_pandas()
    assert set(out["split"]) <= {"train", "val", "test"}
    assert len(out) == 400
    counts = out["split"].value_counts()
    assert counts["train"] > counts.get("val", 0)
    # val/test membership is exactly the hash predicate
    for _, row in out.iterrows():
        p = md5_prefix(row["doc_id"])
        expect = "val" if p < "1a" else ("test" if p < "34" else "train")
        assert row["split"] == expect


def test_token_budget_bins_prefix_sum_semantics():
    ds = _docs(60)
    out = token_budget_bins(ds, "src", "doc_id", "n_tokens",
                            budget=1000).to_pandas()
    ref = pd.DataFrame([r for r in ds.take_all()])
    for src, g in ref.groupby("src"):
        g = g.sort_values("doc_id")
        prior = g["n_tokens"].cumsum() - g["n_tokens"]
        expect = (prior // 1000).astype("int64")
        got = out[out["src"] == src].set_index("doc_id")["bin_id"]
        assert [got[d] for d in g["doc_id"]] == expect.tolist()
    # bins are contiguous non-decreasing per source in doc order
    for src, g in out.groupby("src"):
        bins = g.sort_values("doc_id")["bin_id"].tolist()
        assert bins == sorted(bins)


def test_stratified_hash_sample_per_stratum_rates():
    from document_text_extraction_ray.stages.sampling import (
        stratified_hash_sample,
    )

    ds = rd.from_items(
        [{"id": i, "s": "hot" if i % 2 == 0 else "rare"} for i in range(400)]
    )
    out = stratified_hash_sample(ds, "id", "s",
                                 rates={"hot": "08", "rare": "80"}).to_pandas()
    # membership is exactly the per-stratum md5 predicate
    expect = sorted(
        i for i in range(400)
        if md5_prefix(i) < ("08" if i % 2 == 0 else "80")
    )
    assert sorted(out["id"]) == expect
    # the rare stratum keeps ~8x the rate of the hot one
    hot = (out["s"] == "hot").sum()
    rare = (out["s"] == "rare").sum()
    assert rare > hot


def test_grouped_quantiles_percentile_disc_semantics():
    import pandas as pd

    from document_text_extraction_ray.stages.aggregate import (
        grouped_quantiles,
    )

    rows = [{"g": "a", "v": v} for v in [10, 20, 30, 40]]  # even n
    rows += [{"g": "b", "v": v} for v in [5, 1, 9]]        # odd n, unsorted
    out = (
        grouped_quantiles(rd.from_items(rows), "g", "v")
        .to_pandas().set_index("g").sort_index()
    )
    # PERCENTILE_DISC: first element at cumulative share >= p
    assert list(out.loc["a", ["p25", "p50", "p75"]]) == [10, 20, 30]
    assert list(out.loc["b", ["p25", "p50", "p75"]]) == [1, 5, 9]
    assert list(out["n_rows"]) == [4, 3]


def test_pack_sequences_budget_and_order():
    """Packed sequences respect the prefix-sum bin rule and in-order
    concatenation; max_docs_per_pack bounds a zero-token run."""
    import ray.data as rd

    from document_text_extraction_ray.stages.sampling import pack_sequences

    rows = [{"k": "a", "i": i, "nt": 40, "txt": f"d{i}"} for i in range(10)]
    rows += [{"k": "b", "i": i, "nt": 0, "txt": f"z{i}"} for i in range(6)]
    ds = rd.from_items(rows).repartition(3)
    out = pack_sequences(ds, "k", "i", "nt", "txt", budget=100, sep="|") \
        .to_pandas().set_index(["k", "bin_id"]).sort_index()
    # a: priors 0,40,80,120,160,200,240,280,320,360
    #    -> bins 0,0,0,1,1,2,2,2,3,3
    assert out.loc[("a", 0), "packed"] == "d0|d1|d2"
    assert out.loc[("a", 1), "packed"] == "d3|d4"
    assert out.loc[("a", 2), "packed"] == "d5|d6|d7"
    assert out.loc[("a", 3), "packed"] == "d8|d9"
    assert int(out.loc[("a", 0), "n"]) == 3
    # b: all zero-token docs stay in bin 0 (prefix never advances)
    assert out.loc[("b", 0), "packed"] == "z0|z1|z2|z3|z4|z5"
    capped = pack_sequences(ds, "k", "i", "nt", "txt", budget=100, sep="|",
                            max_docs_per_pack=2).to_pandas() \
        .set_index(["k", "bin_id"]).sort_index()
    assert capped.loc[("b", 0), "packed"] == "z0|z1"
    assert int(capped.loc[("b", 0), "n"]) == 6  # true count survives


def test_mixture_resample_hits_quota_ratio():
    import hashlib

    import ray.data as rd

    from document_text_extraction_ray.stages.sampling import mixture_resample

    rows = [{"id": i, "src": f"s{i % 4}"} for i in range(2000)]
    ds = rd.from_items(rows)
    weights = {"s0": 4, "s1": 2, "s2": 1}  # s3 dropped entirely
    out = mixture_resample(ds, "src", "id", weights, n_buckets=4).to_pandas()

    # replay the integer predicate
    c = {f"s{j}": 500 for j in range(4)}
    scale = min(c[s] * 1_000_000 // w for s, w in weights.items())
    quota = {s: min(scale * w // 1_000_000, c[s]) for s, w in weights.items()}
    kept = {s: 0 for s in weights}
    ref_ids = set()
    for r in rows:
        s = r["src"]
        if s not in quota:
            continue
        h = int(hashlib.md5(str(r["id"]).encode()).hexdigest()[:4], 16)
        if h * c[s] < 65536 * quota[s]:
            ref_ids.add(r["id"])
            kept[s] += 1
    assert set(out["id"]) == ref_ids
    assert set(out["src"]) <= set(weights)
    # binding stratum (highest weight) keeps ~everything; sizes track ratio
    assert quota["s0"] == 500
    assert kept["s0"] == 500


def test_rendezvous_minimal_movement_property():
    """HRW invariant: growing 8 -> 9 workers moves ONLY keys whose new
    argmax IS the new worker — every other key stays put; moved mass
    lands entirely on worker 8 and is ~1/9 of the corpus."""
    import ray.data as rd

    from document_text_extraction_ray.stages.sampling import (
        rendezvous_rebalance_stats,
    )

    keys = rd.from_items([{"k": i} for i in range(3000)])
    out = rendezvous_rebalance_stats(keys, "k", 8, 9, n_buckets=4) \
        .to_pandas().set_index("worker").sort_index()
    assert out["n_old_keys"].sum() == 3000
    assert out["n_new_keys"].sum() == 3000
    # old workers lose only what worker 8 gained: stayed == new counts
    for w in range(8):
        assert out.loc[w, "n_stayed"] == out.loc[w, "n_new_keys"]
    assert out.loc[8, "n_old_keys"] == 0
    moved = 3000 - out["n_stayed"].sum()
    assert moved == out.loc[8, "n_new_keys"]
    assert 3000 // 9 * 0.5 < moved < 3000 // 9 * 1.6   # ~1/9 expected


def test_budget_allocation_exact_sum_and_proportionality():
    import ray.data as rd

    from document_text_extraction_ray.stages.sampling import (
        budget_allocation,
    )

    # weights 5/3/2 over budget 17 -> floors 8/5/3 (sum 16), one
    # leftover goes to the largest remainder
    rows = [{"k": "a"}] * 5 + [{"k": "b"}] * 3 + [{"k": "c"}] * 2
    out = budget_allocation(rd.from_items(rows), "k", budget=17) \
        .to_pandas().set_index("k")
    assert int(out["quota"].sum()) == 17
    ref = {"a": 17 * 5 // 10, "b": 17 * 3 // 10, "c": 17 * 2 // 10}
    rems = {"a": 17 * 5 % 10, "b": 17 * 3 % 10, "c": 17 * 2 % 10}
    leftover = 17 - sum(ref.values())
    for k in sorted(rems, key=lambda k: (-rems[k], k))[:leftover]:
        ref[k] += 1
    assert {k: int(v) for k, v in out["quota"].items()} == ref


def test_budget_allocation_weight_col_and_zero_leftover():
    import ray.data as rd

    from document_text_extraction_ray.stages.sampling import (
        budget_allocation,
    )

    # weights 1/1 over budget 10 -> exact halves, leftover 0
    ds = rd.from_items([{"k": "x", "w": 1}, {"k": "y", "w": 1}])
    out = budget_allocation(ds, "k", budget=10, weight_col="w").to_pandas()
    assert sorted(out["quota"]) == [5, 5]
