"""Changelog MERGE (latest-wins upsert/delete apply)."""

import pandas as pd
import ray.data as rd

from document_text_extraction_ray.stages.cdc import apply_changelog


def test_apply_changelog_latest_wins():
    base = rd.from_items([
        {"k": i, "val": f"base{i}", "n": i * 10} for i in range(10)
    ])
    changes = rd.from_items([
        # k=1: upsert then later delete -> gone
        {"k": 1, "seq": 1, "op": "upsert", "val": "u1", "n": 11},
        {"k": 1, "seq": 2, "op": "delete", "val": "", "n": 0},
        # k=2: delete then later upsert -> resurrected with the upsert row
        {"k": 2, "seq": 1, "op": "delete", "val": "", "n": 0},
        {"k": 2, "seq": 2, "op": "upsert", "val": "u2", "n": 22},
        # k=3: two upserts -> highest seq wins
        {"k": 3, "seq": 1, "op": "upsert", "val": "old", "n": 1},
        {"k": 3, "seq": 9, "op": "upsert", "val": "new", "n": 33},
        # k=99: insert of a key absent from base
        {"k": 99, "seq": 1, "op": "upsert", "val": "ins", "n": 990},
    ])
    out = apply_changelog(base, changes, "k", "seq", "op", ["val", "n"],
                          n_buckets=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)

    expect = {i: (f"base{i}", i * 10) for i in range(10)}
    del expect[1]
    expect[2] = ("u2", 22)
    expect[3] = ("new", 33)
    expect[99] = ("ins", 990)
    got = {int(r.k): (r.val, int(r.n)) for r in out.itertuples()}
    assert got == expect


def test_apply_changelog_empty_changes_is_identity():
    base = rd.from_items([{"k": i, "val": str(i), "n": i} for i in range(5)])
    changes = rd.from_items(
        [{"k": 0, "seq": 1, "op": "upsert", "val": "z", "n": 7}]
    ).filter(lambda r: False)
    out = apply_changelog(base, changes, "k", "seq", "op", ["val", "n"],
                          n_buckets=2).to_pandas()
    assert sorted(out["k"]) == [0, 1, 2, 3, 4]
    assert set(out.columns) == {"k", "val", "n"}


def test_table_diff_statuses():
    old = rd.from_items([{"k": i, "v": f"v{i}", "n": i} for i in range(12)])
    new = rd.from_items(
        [{"k": i, "v": f"v{i}", "n": i + (7 if i % 4 == 0 else 0)}
         for i in range(12) if i % 3 != 0]
        + [{"k": 100, "v": "x", "n": 1}, {"k": 101, "v": "y", "n": 2}])
    from document_text_extraction_ray.stages.cdc import table_diff

    out = table_diff(old, new, "k", ["v", "n"], n_buckets=4).to_pandas()
    got = dict(zip(out["k"], out["status"]))
    expect = {}
    for i in range(12):
        if i % 3 == 0:
            expect[i] = "removed"
        elif i % 4 == 0:
            expect[i] = "changed"
    expect[100] = "added"
    expect[101] = "added"
    assert got == expect


def test_table_diff_identical_snapshots_empty():
    a = rd.from_items([{"k": i, "v": str(i)} for i in range(8)])
    b = rd.from_items([{"k": i, "v": str(i)} for i in range(8)])
    from document_text_extraction_ray.stages.cdc import table_diff

    out = table_diff(a, b, "k", ["v"], n_buckets=2).to_pandas()
    assert len(out) == 0


def test_union_by_name_aligns_evolving_schemas():
    """Snapshots with different column sets union with typed nulls;
    column order is first-appearance; same-name/different-type raises."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from document_text_extraction_ray.stages.cdc import union_by_name

    old = rd.from_arrow(pa.table({"id": [1, 2], "a": ["x", "y"]}))
    new = rd.from_arrow(pa.table({"id": [3], "b": [7], "a": ["z"]}))
    out = union_by_name([old, new]).to_pandas().sort_values("id")
    assert list(out.columns) == ["id", "a", "b"]
    assert out["b"].tolist()[:2] == [None, None] or out["b"].isna().tolist()[:2] == [True, True]
    assert out.iloc[2]["b"] == 7 and out["a"].tolist() == ["x", "y", "z"]

    clash = rd.from_arrow(pa.table({"id": [9], "a": [1.5]}))  # a: double
    with pytest.raises(TypeError):
        union_by_name([old, clash])


def test_maintain_aggregate_matches_reaggregation(ray_session):
    import ray.data as rd

    from document_text_extraction_ray.stages.cdc import maintain_aggregate

    # fact rows: key i%5, value i; base view over rows 0..39
    facts = [(i % 5, i) for i in range(40)]
    base_rows = {}
    for k, v in facts:
        s, n = base_rows.get(k, (0, 0))
        base_rows[k] = (s + v, n + 1)
    base = rd.from_items([
        {"k": k, "sum_value": s, "n_rows": n}
        for k, (s, n) in base_rows.items()])
    # changelog: insert rows 40..49, retract every row with v % 4 == 0
    changes = [{"k": i % 5, "v": i, "op": 1} for i in range(40, 50)] + \
        [{"k": v % 5, "v": v, "op": -1} for v in range(0, 40, 4)]
    # reference: re-aggregate the logical row set
    rows = [(i % 5, i) for i in range(50) if not (i < 40 and i % 4 == 0)]
    ref = {}
    for k, v in rows:
        s, n = ref.get(k, (0, 0))
        ref[k] = (s + v, n + 1)
    got = {int(r.k): (int(r.sum_value), int(r.n_rows))
           for r in maintain_aggregate(
               base, rd.from_items(changes), "k", "v", "op",
               n_buckets=4).to_pandas().itertuples()}
    assert got == {k: sn for k, sn in ref.items() if sn[1] > 0}


def test_maintain_aggregate_deletes_zero_groups_and_rejects_negative(
        ray_session):
    import pytest
    import ray.data as rd

    from document_text_extraction_ray.stages.cdc import maintain_aggregate

    base = rd.from_items([{"k": 1, "sum_value": 10, "n_rows": 1},
                          {"k": 2, "sum_value": 7, "n_rows": 1}])
    changes = rd.from_items([{"k": 1, "v": 10, "op": -1}])
    out = maintain_aggregate(base, changes, "k", "v", "op",
                             n_buckets=2).to_pandas()
    assert sorted(out["k"]) == [2]

    bad = rd.from_items([{"k": 2, "v": 7, "op": -1},
                         {"k": 2, "v": 3, "op": -1}])
    with pytest.raises(Exception, match="retraction"):
        maintain_aggregate(base, bad, "k", "v", "op",
                           n_buckets=2).to_pandas()
