"""Driver-contract tests: entry() smoke + queries() vs oracle_sql() via DuckDB
(a fast subset; tools/check_correctness.py covers all queries)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SUBSET = ["extract_main_text", "token_stats", "q1_pricing", "q3_top_revenue",
          "events_window", "ann_topk", "exact_dedup"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke():
    result = entrymod.entry()
    df = result.to_pandas() if hasattr(result, "to_pandas") else result
    assert len(df) >= 1
    assert "extracted_text" in df.columns and "url" in df.columns
    assert set(df["status"]) == {"ok"}


def test_query_keys_align():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, con):
    import pyarrow as pa

    import ray.data

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    result = qs[name](SF)
    if isinstance(result, ray.data.Dataset):
        ray_df = result.to_pandas()
    elif isinstance(result, pa.Table):
        ray_df = result.to_pandas()
    else:
        ray_df = result
    sql_df = con.execute(oracles[name]).fetchdf()
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    a, b = _norm(ray_df), _norm(sql_df)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == "f":
            assert np.allclose(av.astype(float), bv.astype(float), atol=1e-9), c
        else:
            assert (av.astype(str) == bv.astype(str)).all(), c
