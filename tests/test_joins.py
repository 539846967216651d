

def test_attach_column_preserves_nested_columns():
    """attach_column must carry struct/list columns through the exchange
    untouched (the arrow join rejects them; pandas merges corrupt them)."""
    import pyarrow as pa
    import ray.data as rd

    from document_text_extraction_ray.stages.join import attach_column

    big = rd.from_arrow(pa.table({
        "url": ["u1", "u2", "u3"],
        "spans": [[{"s": 1, "e": 4}], [], [{"s": 0, "e": 2}, {"s": 9, "e": 12}]],
        "n": [10, 20, 30],
    }))
    slim = rd.from_arrow(pa.table({
        "url": ["u3", "u1"],
        "dedup_text": ["three", "one"],
    }))
    out = attach_column(big, slim, on="url", value_col="dedup_text",
                        n_buckets=4).to_pandas().sort_values("url")
    assert list(out["url"]) == ["u1", "u3"]          # u2 missed -> dropped
    assert list(out["dedup_text"]) == ["one", "three"]
    assert list(out["n"]) == [10, 30]
    spans_u3 = list(out[out["url"] == "u3"]["spans"])[0]
    assert [dict(s) for s in spans_u3] == [{"s": 0, "e": 2}, {"s": 9, "e": 12}]
