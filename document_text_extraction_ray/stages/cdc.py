"""Change-data-capture maintenance: apply a changelog (upserts + deletes)
to a base snapshot — the lakehouse MERGE INTO / compaction step every
incrementally-refreshed corpus needs (crawl refreshes, label fixups,
takedown deletes).

Latest-wins semantics: for each key, the change row with the highest
``seq`` decides the outcome (``op == "delete"`` removes the key, anything
else replaces the row); keys with no change keep their base row.  New keys
in the changelog insert.  Exactly ROW_NUMBER() OVER (PARTITION BY key
ORDER BY seq DESC) = 1 over base-tagged-as-seq=-1 UNION changes, minus
deletes — the SQL replay the oracle runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def apply_changelog(base, changes, key_col: str, seq_col: str, op_col: str,
                    payload_cols, n_buckets: int = 32):
    """Merge ``changes`` into ``base`` with latest-wins-per-key semantics.

    ``base``: Dataset with (key, *payload) columns — no seq/op needed.
    ``changes``: Dataset with (key, seq, op, *payload); ``op`` is
    ``"delete"`` or any upsert tag.  ``seq`` must totally order the
    changes per key (a log sequence number / commit timestamp); ties are
    broken by op descending (deterministic), matching the oracle.

    Plan: tag base rows with seq = -1 / op = "base", union, ONE bucketed
    exchange on the key, and a vectorized in-bucket fold (sort by
    (key, seq desc, op desc), drop_duplicates(key), filter deletes).  The
    exchange carries base + changelog once — no join, no driver state;
    at 100 TB the changelog side is usually tiny but nothing here
    requires it to be."""
    from .aggregate import bucketed_fold

    payload_cols = list(payload_cols)
    out_cols = [key_col, *payload_cols]

    def tag_base(t: pa.Table) -> pa.Table:
        cols = {key_col: t.column(key_col)}
        cols[seq_col] = pa.array(np.full(t.num_rows, -1, np.int64))
        cols[op_col] = pa.array(["base"] * t.num_rows, pa.string())
        for c in payload_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    def project_changes(t: pa.Table) -> pa.Table:
        cols = {key_col: t.column(key_col),
                seq_col: t.column(seq_col).cast(pa.int64()),
                op_col: t.column(op_col)}
        for c in payload_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    unioned = base.map_batches(tag_base, batch_format="pyarrow").union(
        changes.map_batches(project_changes, batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, seq_col, op_col], kind="mergesort",
                          ascending=[True, False, False])
        g = g.drop_duplicates(key_col, keep="first")
        g = g[g[op_col] != "delete"]
        return g[out_cols]

    return bucketed_fold(unioned, key_col, fold, n_buckets=n_buckets)


def union_by_name(datasets, fill_missing: bool = True):
    """UNION ALL BY NAME across snapshots with EVOLVING schemas: each
    dataset's batches are aligned to the union of all column names —
    missing columns become typed nulls, column order is normalized —
    then the datasets are unioned (zero exchanges; ``Dataset.union`` is
    a metadata concatenation).

    The real-world shape: crawl N+1 added a ``lang_conf`` column, crawl
    N-3 lacks ``fetch_ms`` — a plain union would raise (or silently
    misalign positional schemas).  Column TYPE for a missing column comes
    from the first dataset that has it; datasets that share a name with a
    different type raise loudly rather than coerce.

    Returns the unified Dataset with columns sorted by first appearance."""
    import pyarrow as pa

    from .join import _arrow_schema

    if not datasets:
        raise ValueError("union_by_name needs at least one dataset")
    schemas = [_arrow_schema(d) for d in datasets]
    types: dict = {}
    order: list = []
    for sch in schemas:
        for f in sch:
            if f.name in types:
                if types[f.name] != f.type:
                    raise TypeError(
                        f"column {f.name!r} has conflicting types: "
                        f"{types[f.name]} vs {f.type}")
            else:
                types[f.name] = f.type
                order.append(f.name)

    def align(t: pa.Table) -> pa.Table:
        cols = {}
        for name in order:
            if name in t.column_names:
                cols[name] = t.column(name)
            else:
                cols[name] = pa.nulls(t.num_rows, types[name])
        return pa.table(cols)

    aligned = []
    for d, sch in zip(datasets, schemas):
        if [f.name for f in sch] == order and not fill_missing:
            aligned.append(d)
        else:
            aligned.append(d.map_batches(align, batch_format="pyarrow"))
    out = aligned[0]
    return out.union(*aligned[1:]) if len(aligned) > 1 else out


def table_diff(old, new, key_col: str, payload_cols, n_buckets: int = 32):
    """Row-level diff of two snapshots keyed by ``key_col`` (unique per
    side): returns (key, status) with status in {"added", "removed",
    "changed"} — unchanged keys are OMITTED, so the output is delta-sized
    (the anti-entropy / incremental-refresh audit step; ``index_delta`` is
    this op specialized to posting lists).

    Plan: both sides project to (key, *payload) + a side tag, union, ONE
    bucketed exchange on the key, and a vectorized in-bucket outer merge.
    No driver state; each side ships its payload once."""
    from .aggregate import bucketed_fold

    payload_cols = list(payload_cols)
    cols = [key_col, *payload_cols]

    def tag(side: int):
        def _t(t: pa.Table) -> pa.Table:
            out = {c: t.column(c) for c in cols}
            out["__side"] = pa.array(np.full(t.num_rows, side, np.int8))
            return pa.table(out)
        return _t

    unioned = old.select_columns(cols).map_batches(
        tag(0), batch_format="pyarrow").union(
        new.select_columns(cols).map_batches(tag(1), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["__side"] == 0]
        n = g[g["__side"] == 1]
        m = o.merge(n, on=key_col, how="outer", suffixes=("_o", "_n"),
                    indicator=True)
        status = np.where(m["_merge"] == "left_only", "removed",
                          np.where(m["_merge"] == "right_only", "added",
                                   "changed"))
        if payload_cols:
            same = np.ones(len(m), dtype=bool)
            for c in payload_cols:
                a, b = m[f"{c}_o"], m[f"{c}_n"]
                same &= (a == b) | (a.isna() & b.isna())
            keep = (m["_merge"] != "both") | ~same
        else:
            keep = m["_merge"] != "both"
        out = pd.DataFrame({key_col: m.loc[keep, key_col],
                            "status": status[keep]})
        out["status"] = out["status"].astype(object)
        return out

    return bucketed_fold(unioned, key_col, fold, n_buckets=n_buckets)


def maintain_aggregate(base, changes, key_col: str, value_col: str,
                       op_col: str, sum_col: str = "sum_value",
                       n_col: str = "n_rows", n_buckets: int = 32):
    """Incremental materialized-view maintenance for SUM/COUNT group-bys:
    apply an insert/retract changelog (``op_col`` in {+1, -1}) to a
    previously materialized aggregate WITHOUT rescanning the fact table —
    the streaming-view primitive (Flink retract streams, Materialize).

    ``base`` rows are (key, sum_col, n_col); ``changes`` rows are
    (key, value, op).  New aggregate = base + Σ(op·value), n + Σ(op);
    groups whose count reaches zero are DELETED (exactly the rows a
    re-aggregation would not produce).  Contract: every retraction must
    match a previously inserted row (standard retract-stream semantics)
    — a negative final count raises in the fold, loudly, because it
    means the changelog and the view diverged.

    Plan: per-batch delta partials (key, Σ op·value, Σ op) — the raw
    changelog collapses BEFORE the exchange — then ONE bucketed fold
    merges base and delta rows per key.  Both inputs shuffle once; the
    fact table is never read."""
    import pyarrow.compute as pc

    from .aggregate import bucketed_fold

    def delta_partial(t: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(t.column(value_col), pa.int64()))
        op = np.asarray(pc.cast(t.column(op_col), pa.int64()))
        g = pa.table({key_col: t.column(key_col),
                      "dv": pa.array(v * op, pa.int64()),
                      "dn": pa.array(op, pa.int64())}) \
            .group_by(key_col).aggregate([("dv", "sum"), ("dn", "sum")])
        return pa.table({key_col: g.column(key_col),
                         sum_col: g.column("dv_sum"),
                         n_col: g.column("dn_sum")})

    deltas = changes.select_columns([key_col, value_col, op_col]) \
        .map_batches(delta_partial, batch_format="pyarrow")

    def base_rows(t: pa.Table) -> pa.Table:
        return pa.table({key_col: t.column(key_col),
                         sum_col: pc.cast(t.column(sum_col), pa.int64()),
                         n_col: pc.cast(t.column(n_col), pa.int64())})

    tagged = base.select_columns([key_col, sum_col, n_col]) \
        .map_batches(base_rows, batch_format="pyarrow").union(deltas)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, sort=False).agg(
            s=(sum_col, "sum"), n=(n_col, "sum")).reset_index()
        n = out["n"].to_numpy().astype(np.int64)
        if (n < 0).any():
            bad = out[key_col].to_numpy()[n < 0][:5]
            raise ValueError(
                f"retraction without matching insert for keys {bad!r}")
        out = out[n > 0].rename(columns={"s": sum_col, "n": n_col})
        out[sum_col] = out[sum_col].astype("int64")
        out[n_col] = out[n_col].astype("int64")
        return out[[key_col, sum_col, n_col]]

    return bucketed_fold(tagged, key_col, fold, n_buckets=n_buckets)
