"""Data-quality expectation checks at dataset scale: row-local expectations
(nulls, ranges, regex shape) folded into ONE pass over the table, plus
referential-integrity (foreign-key) violation counting via a key-bucketed
exchange — the Great-Expectations-shaped validation suite a 100-TB ingest
runs before committing a snapshot.

Physical shapes:
  * ``expectation_counts``: every check evaluates vectorized per batch; the
    wire carries (check, n_violations, n_checked) partial rows — n_checks
    rows per batch regardless of batch size.
  * ``fk_violation_counts``: fact side ships per-key COUNTS, dim side ships
    DISTINCT keys; one bucketed exchange; a fact key with no dim match
    contributes its full row count to the violation total.  Exact (bloom
    pre-filters would undercount via false positives, so none are used).

The reference validates nothing (its error capture is per-row try/except,
``/root/reference/grid_detector_v4.py:328-336``); this is the
dataset-level acceptance gate that precedes any production run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import bucketed_combine


def expectation_counts(ds, checks, n_buckets: int = 4):
    """Run row-local expectations in one pass.  ``checks`` is a list of
    ``(name, fn)`` where ``fn(batch: pa.Table) -> pa.BooleanArray`` marks
    VIOLATING rows (nulls in the mask count as violations — an unparsable
    value fails its expectation).  Returns (check, n_violations,
    n_checked), one row per check."""

    def partial(t: pa.Table) -> pa.Table:
        names, viol, checked = [], [], []
        for name, fn in checks:
            m = fn(t)
            bad = int(pc.sum(pc.fill_null(m, True)).as_py() or 0)
            names.append(name)
            viol.append(bad)
            checked.append(t.num_rows)
        return pa.table({
            "check_name": pa.array(names, pa.string()),
            "pv": pa.array(viol, pa.int64()),
            "pc": pa.array(checked, pa.int64()),
        })

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("check_name").aggregate([("pv", "sum"), ("pc", "sum")])
        return pa.table({"check_name": g.column("check_name"),
                         "n_violations": g.column("pv_sum"),
                         "n_checked": g.column("pc_sum")})

    return bucketed_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        "check_name", combine, n_buckets)


def fk_violation_counts(fact, fact_key: str, dim, dim_key: str,
                        check_name: str, n_buckets: int = 32):
    """Count fact rows whose ``fact_key`` has NO match in ``dim``'s
    ``dim_key`` (orphans).  NULL fact keys are violations (SQL FK
    semantics: a null reference can never satisfy the constraint here —
    matching the oracle's ``dim.key IS NULL OR fact.key IS NULL`` count).
    Returns a single row (check, n_violations, n_checked)."""

    def fact_partial(t: pa.Table) -> pa.Table:
        keys = pc.fill_null(pc.cast(t.column(fact_key), pa.int64()),
                            -(1 << 62))
        t2 = pa.table({"k": keys}).append_column(
            "pn", pa.array(np.ones(t.num_rows, np.int64)))
        g = t2.group_by("k").aggregate([("pn", "sum")])
        return pa.table({"k": g.column("k"), "pn": g.column("pn_sum"),
                         "side": pa.array(
                             np.zeros(g.num_rows, np.int8), pa.int8())})

    def dim_partial(t: pa.Table) -> pa.Table:
        keys = pc.unique(pc.cast(t.column(dim_key), pa.int64()))
        keys = keys.drop_null()
        return pa.table({"k": keys,
                         "pn": pa.array(np.zeros(len(keys), np.int64)),
                         "side": pa.array(
                             np.ones(len(keys), np.int8), pa.int8())})

    parts = fact.map_batches(fact_partial, batch_format="pyarrow").union(
        dim.map_batches(dim_partial, batch_format="pyarrow"))

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        per = df.groupby("k", sort=False).agg(
            pn=("pn", "sum"), has_dim=("side", "max"))
        viol = int(per.loc[per["has_dim"] == 0, "pn"].sum())
        checked = int(per["pn"].sum())
        return pa.table({"check_name": pa.array([check_name], pa.string()),
                         "pv": pa.array([viol], pa.int64()),
                         "pc": pa.array([checked], pa.int64())})

    per_bucket = bucketed_combine(parts, "k", combine, n_buckets)

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by("check_name").aggregate([("pv", "sum"), ("pc", "sum")])
        return pa.table({"check_name": g.column("check_name"),
                         "n_violations": g.column("pv_sum"),
                         "n_checked": g.column("pc_sum")})

    # n_buckets thin rows -> one block -> one final fold.
    return per_bucket.repartition(1).map_batches(
        total, batch_format="pyarrow")


def fd_discovery(ds, pairs, n_buckets: int = 32):
    """Functional-dependency discovery: for each (det, dep) column pair,
    does ``det -> dep`` hold (every det value maps to exactly one dep
    value)?  The schema-profiling op behind candidate-key detection and
    normalization hints: FD holds iff |distinct det| == |distinct
    (det, dep)|.

    Physical plan: per-batch DISTINCT (pair, det, dep) projection (values
    cast to string with a NUL sentinel for nulls — injective, never
    compared cross-type), ONE bucketed exchange on (pair, det) so every
    det value's rows land whole in one bucket, a vectorized whole-bucket
    dedup + per-det distinct-dep count, and a pair-count-sized final fold.
    Returns (det, dep, n_det, n_pairs, holds) — ``n_pairs - n_det`` is
    the number of violating extra mappings."""
    import pandas as pd

    from .aggregate import bucketed_fold

    def explode(t: pa.Table) -> pa.Table:
        tables = []
        for i, (a, b) in enumerate(pairs):
            av = pc.fill_null(pc.cast(t.column(a), pa.string()), "\x00")
            bv = pc.fill_null(pc.cast(t.column(b), pa.string()), "\x00")
            sub = pa.table({
                "pair": pa.array(np.full(t.num_rows, i, np.int32)),
                "a": av, "b": bv,
            })
            tables.append(sub.group_by(["pair", "a", "b"]).aggregate([]))
        return pa.concat_tables(tables)

    rows = ds.select_columns(
        sorted({c for p in pairs for c in p})
    ).map_batches(explode, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["pair", "a", "b"])
        per_a = d.groupby(["pair", "a"], sort=False).size() \
                 .reset_index(name="nb")
        out = per_a.groupby("pair", sort=False).agg(
            n_det=("a", "count"), n_pairs=("nb", "sum")).reset_index()
        return out.astype({"pair": "int64", "n_det": "int64",
                           "n_pairs": "int64"})

    partial = bucketed_fold(rows, ["pair", "a"], fold, n_buckets)

    def total(t: pa.Table) -> pa.Table:
        g = t.group_by("pair").aggregate(
            [("n_det", "sum"), ("n_pairs", "sum")])
        idx = np.asarray(g.column("pair"), dtype=np.int64)
        n_det = np.asarray(g.column("n_det_sum"), dtype=np.int64)
        n_pairs = np.asarray(g.column("n_pairs_sum"), dtype=np.int64)
        return pa.table({
            "det": pa.array([pairs[i][0] for i in idx], pa.string()),
            "dep": pa.array([pairs[i][1] for i in idx], pa.string()),
            "n_det": pa.array(n_det, pa.int64()),
            "n_pairs": pa.array(n_pairs, pa.int64()),
            "holds": pa.array((n_pairs == n_det).astype(np.int64)),
        })

    return partial.repartition(1).map_batches(total, batch_format="pyarrow")


def k_anonymity_stats(ds, quasi_cols, k: int = 5, n_buckets: int = 32):
    """K-ANONYMITY audit over a quasi-identifier tuple: how many rows sit
    in equivalence classes smaller than ``k`` (re-identifiable under
    linkage attacks) — the data-governance gate before releasing a
    dataset.  Per-batch tuple-count partials, ONE bucketed combine;
    returns a single row (n_rows, n_classes, n_rows_at_risk,
    n_classes_at_risk, min_class_size)."""

    def partial(t: pa.Table) -> pa.Table:
        t2 = t.select(list(quasi_cols)).append_column(
            "pn", pa.array(np.ones(t.num_rows, np.int64)))
        g = t2.group_by(list(quasi_cols)).aggregate([("pn", "sum")])
        cols = {c: g.column(c) for c in quasi_cols}
        cols["pn"] = g.column("pn_sum")
        return pa.table(cols)

    from .aggregate import bucketed_fold

    def fold(g):
        per = g.groupby(list(quasi_cols), sort=False, dropna=False)["pn"] \
            .sum()
        at_risk = per[per < k]
        import pandas as pd
        return pd.DataFrame({
            "n_rows": [int(per.sum())],
            "n_classes": [len(per)],
            "n_rows_at_risk": [int(at_risk.sum())],
            "n_classes_at_risk": [len(at_risk)],
            "min_class_size": [int(per.min()) if len(per) else 0],
        }).astype("int64")

    per_bucket = bucketed_fold(
        ds.map_batches(partial, batch_format="pyarrow"),
        list(quasi_cols), fold, n_buckets=n_buckets)

    def total(t: pa.Table) -> pa.Table:
        g = t.to_pandas()
        import pandas as pd
        out = pd.DataFrame({
            "n_rows": [int(g["n_rows"].sum())],
            "n_classes": [int(g["n_classes"].sum())],
            "n_rows_at_risk": [int(g["n_rows_at_risk"].sum())],
            "n_classes_at_risk": [int(g["n_classes_at_risk"].sum())],
            "min_class_size": [int(g["min_class_size"].min())
                               if len(g) else 0],
        }).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return per_bucket.repartition(1).map_batches(
        total, batch_format="pyarrow")


def json_key_profile(ds, json_col: str, n_buckets: int = 8):
    """Top-level JSON key profiling (semi-structured schema inference):
    for every key appearing in any document of a JSON string column,
    count presence and the JSON TYPE distribution of its values —
    number / string / bool / null / container (object or array) — plus
    unparseable rows under the reserved key ``__invalid__``.  The
    schema-drift gate for event/props ingestion: a key whose type mix
    shifts between snapshots is a producer bug.

    JSON parsing is inherently per-row (stdlib ``json``); the wire cost
    is per-batch per-key COUNT partials (keys x 6 integers per batch),
    combined in one key-bucketed exchange.  Integer counts, replayable
    in SQL either via json_each or a closed-form fixture."""
    import json as _json

    import pandas as pd

    from .aggregate import bucketed_fold

    COLS = ("n_present", "n_number", "n_string", "n_bool", "n_null",
            "n_container")

    def partial(t: pa.Table) -> pa.Table:
        counts = {}

        def bump(key, slot):
            row = counts.setdefault(key, [0] * 6)
            row[0] += 1
            row[slot] += 1

        for raw in t.column(json_col).to_pylist():
            try:
                obj = _json.loads(raw)
                if not isinstance(obj, dict):
                    raise ValueError
            except Exception:
                row = counts.setdefault("__invalid__", [0] * 6)
                row[0] += 1
                continue
            for key, v in obj.items():
                if isinstance(v, bool):      # before int: bool is int
                    bump(key, 3)
                elif isinstance(v, (int, float)):
                    bump(key, 1)
                elif isinstance(v, str):
                    bump(key, 2)
                elif v is None:
                    bump(key, 4)
                else:
                    bump(key, 5)
        ks = list(counts)
        cols = {"key": pa.array(ks, pa.string())}
        for i, c in enumerate(COLS):
            cols[c] = pa.array([counts[k][i] for k in ks], pa.int64())
        return pa.table(cols)

    partials = ds.select_columns([json_col]).map_batches(
        partial, batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("key", sort=False)[list(COLS)].sum().reset_index()
        for c in COLS:
            out[c] = out[c].astype("int64")
        return out

    return bucketed_fold(partials, "key", combine, n_buckets=n_buckets)


def l_diversity_stats(ds, quasi_cols, sensitive_col: str,
                      n_buckets: int = 32):
    """L-diversity audit: per quasi-identifier equivalence class, the
    row count and the number of DISTINCT sensitive values — a class
    with few distinct sensitive values leaks the attribute even when
    k-anonymous (the homogeneity attack ``k_anonymity_stats`` cannot
    see).  Per-batch distinct (QI, sensitive) + count partials, ONE
    QI-tuple-bucketed fold.  Returns (quasi..., n_rows,
    n_sensitive)."""
    import pandas as pd

    from .aggregate import bucketed_fold

    quasi_cols = [quasi_cols] if isinstance(quasi_cols, str) \
        else list(quasi_cols)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(quasi_cols + [sensitive_col]).aggregate(
            [([], "count_all")])
        return pa.table({
            **{c: g.column(c) for c in quasi_cols},
            sensitive_col: g.column(sensitive_col),
            "pn": pc.cast(g.column("count_all"), pa.int64())})

    partials = ds.select_columns(quasi_cols + [sensitive_col]) \
        .map_batches(partial, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(quasi_cols + [sensitive_col], sort=False)["pn"] \
            .sum().reset_index()
        out = c.groupby(quasi_cols, sort=False).agg(
            n_rows=("pn", "sum"),
            n_sensitive=(sensitive_col, "nunique")).reset_index()
        out["n_rows"] = out["n_rows"].astype("int64")
        out["n_sensitive"] = out["n_sensitive"].astype("int64")
        return out

    return bucketed_fold(partials, quasi_cols, fold, n_buckets=n_buckets)


def t_closeness_stats(ds, quasi_cols, sensitive_col: str,
                      n_buckets: int = 32):
    """T-closeness audit (the distribution-skew attack l-diversity
    misses: a class can hold many distinct sensitive values yet still
    leak because its MIX differs from the corpus): per quasi-identifier
    equivalence class, the exact ordered-domain Earth-Mover's distance
    between the class's sensitive-value distribution and the global one,
    as an INTEGER numerator — emd_num = sum_i |cumc_i * N - cumg_i * n_g|
    over the sorted value domain (t = emd_num / (n_g * N * (m - 1))).
    Integer cum-count cross products keep the report hash-exact; at
    corpus scale the products need n_g * N < 2^63 — band the sensitive
    domain or sample classes beyond that.

    Plan: per-batch (QI, value) count partials are materialized ONCE and
    consumed twice — a domain-bounded global-distribution fold (tiny:
    one row per sensitive value, driver-side by design, the broadcast
    small side) and one QI-tuple-bucketed vectorized pivot fold.
    Returns (quasi..., n_rows, emd_num)."""
    import pandas as pd

    from .aggregate import bucketed_fold

    quasi_cols = [quasi_cols] if isinstance(quasi_cols, str) \
        else list(quasi_cols)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(quasi_cols + [sensitive_col]).aggregate(
            [([], "count_all")])
        return pa.table({
            **{c: g.column(c) for c in quasi_cols},
            sensitive_col: g.column(sensitive_col),
            "pn": pc.cast(g.column("count_all"), pa.int64())})

    partials = ds.select_columns(quasi_cols + [sensitive_col]) \
        .map_batches(partial, batch_format="pyarrow").materialize()

    def value_partial(t: pa.Table) -> pa.Table:
        g = t.group_by([sensitive_col]).aggregate([("pn", "sum")])
        return pa.table({sensitive_col: g.column(sensitive_col),
                         "gn": g.column("pn_sum")})

    glob = partials.map_batches(value_partial, batch_format="pyarrow") \
        .to_pandas().groupby(sensitive_col, sort=True)["gn"].sum()
    domain = glob.index.to_numpy()          # sorted ascending
    cumg = glob.to_numpy().astype(np.int64).cumsum()
    n_total = int(cumg[-1]) if len(cumg) else 0

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(quasi_cols + [sensitive_col], sort=False)["pn"] \
            .sum().reset_index()
        mat = c.pivot_table(index=quasi_cols, columns=sensitive_col,
                            values="pn", aggfunc="sum", fill_value=0)
        mat = mat.reindex(columns=domain, fill_value=0)
        cnt = mat.to_numpy().astype(np.int64)
        cumc = cnt.cumsum(axis=1)
        n_g = cnt.sum(axis=1)
        emd = np.abs(cumc * n_total
                     - np.outer(n_g, cumg)).sum(axis=1)
        out = mat.index.to_frame(index=False)
        out["n_rows"] = n_g.astype(np.int64)
        out["emd_num"] = emd.astype(np.int64)
        return out

    return bucketed_fold(partials, quasi_cols, fold, n_buckets=n_buckets)
