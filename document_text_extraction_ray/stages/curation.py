"""Corpus-curation operators for training-data pipelines: per-domain
quotas, benchmark decontamination (n-gram overlap), and intra-document
repetition signals (duplicate-n-gram fractions in the style of the Gopher
quality rules).

These are the cross-corpus hygiene steps a web-scale pipeline runs after
extraction (the reference's per-document guards, M17, stop at single-doc
length checks — approach4_v1.py:199-200; these extend the same in-band
filter policy to corpus level).

Scale notes:
  * ``cap_per_key`` shuffles once on the key; each group fold keeps at most
    ``cap`` rows, so the output is bounded by cap x n_keys regardless of
    skew (a hot domain shrinks at its own reducer, nothing else waits).
  * ``ngram_contamination`` broadcasts the BENCHMARK n-gram set — eval
    suites are tiny next to the corpus, so this is the canonical
    broadcast-small-side semi-join: ``ray.put`` once, each batch filters
    locally, no shuffle ever touches the corpus.
  * ``repetition_stats`` is an embarrassingly parallel per-row kernel.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

WORD_RE = re.compile(r"[a-z0-9]+")


def word_ngrams(text: str, n: int) -> list:
    """Lowercase word n-grams, tokenized as [a-z0-9]+ runs — the same
    token definition the SQL oracles reconstruct with regexp_extract_all."""
    w = WORD_RE.findall(text.lower())
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def cap_per_key(ds, key_column: str, order_column: str, cap: int,
                rank_column: str = "rn"):
    """Per-key quota sampling: keep the first ``cap`` rows of each key
    group ordered by ``order_column`` (ties impossible for unique ids),
    appending their 1-based in-group rank.

    The web-pipeline use is per-domain caps — bounding any one domain's
    share of the training mix.  Equivalent SQL: ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY order) <= cap."""

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_column, kind="mergesort").head(cap).copy()
        g[rank_column] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    from .aggregate import bucketed_map_groups

    return bucketed_map_groups(ds, key_column, fold)


def benchmark_ngram_set(bench_ds, text_column: str = "text", n: int = 3) -> set:
    """Distinct word n-grams of a (small) benchmark dataset, collected on
    the driver.  Streaming iter_batches — nothing but the gram set is held;
    sized for eval suites (MBs), not corpora."""
    grams: set = set()
    for b in bench_ds.select_columns([text_column]).iter_batches(
        batch_format="pyarrow"
    ):
        for t in b.column(text_column).to_pylist():
            grams.update(word_ngrams(t or "", n))
    return grams


def ngram_contamination(ds, bench_grams: set, text_column: str = "text",
                        n: int = 3, out_column: str = "n_shared_grams"):
    """Benchmark-decontamination scan: append the count of DISTINCT word
    n-grams each document shares with the benchmark set.  Training docs
    with ``out_column`` > 0 are contaminated (they leak eval content) and
    are dropped by the caller's filter.

    The gram set is broadcast once (``ray.put``); Ray caches the
    deserialized object per worker, so batches pay a dict lookup, not a
    reship."""
    import ray

    ref = ray.put(frozenset(bench_grams))

    def scan(t: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        shared = [
            len(set(word_ngrams(x or "", n)) & grams)
            for x in t.column(text_column).to_pylist()
        ]
        return t.append_column(out_column, pa.array(shared, pa.int64()))

    return ds.map_batches(scan, batch_format="pyarrow")


def redact_pii(ds, text_column: str = "text",
               out_column: str = "redacted_text"):
    """PII redaction over the text column: emails -> ``<EMAIL>`` then each
    reference phone pattern (fields.PHONE_RES, applied in order) ->
    ``<PHONE>``.  Conservative: the per-match length>=7 filter of the
    EXTRACTOR is intentionally not applied when redacting (over-redacting a
    short digit run is safe; leaking a phone number is not).  Appends
    ``n_emails`` / ``n_phones`` counted from the redacted output (sentinel
    occurrences — the same count SQL reconstructs).  Pure per-row kernel,
    no shuffle; regexes compiled at import."""
    from ..functions.fields import EMAIL_RE, PHONE_RES

    def scrub(t: pa.Table) -> pa.Table:
        outs = []
        for x in t.column(text_column).to_pylist():
            s = EMAIL_RE.sub("<EMAIL>", x or "")
            for pat in PHONE_RES:
                s = pat.sub("<PHONE>", s)
            outs.append(s)
        t = t.append_column(out_column, pa.array(outs, pa.large_string()))
        t = t.append_column("n_emails", pa.array(
            [s.count("<EMAIL>") for s in outs], pa.int64()))
        return t.append_column("n_phones", pa.array(
            [s.count("<PHONE>") for s in outs], pa.int64()))

    return ds.map_batches(scrub, batch_format="pyarrow")


def repetition_stats(ds, text_column: str = "text", n: int = 2):
    """Intra-document repetition features (Gopher-style duplicate-n-gram
    signal): total n-grams, distinct n-grams, and the duplicate fraction
    as a fixed-point e4 integer (half-away rounding, matching SQL ROUND).

    Word-soup spam and boilerplate loops score high; the caller gates on
    ``dup_ngram_frac_e4``.  Pure per-row kernel, no shuffle."""

    def feats(t: pa.Table) -> pa.Table:
        n_grams, n_distinct, frac = [], [], []
        for x in t.column(text_column).to_pylist():
            gs = word_ngrams(x or "", n)
            total, uniq = len(gs), len(set(gs))
            n_grams.append(total)
            n_distinct.append(uniq)
            frac.append(
                0 if total == 0
                else int(np.floor((total - uniq) * 10000.0 / total + 0.5))
            )
        t = t.append_column("n_ngrams", pa.array(n_grams, pa.int64()))
        t = t.append_column("n_distinct_ngrams", pa.array(n_distinct, pa.int64()))
        return t.append_column("dup_ngram_frac_e4", pa.array(frac, pa.int64()))

    return ds.map_batches(feats, batch_format="pyarrow")


def line_dedup(ds, text_column: str = "text", id_column: str = "doc_id",
               n_buckets: int = 32):
    """Corpus-wide LINE-level deduplication (the CCNet / RefinedWeb line
    dedup): every line that occurs anywhere else in the corpus is dropped
    except its FIRST occurrence — first = smallest (doc id, line index) —
    and documents are reassembled from their surviving lines in order.

    Boilerplate that survives main-content extraction (cookie banners, nav
    footers, share buttons) repeats across millions of pages; dropping
    repeated lines corpus-wide is a standard step between extraction and
    document-level dedup in public web-text pipelines.

    Physical plan — three bucketed exchanges, no broadcast, no driver
    collection, skew-bounded:
      1. explode docs into (doc, idx, line) rows (embarrassingly parallel);
      2. first-occurrence per line: bucketed fold keyed on the RAW line
         (the exchange must carry the line anyway; keying on the string
         avoids any hash-collision semantic), emitting (line, keep_doc,
         keep_idx) — output is one row per DISTINCT line;
      3. join survivors back on the line and regroup by doc: each doc's
         fold sees all its lines with a keep flag, so the reassembled text,
         kept-count and total-count come from one pass.
    A hot line (the empty string, "Accept cookies") folds to ONE survivor
    row at its own reducer — nothing else waits on it.

    Returns (id_column, dedup_text, n_lines_total, n_lines_kept) with one
    row per input document (documents whose every line lost are kept with
    empty text)."""
    from .aggregate import bucketed_map_groups
    from .join import native_join

    id_type = ds.schema().base_schema.field(id_column).type

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, lines = [], [], []
        for doc_id, txt in zip(t.column(id_column).to_pylist(),
                               t.column(text_column).to_pylist()):
            for i, line in enumerate((txt or "").split("\n")):
                ids.append(doc_id)
                idxs.append(i + 1)   # 1-based, matching SQL subscripts
                lines.append(line)
        return pa.table({
            id_column: pa.array(ids, id_type),
            "idx": pa.array(idxs, pa.int64()),
            # plain string, not large_string: the survivor side comes back
            # through a pandas fold as string, and the arrow hash join
            # rejects mismatched key widths.  Single lines never approach
            # the 2 GB chunk bound at sane block sizes.
            "line": pa.array(lines, pa.string()),
        })

    exploded = ds.select_columns([id_column, text_column]).map_batches(
        explode, batch_format="pyarrow"
    )

    def first_occurrence(g: pd.DataFrame) -> pd.DataFrame:
        first = g.sort_values([id_column, "idx"], kind="mergesort").iloc[0]
        return pd.DataFrame([{"line": g["line"].iloc[0],
                              "keep_doc": first[id_column],
                              "keep_idx": int(first["idx"])}])

    def empty_survivors(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "line": pd.Series(dtype=object),
            "keep_doc": g[id_column].iloc[0:0],
            "keep_idx": pd.Series(dtype="int64"),
        })

    survivors = bucketed_map_groups(
        exploded, "line", first_occurrence,
        empty_result=empty_survivors, n_buckets=n_buckets,
    )

    # right_from_aggregate: the survivors exchange can emit zero-column
    # empty blocks for empty shuffle partitions (tiny corpora / many
    # buckets), which the arrow join rejects — coalesce them away first.
    marked = native_join(exploded, survivors, on="line",
                         n_partitions=n_buckets, right_from_aggregate=True)

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("idx", kind="mergesort")
        keep = (g[id_column].values == g["keep_doc"].values) \
            & (g["idx"].values == g["keep_idx"].values)
        return pd.DataFrame([{
            id_column: g[id_column].iloc[0],
            "dedup_text": "\n".join(g["line"].values[keep]),
            "n_lines_total": len(g),
            "n_lines_kept": int(keep.sum()),
        }])

    def empty_docs(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_column: g[id_column].iloc[0:0],
            "dedup_text": pd.Series(dtype=object),
            "n_lines_total": pd.Series(dtype="int64"),
            "n_lines_kept": pd.Series(dtype="int64"),
        })

    return bucketed_map_groups(
        marked, id_column, reassemble,
        empty_result=empty_docs, n_buckets=n_buckets,
    )
