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
