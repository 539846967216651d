"""Corpus-level lexical statistics: n-gram LM scoring, TF-IDF term ranking,
inverted-index build, and BPE merge learning.

These are the "train a small model over the whole corpus, then apply it back
to every document" operators a web-scale training-data pipeline runs between
extraction and sampling (CCNet-style LM quality filtering, per-doc keyword
profiling, tokenizer training).  The common physical shape:

  1. explode documents into thin (key, count) rows inside ``map_batches``
     (only distinct keys per batch cross the wire — the partial-aggregate
     pattern);
  2. ONE bucketed exchange builds the corpus-global table (the "model");
  3. a distributed hash join applies the model back to the per-doc rows —
     the corpus-sized side shuffles once, nothing is driver-collected.

All scores are integer-exact (counts and sums of counts, never log-probs),
so every operator here carries a hash-exact DuckDB oracle.  The reference
has no corpus-global operators at all (each script is per-document —
e.g. ``/root/reference/approach4_v1.py`` keyword matching at :100-130);
these extend the engine for the 100-TB training-data use case.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .aggregate import bucketed_combine, bucketed_fold
from .join import partitioned_hash_join

# One tokenizer for the whole family, chosen to be exactly replayable in
# DuckDB RE2: regexp_extract_all(lower(text), '[a-z0-9]+').
TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokens(text: str) -> list:
    return TOKEN_RE.findall((text or "").lower())


# --------------------------------------------------------------- bigram LM

def doc_bigram_counts(docs, id_column: str = "doc_id",
                      text_column: str = "text"):
    """(doc_id, bigram, k) thin rows: per-document bigram occurrence counts,
    computed batch-locally (a document is one row, so its counts never
    span batches — no exchange needed for the per-doc side)."""

    def explode(t: pa.Table) -> pa.Table:
        ids, bgs, ks = [], [], []
        for doc_id, text in zip(t.column(id_column).to_pylist(),
                                t.column(text_column).to_pylist()):
            w = _tokens(text)
            c = Counter(a + " " + b for a, b in zip(w, w[1:]))
            ids.extend([doc_id] * len(c))
            bgs.extend(c.keys())
            ks.extend(c.values())
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "bigram": pa.array(bgs, pa.string()),
            "k": pa.array(ks, pa.int64()),
        })

    return docs.select_columns([id_column, text_column]).map_batches(
        explode, batch_format="pyarrow"
    )


def bigram_lm_table(docs, text_column: str = "text", n_buckets: int = 32):
    """The "language model": corpus-wide bigram occurrence counts
    (bigram, n).  Per-batch Counter partial (distinct bigrams per batch
    cross the wire, not occurrences), one bucketed combine."""

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_column).to_pylist():
            w = _tokens(text)
            c.update(a + " " + b for a, b in zip(w, w[1:]))
        ks = list(c.keys())
        return pa.table({"bigram": pa.array(ks, pa.string()),
                         "partial": pa.array([c[k] for k in ks], pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("bigram").aggregate([("partial", "sum")])
        return pa.table({"bigram": g.column("bigram"),
                         "n": g.column("partial_sum")})

    partials = docs.select_columns([text_column]).map_batches(
        partial, batch_format="pyarrow")
    return bucketed_combine(partials, "bigram", combine, n_buckets)


def lm_coverage_scores(docs, id_column: str = "doc_id",
                       text_column: str = "text", n_buckets: int = 32,
                       id_type: pa.DataType = None):
    """CCNet-style corpus-LM quality scoring, integer-exact: per document,
    ``n_bigrams`` = total bigram occurrences and ``coverage`` = sum over
    occurrences of the corpus-wide count of that bigram (k * n summed over
    the doc's distinct bigrams).  High coverage = the document is made of
    corpus-typical word transitions; near-minimal coverage = gibberish /
    boilerplate-free outlier — the same signal CCNet gets from wiki-LM
    perplexity, without the cross-engine float-log hazard.

    Physical plan: thin per-doc bigram rows join the LM table on ``bigram``
    (one bucketed hash join — the model is corpus-sized at web scale, so it
    is NOT broadcast), then a pre-aggregated per-doc sum.  Documents with
    fewer than two tokens have no bigrams and drop out (mirrored in SQL)."""
    doc_bg = doc_bigram_counts(docs, id_column, text_column)
    lm = bigram_lm_table(docs, text_column, n_buckets)

    # Pass the joined schemas explicitly: Dataset.schema() on a side behind
    # map_batches executes its upstream lineage (see partitioned_hash_join).
    id_type = id_type or pa.int64()
    left_schema = pa.schema([(id_column, id_type),
                             ("bigram", pa.string()), ("k", pa.int64())])
    right_schema = pa.schema([("bigram", pa.string()), ("n", pa.int64())])
    joined = partitioned_hash_join(
        doc_bg, lm, on="bigram", n_buckets=n_buckets,
        left_schema=left_schema, right_schema=right_schema,
    )

    def partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("k"), dtype=np.int64)
        n = np.asarray(t.column("n"), dtype=np.int64)
        out = pa.table({id_column: t.column(id_column),
                        "pk": pa.array(k, pa.int64()),
                        "pcov": pa.array(k * n, pa.int64())})
        g = out.group_by(id_column).aggregate([("pk", "sum"), ("pcov", "sum")])
        return pa.table({id_column: g.column(id_column),
                         "pk": g.column("pk_sum"),
                         "pcov": g.column("pcov_sum")})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(id_column).aggregate([("pk", "sum"), ("pcov", "sum")])
        return pa.table({id_column: g.column(id_column),
                         "n_bigrams": g.column("pk_sum"),
                         "coverage": g.column("pcov_sum")})

    partials = joined.map_batches(partial, batch_format="pyarrow")
    return bucketed_combine(partials, id_column, combine, n_buckets)


# ------------------------------------------------------------------ TF-IDF

def doc_term_freq(docs, id_column: str = "doc_id",
                  text_column: str = "text"):
    """(doc_id, term, tf) thin rows, batch-local (one doc = one row)."""

    def explode(t: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for doc_id, text in zip(t.column(id_column).to_pylist(),
                                t.column(text_column).to_pylist()):
            c = Counter(_tokens(text))
            ids.extend([doc_id] * len(c))
            terms.extend(c.keys())
            tfs.extend(c.values())
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    return docs.select_columns([id_column, text_column]).map_batches(
        explode, batch_format="pyarrow"
    )


def term_doc_freq(tf_ds, n_buckets: int = 32):
    """(term, df) from the tf table: tf rows are unique per (doc, term), so
    df is a row count per term — per-batch partial + bucketed combine."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("term", "count")])
        return pa.table({"term": g.column("term"),
                         "partial": g.column("term_count")})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate([("partial", "sum")])
        return pa.table({"term": g.column("term"),
                         "df": g.column("partial_sum")})

    partials = tf_ds.select_columns(["term"]).map_batches(
        partial, batch_format="pyarrow")
    return bucketed_combine(partials, "term", combine, n_buckets)


def tfidf_top_terms(docs, k: int = 3, id_column: str = "doc_id",
                    text_column: str = "text", n_buckets: int = 32,
                    id_type: pa.DataType = None):
    """Per-document top-k distinctive terms: rank by (tf DESC, df ASC,
    term ASC) — highest-frequency-in-doc, rarest-in-corpus first.  This is
    the TF-IDF ordering with the idf log dropped (log is monotone in 1/df,
    so the RANKING is identical and stays integer-exact for the oracle).

    Plan: tf rows (batch-local) ⋈ df table on term (one bucketed join —
    the df table is vocabulary-sized, web vocabularies are corpus-shaped so
    no broadcast), then a per-doc top-k as one whole-bucket vectorized fold.
    Output: (doc_id, term, tf, df, rnk), rnk = 1..k.  ``id_type`` is the
    doc-id arrow type for the declared join schema (default int64 —
    string-id corpora must pass pa.string(), same contract as
    ``lm_coverage_scores``; ADVICE r3)."""
    tf = doc_term_freq(docs, id_column, text_column)
    df = term_doc_freq(tf, n_buckets)

    id_type = id_type or pa.int64()
    left_schema = pa.schema([(id_column, id_type),
                             ("term", pa.string()), ("tf", pa.int64())])
    right_schema = pa.schema([("term", pa.string()), ("df", pa.int64())])
    joined = partitioned_hash_join(
        tf, df, on="term", n_buckets=n_buckets,
        left_schema=left_schema, right_schema=right_schema,
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_column, "tf", "df", "term"],
                          ascending=[True, False, True, True],
                          kind="mergesort")
        g = g.groupby(id_column, sort=False).head(k).copy()
        g["rnk"] = g.groupby(id_column, sort=False).cumcount() + 1
        g["rnk"] = g["rnk"].astype("int64")
        return g[[id_column, "term", "tf", "df", "rnk"]]

    return bucketed_fold(joined, id_column, fold, n_buckets=n_buckets)


# ---------------------------------------------------------- inverted index

def inverted_index(docs, cap: int = 20, id_column: str = "doc_id",
                   text_column: str = "text", n_buckets: int = 32):
    """Posting-list build: per term, ``df`` (how many docs contain it) and
    ``postings`` = the first ``cap`` containing doc_ids ascending,
    comma-joined.  One bucketed exchange on term + whole-bucket vectorized
    fold; a hot term (stopword) concatenates at its own reducer and its
    output row is capped at ``cap`` ids, so reducer output is bounded even
    when df is corpus-sized."""
    tf = doc_term_freq(docs, id_column, text_column)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_column], kind="mergesort")
        out = g.groupby("term", sort=False).agg(
            df=(id_column, "size"),
            postings=(id_column,
                      lambda s: ",".join(str(x) for x in s.iloc[:cap])),
        )
        out["df"] = out["df"].astype("int64")
        return out.reset_index()

    return bucketed_fold(tf.select_columns(["term", id_column]), "term",
                         fold, n_buckets=n_buckets)


# ------------------------------------------------------------ BPE learning

END_WORD = "</w>"


def word_counts(docs, text_column: str = "text", n_buckets: int = 32):
    """(word, n) corpus word-frequency table — the input BPE trains on.
    Per-batch Counter partial + one bucketed combine; vocabulary-sized."""

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in t.column(text_column).to_pylist():
            c.update(_tokens(text))
        ks = list(c.keys())
        return pa.table({"w": pa.array(ks, pa.string()),
                         "partial": pa.array([c[k] for k in ks], pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("w").aggregate([("partial", "sum")])
        return pa.table({"w": g.column("w"), "n": g.column("partial_sum")})

    partials = docs.select_columns([text_column]).map_batches(
        partial, batch_format="pyarrow")
    return bucketed_combine(partials, "w", combine, n_buckets)


def _apply_merges(word: str, merges: list) -> list:
    """Segment a word into current BPE symbols: chars + END_WORD, then each
    learned merge applied in order (the standard greedy scheme)."""
    syms = list(word) + [END_WORD]
    for a, b in merges:
        i, out = 0, []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_pair_counts(wc, merges=None, n_buckets: int = 32):
    """(pair, cnt): adjacent-symbol pair counts over the word-frequency
    table under the current merge list, weighted by word frequency.  The
    word table is vocabulary-sized (shuffled once when built); each
    counting pass is embarrassingly parallel + one bucketed combine."""
    merges = list(merges or [])

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for w, n in zip(t.column("w").to_pylist(), t.column("n").to_pylist()):
            syms = _apply_merges(w, merges)
            for a, b in zip(syms, syms[1:]):
                c[a + " " + b] += n
        ks = list(c.keys())
        return pa.table({"pair": pa.array(ks, pa.string()),
                         "partial": pa.array([c[k] for k in ks], pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("pair").aggregate([("partial", "sum")])
        return pa.table({"pair": g.column("pair"),
                         "cnt": g.column("partial_sum")})

    partials = wc.map_batches(partial, batch_format="pyarrow")
    return bucketed_combine(partials, "pair", combine, n_buckets)


def bpe_learn(docs, n_merges: int = 5, text_column: str = "text",
              n_buckets: int = 32):
    """Distributed BPE tokenizer training: learn ``n_merges`` merges over
    the corpus.  Ties break deterministically (count DESC, pair ASC — the
    lexicographic rule, so output is reproducible across block orders).

    Plan: the corpus streams ONCE into a word-frequency table (one
    exchange, materialized — it is vocabulary-sized, the classic BPE
    training state); each merge iteration is one counting pass over that
    table + a top-1 sort.limit(1) (driver receives exactly one row per
    iteration).  The corpus itself is never re-read or re-shuffled.
    Returns a list of (left_sym, right_sym, count)."""
    wc = word_counts(docs, text_column, n_buckets).materialize()
    merges, learned = [], []
    for _ in range(n_merges):
        top = (bpe_pair_counts(wc, merges, n_buckets)
               .sort(["cnt", "pair"], descending=[True, False])
               .limit(1).take(1))
        if not top or int(top[0]["cnt"]) < 1:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b))
        learned.append((a, b, int(top[0]["cnt"])))
    return learned


# ------------------------------------------------------- term co-occurrence

def term_cooccurrence(docs, id_column: str = "doc_id",
                      text_column: str = "text", top_m: int = 20,
                      min_count: int = 2, n_buckets: int = 32):
    """Corpus-wide term co-occurrence counts — the raw statistic under PMI
    / word-association mining: for each document, the first ``top_m``
    DISTINCT terms in ALPHABETICAL order (a deterministic, SQL-replayable
    cap — C(top_m, 2) pairs per doc regardless of document size) generate
    unordered pairs (a < b), counted corpus-wide; pairs with count >=
    ``min_count`` survive.

    Plan: per-batch Counter partial (pairs per doc are bounded by the cap,
    so the partial is thin), ONE bucketed combine on the (a, b) tuple —
    the pair vocabulary is corpus-shaped, never broadcast or collected.
    Integer counts, hash-exact oracle."""
    from itertools import combinations

    from .aggregate import bucketed_fold

    def partial(t: pa.Table) -> pa.Table:
        counts = {}
        for text in t.column(text_column).to_pylist():
            terms = sorted(set(_tokens(text)))[:top_m]
            for a, b in combinations(terms, 2):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "pn": pa.array([], pa.int64())})
        ks = list(counts)
        return pa.table({"a": pa.array([k[0] for k in ks], pa.string()),
                         "b": pa.array([k[1] for k in ks], pa.string()),
                         "pn": pa.array([counts[k] for k in ks], pa.int64())})

    partials = docs.select_columns([text_column]).map_batches(
        partial, batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], sort=False)["pn"].sum().reset_index()
        out = out.rename(columns={"pn": "n"})
        out["n"] = out["n"].astype("int64")
        return out[out["n"] >= min_count]

    return bucketed_fold(partials, ["a", "b"], combine, n_buckets=n_buckets)


def bpe_encode(docs, merges, id_column: str = "doc_id",
               text_column: str = "text", preview_k: int = 8):
    """Apply a TRAINED BPE merge list to the corpus (the tokenize step
    that follows ``bpe_learn``): per document, the word count, encoded
    token count, and a preview of the first ``preview_k`` tokens.

    The merge list is the one side of this family that SHOULD broadcast —
    a tokenizer model is KBs while the corpus is TBs — so it ships once
    via ``ray.put`` and the corpus never shuffles (this stage is
    embarrassingly parallel).  Within a batch, encodings are cached per
    DISTINCT word (Zipf: a few thousand distinct words cover almost all
    occurrences), so the merge scan runs per distinct word, not per
    token."""
    merges = [(a, b) for a, b, *_ in merges]
    merges_ref = ray.put(merges)

    def encode(t: pa.Table) -> pa.Table:
        mg = ray.get(merges_ref)
        cache: dict = {}
        ids, n_words, n_tokens, previews = [], [], [], []
        for doc_id, text in zip(t.column(id_column).to_pylist(),
                                t.column(text_column).to_pylist()):
            words = _tokens(text)
            total = 0
            head: list = []
            for w in words:
                syms = cache.get(w)
                if syms is None:
                    syms = _apply_merges(w, mg)
                    cache[w] = syms
                total += len(syms)
                if len(head) < preview_k:
                    head.extend(syms[:preview_k - len(head)])
            ids.append(doc_id)
            n_words.append(len(words))
            n_tokens.append(total)
            previews.append(" ".join(head))
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "n_words": pa.array(n_words, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "preview": pa.array(previews, pa.string()),
        })

    return docs.select_columns([id_column, text_column]).map_batches(
        encode, batch_format="pyarrow")


# --------------------------------------------------- PMI pair association

def pmi_pair_stats(docs, id_column: str = "doc_id",
                   text_column: str = "text", top_m: int = 20,
                   min_count: int = 2, n_buckets: int = 32,
                   n_partitions: int = 16):
    """Pointwise-mutual-information INPUTS for term-pair association
    mining: every surviving co-occurrence pair joined with both terms'
    document frequencies — (a, b, n_pair, df_a, df_b, n_docs).  PMI itself
    is log(n_pair * n_docs / (df_a * df_b)); the log is MONOTONE in the
    integer ratio, so ranking/thresholding works on these integers and the
    output stays hash-exact (the family contract: counts, never floats).

    Both statistics use the SAME per-doc cap (the first ``top_m`` DISTINCT
    terms in alphabetical order — ``term_cooccurrence``'s deterministic,
    SQL-replayable cap), so df is the number of docs whose CAPPED set
    contains the term and the PMI probabilities are mutually consistent.

    Plan: pair counts ride ``term_cooccurrence`` (Counter partials, one
    bucketed combine); df counts are a second thin partial + combine; the
    vocab-shaped df table then attaches to the pair table by TWO
    distributed hash joins (never broadcast — vocabulary is corpus-shaped
    at 100 TB).  n_docs rides a count() metadata pass, the one scalar
    allowed to the driver."""
    from ..util import materialize_compact

    # Both thin tables (pair counts, df counts) feed join exchanges whose
    # fixed cost scales with input block count; materialize-and-defragment
    # them so the joins see a handful of dense blocks instead of the
    # fold's fan-out (measured 8.6 s -> ~3 s at sf0.1/32 cpus).  Both are
    # vocabulary-shaped, so the compaction is metadata-cheap at scale.
    pairs = materialize_compact(
        term_cooccurrence(docs, id_column, text_column, top_m=top_m,
                          min_count=min_count, n_buckets=n_buckets))

    def df_partial(t: pa.Table) -> pa.Table:
        counts = Counter()
        for text in t.column(text_column).to_pylist():
            counts.update(sorted(set(_tokens(text)))[:top_m])
        return pa.table({
            "term": pa.array(list(counts.keys()), pa.string()),
            "dn": pa.array(list(counts.values()), pa.int64()),
        })

    partials = docs.select_columns([text_column]).map_batches(
        df_partial, batch_format="pyarrow")

    def df_combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", sort=False)["dn"].sum().reset_index()
        out = out.rename(columns={"dn": "df"})
        out["df"] = out["df"].astype("int64")
        return out

    df_tbl = materialize_compact(
        bucketed_fold(partials, "term", df_combine, n_buckets=n_buckets))
    n_docs = docs.count()

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("n", pa.int64())])

    j1 = partitioned_hash_join(
        pairs, df_tbl.map_batches(
            lambda t: pa.table({"a": t.column("term"), "df_a": t.column("df")}),
            batch_format="pyarrow"),
        on="a", n_buckets=n_partitions,
        left_schema=pair_schema,
        right_schema=pa.schema([("a", pa.string()), ("df_a", pa.int64())]))
    j2 = partitioned_hash_join(
        j1, df_tbl.map_batches(
            lambda t: pa.table({"b": t.column("term"), "df_b": t.column("df")}),
            batch_format="pyarrow"),
        on="b", n_buckets=n_partitions,
        left_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                               ("n", pa.int64()), ("df_a", pa.int64())]),
        right_schema=pa.schema([("b", pa.string()), ("df_b", pa.int64())]))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": t.column("a"),
            "b": t.column("b"),
            "n_pair": pa.compute.cast(t.column("n"), pa.int64()),
            "df_a": pa.compute.cast(t.column("df_a"), pa.int64()),
            "df_b": pa.compute.cast(t.column("df_b"), pa.int64()),
            "n_docs": pa.array([int(n_docs)] * t.num_rows, pa.int64()),
        })

    return j2.map_batches(finish, batch_format="pyarrow")


def index_delta(new_docs, old_docs, id_column: str = "doc_id",
                text_column: str = "text", n_buckets: int = 32):
    """Incremental inverted-index maintenance: for a re-crawled corpus,
    the terms whose POSTING LISTS changed — (term, n_added, n_removed)
    with n_added = docs that now contain the term and didn't before,
    n_removed = the reverse.  Unchanged terms are absent, so the output
    is delta-sized (a refresh touching 1% of docs yields a ~1% table),
    which is the point: the full index is never rebuilt or collected.

    Plan: both sides explode to DISTINCT (term, doc, side) rows inside
    map_batches (side is a 1/2 bit), then ONE bucketed fold on term sums
    the side bits per (term, doc) — 1 = added, 2 = removed, 3 = unchanged
    — and counts per term.  Term-complete buckets make the diff exact;
    only changed terms leave the fold."""
    import pyarrow as pa

    def explode(side: int):
        def f(t: pa.Table) -> pa.Table:
            terms, docs = [], []
            for doc_id, text in zip(t.column(id_column).to_pylist(),
                                    t.column(text_column).to_pylist()):
                for term in set(_tokens(text)):
                    terms.append(term)
                    docs.append(doc_id)
            return pa.table({
                "term": pa.array(terms, pa.string()),
                "doc": pa.array(docs, type=t.column(id_column).type),
                "side": pa.array([side] * len(terms), pa.int8()),
            })

        return f

    rows = new_docs.select_columns([id_column, text_column]).map_batches(
        explode(1), batch_format="pyarrow").union(
        old_docs.select_columns([id_column, text_column]).map_batches(
            explode(2), batch_format="pyarrow"))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["term", "doc", "side"])
        s = d.groupby(["term", "doc"], sort=False)["side"].sum()
        flags = s.reset_index()
        flags["added"] = (flags["side"] == 1).astype("int64")
        flags["removed"] = (flags["side"] == 2).astype("int64")
        out = flags.groupby("term", sort=False)[["added", "removed"]] \
                   .sum().reset_index()
        out = out[(out["added"] > 0) | (out["removed"] > 0)]
        return out.rename(columns={"added": "n_added",
                                   "removed": "n_removed"}) \
                  .astype({"n_added": "int64", "n_removed": "int64"})

    return bucketed_fold(rows, "term", fold, n_buckets=n_buckets)


# -------------------------------------------------- centroid classification

def centroid_classify(train_docs, test_docs, label_col: str = "label",
                      id_column: str = "doc_id", text_column: str = "text",
                      n_buckets: int = 32, id_type: pa.DataType = None):
    """Integer-exact Rocchio / nearest-centroid text classifier — the
    fastText-shaped "train a linear model over the corpus, score every
    document" stage of a quality-classifier pipeline, without floats:

      train:  centroid(label) = per-label term-occurrence counts
              (term, label, w) — per-batch Counter partials, ONE bucketed
              combine on ``term`` (the model is vocabulary-shaped, i.e.
              corpus-shaped at web scale, so it is NEVER broadcast);
      apply:  per-test-doc term frequencies join the centroid table on
              ``term`` (one bucketed hash join), score(doc, label) =
              sum_t tf(doc,t) * w(label,t) — the unnormalized dot product
              with the label centroid, an int64;
      argmax: per-doc best label, ties broken by smallest label string —
              fully deterministic, hash-exact in SQL.

    Documents whose tokens never appear in any centroid (or with no
    tokens) drop out, mirroring the SQL inner join.  Returns
    (doc_id, true_label, pred_label, score).

    The reference's classification stages are per-document model calls
    (``/root/reference/cv_doclayout_extractor.py:107-124`` zero-shot);
    this is the corpus-trained distributed sibling."""
    id_type = id_type or pa.int64()

    def cent_partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for lab, text in zip(t.column(label_col).to_pylist(),
                             t.column(text_column).to_pylist()):
            for tok in _tokens(text):
                c[(tok, lab)] += 1
        keys = list(c.keys())
        return pa.table({
            "term": pa.array([k[0] for k in keys], pa.string()),
            "label": pa.array([k[1] for k in keys], pa.string()),
            "w": pa.array([c[k] for k in keys], pa.int64()),
        })

    def cent_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["term", "label"]).aggregate([("w", "sum")])
        return pa.table({"term": g.column("term"),
                         "label": g.column("label"),
                         "w": g.column("w_sum")})

    centroids = bucketed_combine(
        train_docs.select_columns([label_col, text_column]).map_batches(
            cent_partial, batch_format="pyarrow"),
        "term", cent_combine, n_buckets)

    def tf_explode(t: pa.Table) -> pa.Table:
        ids, labs, terms, ks = [], [], [], []
        for doc_id, lab, text in zip(t.column(id_column).to_pylist(),
                                     t.column(label_col).to_pylist(),
                                     t.column(text_column).to_pylist()):
            c = Counter(_tokens(text))
            ids.extend([doc_id] * len(c))
            labs.extend([lab] * len(c))
            terms.extend(c.keys())
            ks.extend(c.values())
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "true_label": pa.array(labs, pa.string()),
            "term": pa.array(terms, pa.string()),
            "k": pa.array(ks, pa.int64()),
        })

    tf = test_docs.select_columns([id_column, label_col, text_column]) \
        .map_batches(tf_explode, batch_format="pyarrow")

    left_schema = pa.schema([(id_column, id_type),
                             ("true_label", pa.string()),
                             ("term", pa.string()), ("k", pa.int64())])
    right_schema = pa.schema([("term", pa.string()),
                              ("label", pa.string()), ("w", pa.int64())])
    joined = partitioned_hash_join(
        tf, centroids, on="term", n_buckets=n_buckets,
        left_schema=left_schema, right_schema=right_schema)

    def score_partial(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column("k"), dtype=np.int64)
        w = np.asarray(t.column("w"), dtype=np.int64)
        out = pa.table({id_column: t.column(id_column),
                        "true_label": t.column("true_label"),
                        "label": t.column("label"),
                        "ps": pa.array(k * w, pa.int64())})
        g = out.group_by([id_column, "true_label", "label"]).aggregate(
            [("ps", "sum")])
        return pa.table({id_column: g.column(id_column),
                         "true_label": g.column("true_label"),
                         "label": g.column("label"),
                         "ps": g.column("ps_sum")})

    def argmax_combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        s = df.groupby([id_column, "true_label", "label"], sort=False)["ps"] \
              .sum().reset_index()
        s = s.sort_values(["ps", "label"], ascending=[False, True],
                          kind="mergesort")
        best = s.drop_duplicates([id_column]).rename(
            columns={"label": "pred_label", "ps": "score"})
        return pa.Table.from_pandas(
            best[[id_column, "true_label", "pred_label", "score"]],
            preserve_index=False)

    return bucketed_combine(
        joined.map_batches(score_partial, batch_format="pyarrow"),
        id_column, argmax_combine, n_buckets)


# --------------------------------------------------- feature hashing

def feature_hashing(docs, d: int = 256, id_column: str = "doc_id",
                    text_column: str = "text"):
    """The HASHING TRICK featurizer (fastText/Vowpal-Wabbit input layer):
    each document becomes a sparse signed-count vector of dimension ``d``
    — feat = md5_u64(term) % d, sign = bit 32 of the same hash, value =
    Σ tf·sign over the terms colliding into the slot.  No vocabulary
    table, no exchange: a document is one row, so the featurizer is
    embarrassingly parallel (zero shuffles) and the dimension is fixed at
    plan time regardless of corpus vocabulary — the property that makes
    it THE text-features op at 100 TB.

    md5_u64 == DuckDB ``md5_number_lower``, so the registered query is
    hash-exact end to end.  Emits nonzero (doc_id, feat, val) long rows.
    """
    from ..functions.textstats import md5_u64

    def explode(t: pa.Table) -> pa.Table:
        ids, feats, vals = [], [], []
        for doc_id, text in zip(t.column(id_column).to_pylist(),
                                t.column(text_column).to_pylist()):
            acc: dict = {}
            for term, tf in Counter(_tokens(text)).items():
                h = md5_u64(term)
                sign = 1 if ((h >> 32) & 1) == 0 else -1
                slot = h % d
                acc[slot] = acc.get(slot, 0) + tf * sign
            for slot, v in acc.items():
                if v != 0:
                    ids.append(doc_id)
                    feats.append(slot)
                    vals.append(v)
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "feat": pa.array(feats, pa.int64()),
            "val": pa.array(vals, pa.int64()),
        })

    return docs.select_columns([id_column, text_column]).map_batches(
        explode, batch_format="pyarrow")


def simpson_diversity(docs, group_col: str = "source",
                      text_column: str = "text", n_buckets: int = 32):
    """Per-group lexical concentration as EXACT INTEGER sufficient
    statistics: token total, distinct-term count and sum of squared term
    counts — the Simpson/Herfindahl index numerator (sum c^2 / N^2), the
    repetitiveness signal corpus curation uses to flag template-generated
    sources (a boilerplate farm concentrates mass on few terms; diverse
    prose spreads it).  No floats: the index is monotone in sum_sq at
    fixed N, so consumers can rank and threshold on the integers.

    Plan: per-batch (group, term) Counter partials, ONE bucketed tuple
    combine to exact per-(group, term) counts, then each combined bucket
    emits fixed-width per-group partial sums (sum c, sum c^2, count)
    that a tiny group-keyed combine folds — the term vocabulary never
    re-shuffles and never reaches the driver."""
    from .aggregate import bucketed_fold

    def partial(t: pa.Table) -> pa.Table:
        counts = {}
        groups = t.column(group_col).to_pylist()
        texts = t.column(text_column).to_pylist()
        for g, text in zip(groups, texts):
            for tok in _tokens(text):
                counts[(g, tok)] = counts.get((g, tok), 0) + 1
        ks = list(counts)
        return pa.table({
            group_col: pa.array([k[0] for k in ks], pa.string()),
            "term": pa.array([k[1] for k in ks], pa.string()),
            "pn": pa.array([counts[k] for k in ks], pa.int64())})

    partials = docs.select_columns([group_col, text_column]).map_batches(
        partial, batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby([group_col, "term"], sort=False)["pn"].sum()
        c = c.reset_index(name="n")
        n = c["n"].to_numpy().astype(np.int64)
        out = pd.DataFrame({group_col: c[group_col], "pt": n,
                            "psq": n * n,
                            "pd": np.ones(len(c), np.int64)})
        return (out.groupby(group_col, sort=False)
                .agg(pt=("pt", "sum"), psq=("psq", "sum"),
                     pd_=("pd", "sum")).reset_index())

    per_bucket = bucketed_fold(partials, [group_col, "term"], combine,
                               n_buckets=n_buckets)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(group_col, sort=False)
               .agg(n_tokens=("pt", "sum"), sum_sq=("psq", "sum"),
                    n_distinct=("pd_", "sum")).reset_index())
        for c in ("n_tokens", "n_distinct", "sum_sq"):
            out[c] = out[c].astype("int64")
        return out[[group_col, "n_tokens", "n_distinct", "sum_sq"]]

    return bucketed_fold(per_bucket, group_col, final, n_buckets=4)


def vocab_overlap(docs, group_col: str = "source",
                  text_column: str = "text", n_buckets: int = 32):
    """Pairwise vocabulary overlap between groups: for every group pair
    (a < b), |Va ∩ Vb|, |Va|, |Vb| and |Va ∪ Vb| as exact integers — the
    Jaccard corpus-similarity matrix curation uses to spot mirrored /
    re-crawled sources before mixing them into training data.

    Plan: per-batch DISTINCT (group, term) partials, ONE bucketed
    exchange on term whose fold re-distincts and emits per-term group
    PAIRS (diagonal included — it carries the vocab sizes); the pair
    table is #groups^2-bounded, so the final fold runs on one block.
    Contract: #groups is small (sources, langs, shards — not users)."""
    from .aggregate import bucketed_fold

    def partial(t: pa.Table) -> pa.Table:
        seen = set()
        groups = t.column(group_col).to_pylist()
        texts = t.column(text_column).to_pylist()
        for g, text in zip(groups, texts):
            for tok in set(_tokens(text)):
                seen.add((g, tok))
        ks = list(seen)
        return pa.table({
            group_col: pa.array([k[0] for k in ks], pa.string()),
            "term": pa.array([k[1] for k in ks], pa.string())})

    partials = docs.select_columns([group_col, text_column]).map_batches(
        partial, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g.drop_duplicates([group_col, "term"])
        j = m.merge(m, on="term", suffixes=("_a", "_b"))
        j = j[j[f"{group_col}_a"] <= j[f"{group_col}_b"]]
        out = (j.groupby([f"{group_col}_a", f"{group_col}_b"], sort=False)
               .size().reset_index(name="pn"))
        out["pn"] = out["pn"].astype("int64")
        return out

    pair_partials = bucketed_fold(partials, "term", pairs,
                                  n_buckets=n_buckets)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        a, b = f"{group_col}_a", f"{group_col}_b"
        c = g.groupby([a, b], sort=False)["pn"].sum().reset_index(name="n")
        sizes = dict(zip(c.loc[c[a] == c[b], a],
                         c.loc[c[a] == c[b], "n"].astype(int)))
        off = c[c[a] != c[b]].copy()
        off["n_common"] = off["n"].astype("int64")
        off["n_a"] = off[a].map(sizes).astype("int64")
        off["n_b"] = off[b].map(sizes).astype("int64")
        off["n_union"] = off["n_a"] + off["n_b"] - off["n_common"]
        out = off.rename(columns={a: "source_a", b: "source_b"})
        return out[["source_a", "source_b", "n_common", "n_a", "n_b",
                    "n_union"]]

    return pair_partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None)


def vocab_coverage(docs, sizes=(100, 1000, 10000),
                   text_column: str = "text", n_buckets: int = 32):
    """Vocabulary coverage curve: for each candidate vocab size K, how
    many corpus TOKENS are covered by the top-K terms by frequency
    (ties broken alphabetically) — the tokenizer-budget / OOV-rate
    curve that decides how large a wordpiece vocab a corpus needs.
    Exact integers: (vocab_size, covered_tokens, total_tokens).

    Plan: per-batch term-count partials, one bucketed combine to exact
    term counts, a GLOBAL row number over (count DESC, term) — the
    one-sort-plus-block-offsets pattern, driver holds one row per
    block — then fixed-width per-batch partial sums per K (|sizes|
    rows per batch) and a single-block final fold."""
    from .aggregate import bucketed_fold
    from .windows import global_row_number

    sizes = sorted(sizes)

    def partial(t: pa.Table) -> pa.Table:
        counts = {}
        for text in t.column(text_column).to_pylist():
            for tok in _tokens(text):
                counts[tok] = counts.get(tok, 0) + 1
        ks = list(counts)
        return pa.table({"term": pa.array(ks, pa.string()),
                         "pn": pa.array([counts[k] for k in ks],
                                        pa.int64())})

    partials = docs.select_columns([text_column]).map_batches(
        partial, batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("term", sort=False)["pn"].sum() \
            .reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    tf = bucketed_fold(partials, "term", combine, n_buckets=n_buckets)
    ranked = global_row_number(tf, ["n", "term"],
                               descending=[True, False],
                               out_column="rank")

    def cover_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        r = np.asarray(pc.cast(t.column("rank"), pa.int64()))
        n = np.asarray(pc.cast(t.column("n"), pa.int64()))
        rows = {"vocab_size": [], "pc_": [], "pt": []}
        for k in sizes:
            rows["vocab_size"].append(k)
            rows["pc_"].append(int(n[r <= k].sum()))
            rows["pt"].append(int(n.sum()))
        return pa.table({c: pa.array(v, pa.int64())
                         for c, v in rows.items()})

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by("vocab_size").aggregate(
            [("pc_", "sum"), ("pt", "sum")])
        out = pa.table({
            "vocab_size": g.column("vocab_size"),
            "covered_tokens": g.column("pc__sum"),
            "total_tokens": g.column("pt_sum")})
        return out

    return ranked.map_batches(cover_partial, batch_format="pyarrow") \
        .repartition(1).map_batches(final, batch_format="pyarrow",
                                    batch_size=None)


def vocab_growth(docs, id_max: int, group_col: str = "source",
                 id_column: str = "doc_id", text_column: str = "text",
                 n_checkpoints: int = 4, n_buckets: int = 32):
    """Heaps-law vocabulary-growth curve per group: cumulative distinct-
    term counts at ``n_checkpoints`` equal id-range checkpoints — the
    "is this source's vocabulary saturating or still growing" corpus
    statistic (sublinear growth = templated/repetitive source; the
    flattening point sizes tokenizer vocab budgets).

    A term's checkpoint is where it FIRST occurs: checkpoint =
    first_id * n_checkpoints // (id_max + 1).  Plan: per-batch
    (group, term) min-id partials (term strings ride the exchange
    once), ONE (group, term)-bucketed min fold that collapses straight
    to (group, checkpoint) counts — output is O(groups x checkpoints)
    — then one tiny group-keyed cumsum fold.  Same tokenizer as the
    whole lexicon family (``[a-z0-9]+`` on lowered text, DuckDB-RE2
    replayable)."""
    import pandas as pd

    from .aggregate import bucketed_fold

    def partial(t: pa.Table) -> pa.Table:
        gs, ws, ids = [], [], []
        for g, doc_id, text in zip(t.column(group_col).to_pylist(),
                                   t.column(id_column).to_pylist(),
                                   t.column(text_column).to_pylist()):
            for w in set(_tokens(text)):
                gs.append(g)
                ws.append(w)
                ids.append(doc_id)
        df = pd.DataFrame({"g": gs, "term": ws, "fid": ids})
        df = df.groupby(["g", "term"], sort=False, as_index=False)["fid"] \
            .min()
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = docs.select_columns(
        [group_col, id_column, text_column]).map_batches(
        partial, batch_format="pyarrow")

    def first_fold(g: pd.DataFrame) -> pd.DataFrame:
        f = g.groupby(["g", "term"], sort=False, as_index=False)["fid"].min()
        f["checkpoint"] = (f["fid"].to_numpy().astype(np.int64)
                           * n_checkpoints // (id_max + 1))
        out = f.groupby(["g", "checkpoint"], sort=False).size() \
            .reset_index(name="pn")
        out["pn"] = out["pn"].astype("int64")
        return out

    counts = bucketed_fold(partials, ["g", "term"], first_fold,
                           n_buckets=n_buckets)

    def cum_fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["g", "checkpoint"], sort=False, as_index=False)["pn"] \
            .sum().sort_values(["g", "checkpoint"], kind="mergesort")
        c["vocab_size"] = c.groupby("g", sort=False)["pn"].cumsum() \
            .astype("int64")
        out = c.rename(columns={"g": group_col})
        out["checkpoint"] = out["checkpoint"].astype("int64")
        return out[[group_col, "checkpoint", "vocab_size"]]

    return bucketed_fold(counts, "g", cum_fold, n_buckets=4)


# ----------------------------------------------------------- phrase search

def phrase_match(docs, phrase, id_column: str = "doc_id",
                 text_column: str = "text", n_buckets: int = 32):
    """Positional phrase search over the corpus: per-document count of
    EXACT k-term phrase occurrences (consecutive token positions), the
    query an inverted positional index answers without re-reading text.

    Plan mirrors index-side search: the explode emits ONLY postings for
    the phrase's terms (term-filter pushdown — the wire carries a thin
    ``(doc, adjusted_pos, slot)`` stream, not the tokenized corpus), each
    posting pre-shifted by its phrase slot so a complete occurrence is
    simply "all k slots present at one adjusted position".  One
    doc-bucketed exchange, then a whole-bucket vectorized fold: nunique
    slots per (doc, adj) == k marks a hit — no per-position loops, no
    per-doc Python.  Repeated terms in the phrase are handled by
    emitting one posting per slot the term occupies.

    Output: ``(id, n_matches)`` for documents with >= 1 occurrence.
    Overlapping occurrences each count (the sliding-window convention the
    SQL oracle replays)."""
    terms = [t.lower() for t in phrase]
    k = len(terms)
    slot_of: dict = {}
    for i, t in enumerate(terms):
        slot_of.setdefault(t, []).append(i)

    def explode(t: pa.Table) -> pa.Table:
        ids, adj, slot = [], [], []
        for d, txt in zip(t.column(id_column).to_pylist(),
                          t.column(text_column).to_pylist()):
            for p, w in enumerate(_tokens(txt)):
                for s in slot_of.get(w, ()):
                    ids.append(d)
                    adj.append(p - s)
                    slot.append(s)
        return pa.table({id_column: pa.array(ids, pa.int64()),
                         "adj": pa.array(adj, pa.int64()),
                         "slot": pa.array(slot, pa.int32())})

    postings = docs.select_columns([id_column, text_column]) \
        .map_batches(explode, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({id_column: pd.Series(dtype="int64"),
                                 "n_matches": pd.Series(dtype="int64")})
        per_pos = g.groupby([id_column, "adj"], sort=False)["slot"].nunique()
        hits = per_pos[per_pos == k].reset_index()
        out = hits.groupby(id_column, sort=False).size() \
            .reset_index(name="n_matches")
        out["n_matches"] = out["n_matches"].astype("int64")
        return out[[id_column, "n_matches"]]

    return bucketed_fold(postings, id_column, fold, n_buckets=n_buckets)


# ------------------------------------------------------- skip-gram pairs

def skipgram_pairs(docs, window: int = 2, min_count: int = 2,
                   text_column: str = "text", n_buckets: int = 32):
    """Word2vec-style skip-gram TRAINING-PAIR generation: for every token
    position i, the directional (center, context) pairs for every context
    position j in [i-window, i+window], j != i, counted corpus-wide; pairs
    with count >= ``min_count`` survive.  The positional sibling of
    ``term_cooccurrence`` (which caps per-doc DISTINCT terms alphabetically
    and counts each unordered pair once per doc): here every OCCURRENCE
    contributes, roles are ordered (center vs context), and adjacency is
    positional — the statistic embedding trainers actually consume.

    Plan: per-batch Counter partial (each window offset d is one
    ``zip(w, w[d:])`` sweep — both directions ride the same sweep, so the
    per-doc work is O(len * window) with no materialized pair list), ONE
    bucketed exchange on the (center, context) tuple.  The pair vocabulary
    is corpus-shaped — never broadcast, never collected.  Integer counts,
    hash-exact oracle (DuckDB list-slice window replay)."""
    from .aggregate import bucketed_fold

    def partial(t: pa.Table) -> pa.Table:
        counts: dict = {}
        for text in t.column(text_column).to_pylist():
            w = _tokens(text)
            for d in range(1, window + 1):
                for a, b in zip(w, w[d:]):
                    counts[(a, b)] = counts.get((a, b), 0) + 1
                    counts[(b, a)] = counts.get((b, a), 0) + 1
        ks = list(counts)
        return pa.table({
            "center": pa.array([k[0] for k in ks], pa.string()),
            "context": pa.array([k[1] for k in ks], pa.string()),
            "pn": pa.array([counts[k] for k in ks], pa.int64())})

    partials = docs.select_columns([text_column]).map_batches(
        partial, batch_format="pyarrow")

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["center", "context"], sort=False)["pn"].sum() \
            .reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out[out["n"] >= min_count]

    return bucketed_fold(partials, ["center", "context"], combine,
                         n_buckets=n_buckets)


# ------------------------------------------------------ TextRank keywords

def textrank_keywords(docs, window: int = 2, min_count: int = 2, k: int = 20,
                      n_iters: int = 3, text_column: str = "text",
                      n_buckets: int = 32, scale: str = "local"):
    """TextRank keyword extraction (Mihalcea & Tarau 2004) as a
    composition of this engine's primitives: the corpus-wide skip-gram
    pair table IS the word co-occurrence graph (``skipgram_pairs`` counts
    both directions per occurrence, so the surviving edge set is
    symmetric and every node appears as a src), integer fixed-point
    PageRank (the ``pagerank_int`` arithmetic: SCALE=1e12 floor
    divisions) ranks the terms, and the global top-``k`` by
    (rank DESC, term ASC) is the keyword list.

    ``scale="local"`` (default): the corpus-sized work is the pair
    counting — ONE bucketed exchange — and the graph itself is
    VOCABULARY-bounded (model-shaped, like the BPE/TF-IDF tables: ~1e6
    terms / ~1e8 surviving edges even at 100 TB), so the PR fixpoint
    runs in a single task over the funneled pair table (the kcore/SCC
    local-finish pattern; measured 35 s -> ~6 s at sf0.1).  No driver
    collection — the fold IS a task.  ``scale="distributed"`` keeps the
    per-iteration exchange plan (``pagerank_int`` over md5-52bit term
    node ids — float53-safe: Ray's sort merge promotes int64 blocks to
    double when a pandas fold NaN-pads, and ids past 2^53 fail that
    cast) for graphs too large for one task; both plans produce
    IDENTICAL integers (equivalence-tested)."""
    pairs = skipgram_pairs(docs, window=window, min_count=min_count,
                           text_column=text_column,
                           n_buckets=n_buckets)

    if scale == "local":
        def pr_local(t: pa.Table) -> pa.Table:
            a = t.column("center").to_pylist()
            b = t.column("context").to_pylist()
            if not a:
                return pa.table({"term": pa.array([], pa.string()),
                                 "rank": pa.array([], pa.int64())})
            terms = sorted(set(a))
            idx = {v: i for i, v in enumerate(terms)}
            src = np.fromiter((idx[x] for x in a), np.int64, len(a))
            dst = np.fromiter((idx[x] for x in b), np.int64, len(b))
            n = len(terms)
            SCALE = 10 ** 12
            outd = np.bincount(src, minlength=n).astype(np.int64)
            tele = (SCALE - 85 * SCALE // 100) // n
            rank = np.full(n, SCALE // n, np.int64)
            for _ in range(n_iters):
                s = np.bincount(dst, weights=(rank[src] // outd[src])
                                .astype(np.float64), minlength=n)
                # bincount sums in float64: exact only below 2^53 —
                # shares are <= SCALE=1e12 and degrees bound the addend
                # count, so the sum stays far inside the exact range;
                # assert instead of silently rounding.
                assert s.max() < 2 ** 53
                rank = tele + (85 * s.astype(np.int64)) // 100
            order = np.lexsort((np.array(terms), -rank))[:k]
            return pa.table({
                "term": pa.array([terms[i] for i in order], pa.string()),
                "rank": pa.array(rank[order], pa.int64())})

        return pairs.select_columns(["center", "context"]) \
            .repartition(1).map_batches(pr_local, batch_size=None,
                                        batch_format="pyarrow")

    from .graph import pagerank_int
    from .join import partitioned_hash_join

    from ..functions.textstats import md5_u64

    MOD = 1 << 52
    pairs = pairs.materialize()

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": pa.array([md5_u64(s) % MOD
                             for s in t.column("center").to_pylist()],
                            pa.int64()),
            "dst": pa.array([md5_u64(s) % MOD
                             for s in t.column("context").to_pylist()],
                            pa.int64())})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")

    def to_terms(t: pa.Table) -> pa.Table:
        terms = t.column("center").to_pylist()
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "node": pa.array([md5_u64(s) % MOD for s in terms],
                             pa.int64())})

    def dedup_terms(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("node")

    from .aggregate import bucketed_fold
    terms = bucketed_fold(pairs.map_batches(to_terms,
                                            batch_format="pyarrow"),
                          "node", dedup_terms, n_buckets=n_buckets)

    ranks = pagerank_int(edges, n_iters=n_iters, n_buckets=n_buckets)
    joined = partitioned_hash_join(
        terms, ranks, on="node", n_buckets=n_buckets,
        left_schema=pa.schema([("term", pa.string()),
                               ("node", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()),
                                ("rank", pa.int64())]))
    return joined.select_columns(["term", "rank"]) \
        .sort(["rank", "term"], descending=[True, False]).limit(k)


# --------------------------------------------------- posting compression

def posting_compression(docs, id_column: str = "doc_id",
                        text_column: str = "text", n_buckets: int = 32):
    """Inverted-index POSTING-LIST compression (the Lucene/IR storage
    layout): per term, the ascending doc-id posting list is delta-encoded
    (first id raw, then gaps) and LEB128-varint packed; output per term is
    ``df``, ``raw_bytes`` (8 bytes/id uncompressed) and ``packed_bytes``.
    The encoder REALLY packs bytes and self-checks a full decode
    round-trip inside the fold — a size formula alone can't drift from
    the codec.  One bucketed exchange on term (the inverted_index plan);
    per-term work is vectorized delta + byte-length arithmetic."""
    tf = doc_term_freq(docs, id_column, text_column)

    def encode(ids: np.ndarray) -> bytes:
        vals = np.concatenate([[ids[0]], np.diff(ids)])
        out = bytearray()
        for v in vals.tolist():
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)

    def decode(blob: bytes) -> np.ndarray:
        vals, cur, shift = [], 0, 0
        for b in blob:
            cur |= (b & 0x7F) << shift
            if b & 0x80:
                shift += 7
            else:
                vals.append(cur)
                cur, shift = 0, 0
        return np.cumsum(np.asarray(vals, dtype=np.int64))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_column], kind="mergesort")
        terms, dfs, raws, packs = [], [], [], []
        for term, s in g.groupby("term", sort=False)[id_column]:
            ids = s.to_numpy(dtype=np.int64)
            blob = encode(ids)
            back = decode(blob)
            if len(back) != len(ids) or (back != ids).any():
                raise AssertionError(
                    f"posting round-trip failed for term {term!r}")
            terms.append(term)
            dfs.append(len(ids))
            raws.append(8 * len(ids))
            packs.append(len(blob))
        return pd.DataFrame({
            "term": pd.Series(terms, dtype=g["term"].dtype),
            "df": pd.Series(dfs, dtype="int64"),
            "raw_bytes": pd.Series(raws, dtype="int64"),
            "packed_bytes": pd.Series(packs, dtype="int64"),
        })

    return bucketed_fold(tf.select_columns(["term", id_column]), "term",
                         fold, n_buckets=n_buckets)
