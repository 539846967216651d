"""Text-analysis stage: language-ID, quality features, token counts,
fingerprint — one vectorized map_batches pass over a text column."""

from __future__ import annotations

import pyarrow as pa

from ..functions import textstats as T


class TextStats:
    """Actor-pool stage (profiles/regexes warm in __init__ via module import;
    cheap enough to also run as stateless tasks)."""

    def __init__(self, text_column: str = "text", with_fingerprint: bool = False):
        self.text_column = text_column
        self.with_fingerprint = with_fingerprint

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(self.text_column).to_pylist()]
        quality = [T.quality_score(t) for t in texts]
        batch = batch.append_column(
            "pred_lang", pa.array([T.detect_language(t) for t in texts], pa.string())
        )
        batch = batch.append_column(
            "n_tokens_ws", pa.array([T.count_tokens_ws(t) for t in texts], pa.int64())
        )
        batch = batch.append_column(
            "n_tokens_bpe", pa.array([T.count_tokens_bpe(t) for t in texts], pa.int64())
        )
        batch = batch.append_column(
            "punct_ratio", pa.array([q["punct_ratio"] for q in quality], pa.float64())
        )
        batch = batch.append_column(
            "stopword_ratio",
            pa.array([q["stopword_ratio"] for q in quality], pa.float64()),
        )
        batch = batch.append_column(
            "quality_score", pa.array([q["score"] for q in quality], pa.float64())
        )
        if self.with_fingerprint:
            batch = batch.append_column(
                "fingerprint",
                pa.array([T.fingerprint(t) for t in texts], pa.list_(pa.int64())),
            )
        return batch


def text_stats(ds, text_column: str = "text", concurrency: int = 8, **kw):
    from ..util import pool_size

    concurrency = pool_size(concurrency)
    return ds.map_batches(
        TextStats,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs=dict(text_column=text_column, **kw),
    )


def corpus_grep(ds, pattern: str, text_column: str = "text",
                id_column: str = "doc_id", max_matches: int = 1000):
    """Distributed corpus GREP: per document, the number of
    non-overlapping matches of ``pattern`` (compiled ONCE per task) and
    the 1-based offset of the first match (0 = no match).  Row-local —
    zero shuffles; emit only matching docs.

    ``max_matches`` caps the per-doc count (a pathological doc can't make
    its task enumerate millions of hits); the cap is part of the
    contract, mirrored in the SQL replay.  The inspection tool every
    corpus pipeline grows: leak checks, marker hunts, contamination
    spot-checks."""
    import re

    import pyarrow as pa

    rx = re.compile(pattern)

    def scan(t: pa.Table) -> pa.Table:
        ids, counts, firsts = [], [], []
        for did, txt in zip(t.column(id_column).to_pylist(),
                            t.column(text_column).to_pylist()):
            s = txt or ""
            n = 0
            first = 0
            for m in rx.finditer(s):
                if n == 0:
                    first = m.start() + 1
                n += 1
                if n >= max_matches:
                    break
            if n:
                ids.append(did)
                counts.append(n)
                firsts.append(first)
        return pa.table({
            id_column: pa.array(ids, t.column(id_column).type),
            "n_matches": pa.array(counts, pa.int64()),
            "first_at": pa.array(firsts, pa.int64()),
        })

    return ds.select_columns([id_column, text_column]).map_batches(
        scan, batch_format="pyarrow")


def compression_ratio(ds, text_column: str = "text",
                      id_column: str = "doc_id", level: int = 6):
    """Per-document zlib compression ratio — the Gopher-style
    repetitiveness signal (templated / machine-generated text compresses
    far below prose; near-random noise compresses above 1.0).  Emits
    (doc_id, raw_len, comp_len, ratio_e6) where ratio_e6 =
    comp_len * 10^6 // max(raw_len, 1) — integer fixed-point, floor.

    Row-local, zero shuffles; the per-row cost is one C zlib call.
    zlib output bytes are deterministic for a FIXED zlib build + level —
    stable within one cluster image, but NOT a cross-engine contract, so
    the registered query is rows-only (no SQL oracle) and the kernel is
    pinned by a local reference test instead."""
    import zlib

    import pyarrow as pa

    def scan(t: pa.Table) -> pa.Table:
        ids, raws, comps, ratios = [], [], [], []
        for did, txt in zip(t.column(id_column).to_pylist(),
                            t.column(text_column).to_pylist()):
            b = (txt or "").encode("utf-8")
            c = len(zlib.compress(b, level))
            ids.append(did)
            raws.append(len(b))
            comps.append(c)
            ratios.append(c * 1_000_000 // max(len(b), 1))
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "raw_len": pa.array(raws, pa.int64()),
            "comp_len": pa.array(comps, pa.int64()),
            "ratio_e6": pa.array(ratios, pa.int64()),
        })

    return ds.select_columns([id_column, text_column]).map_batches(
        scan, batch_format="pyarrow")


def lang_segments(ds, text_column: str = "text",
                  id_column: str = "doc_id"):
    """CCNet-style per-LINE language segmentation: split each document on
    newlines, language-ID every line with the stopword-profile detector,
    and collapse consecutive same-language lines into segments — the
    mixed-language document splitter (keep the English half, route the
    French half to the fr pipeline).  Row-local, zero shuffles.

    Returns (doc_id, seg_idx, lang, n_lines, n_chars) — n_chars counts
    the segment's line characters (newlines excluded)."""
    import pyarrow as pa

    from ..functions.textstats import detect_language

    def scan(t: pa.Table) -> pa.Table:
        ids, segs, langs, nls, ncs = [], [], [], [], []
        for did, text in zip(t.column(id_column).to_pylist(),
                             t.column(text_column).to_pylist()):
            lines = (text or "").split("\n")
            seg = -1
            prev = None
            for ln in lines:
                lang = detect_language(ln)
                if lang != prev:
                    seg += 1
                    ids.append(did)
                    segs.append(seg)
                    langs.append(lang)
                    nls.append(0)
                    ncs.append(0)
                    prev = lang
                nls[-1] += 1
                ncs[-1] += len(ln)
        return pa.table({
            id_column: pa.array(ids, t.schema.field(id_column).type),
            "seg_idx": pa.array(segs, pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_lines": pa.array(nls, pa.int64()),
            "n_chars": pa.array(ncs, pa.int64()),
        })

    return ds.select_columns([id_column, text_column]).map_batches(
        scan, batch_format="pyarrow")
