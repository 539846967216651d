"""Training-data pipeline composition: the engine's operators chained the way
a 100 TB corpus-preparation job would run them.

    corpus parquet
      -> main-content extraction (+ spans, fields)          [streaming tasks]
      -> quality gate (length / quality-score thresholds)   [vectorized filter]
      -> exact dedup (content hash, min-url wins)           [thin shuffle]
      -> near dedup (MinHash+LSH clusters, min-url wins)    [banded, defused]
      -> language filter (predicted language whitelist)     [vectorized]
      -> checkpointed Parquet sink

Every step is a Dataset transform; nothing materializes the corpus except the
documented MinHash sketch table.  Order matters: cheap row-local gates run
before any shuffle so the dedup exchanges see the smallest possible table
(the reference's cost-ladder principle, SURVEY.md §4.2, applied corpus-wide).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import textstats as T
from ..stages.dedup import minhash_dedup
from .extract_pipeline import extract_dataset


def quality_gate(ds, text_column: str = "extracted_text",
                 min_chars: int = 80, min_score: float = 0.25):
    """Length + quality-score thresholds (M17 guard style, corpus-wide)."""

    def gate(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        keep = []
        scores = []
        for t in texts:
            q = T.quality_score(t or "")
            scores.append(q["score"])
            keep.append(q["n_chars"] >= min_chars and q["score"] >= min_score)
        batch = batch.append_column("quality_score",
                                    pa.array(scores, pa.float64()))
        return batch.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(gate, batch_format="pyarrow")


def lang_gate(ds, allowed=("en",), lang_column: str = "pred_lang",
              text_column: str = "extracted_text"):
    def gate(batch: pa.Table) -> pa.Table:
        langs = [T.detect_language(t or "")
                 for t in batch.column(text_column).to_pylist()]
        batch = batch.append_column(lang_column, pa.array(langs, pa.string()))
        mask = pc.is_in(batch.column(lang_column),
                        value_set=pa.array(list(allowed)))
        return batch.filter(mask)

    return ds.map_batches(gate, batch_format="pyarrow")


def prepare_training_data(
    corpus,
    *,
    min_chars: int = 80,
    min_score: float = 0.25,
    langs=("en",),
    near_dedup: bool = True,
):
    """Compose the full pipeline; returns (Dataset, report dict).

    The report carries per-stage row counts (each count triggers execution of
    the shared lazy prefix; at production scale log counts from the sink's
    lineage manifests instead)."""
    report = {}
    extracted = extract_dataset(corpus, with_fields=True)
    extracted = extracted.filter(expr="status == 'ok'")
    gated = quality_gate(extracted, min_chars=min_chars, min_score=min_score)
    gated = lang_gate(gated, allowed=langs)

    deduped = exact_dedup_survivors(gated)
    if near_dedup:
        deduped, labels = minhash_dedup(deduped, "extracted_text", "url")
        report["near_dup_cluster_ids"] = len(labels)
    return deduped, report


def exact_dedup_survivors(ds):
    """Exact dedup keyed on extracted_text with url as the deterministic
    tie-break id.

    Survivor recovery is the co-partitioned shuffle plan (exact_dedup
    strategy='shuffle': groupby content_hash, keep min-url row) — the
    survivor set is ~corpus cardinality, so it must never be
    collected/broadcast from the driver; nested columns (field structs,
    span lists) rule out the arrow-join variant."""
    from ..stages.dedup import exact_dedup

    return exact_dedup(ds, "extracted_text", "url", strategy="shuffle")
