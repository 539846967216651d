"""Flagship pipeline: corpus -> main-content extraction -> fields -> sink.

Ray-Data-native restatement of the reference lifecycle (SURVEY.md §3.4):

    read_parquet(corpus)                          # or synthetic generation
      -> map_batches(HtmlExtractor actor pool)    # S2/M18 + L-analogues + M1-M13
      -> [resume anti-filter on committed buckets]
      -> write_bucketed(out)                      # S7 + checkpoint manifests
    driver: groupby("status").count() summary     # G3

No stage materializes the dataset; the streaming executor pipelines read,
extraction and write with backpressure.  Payload-heavy stages run with a small
``batch_size`` so one giant-HTML row cannot blow a worker heap
(SURVEY.md §7.5 item 2).
"""

from __future__ import annotations

import ray.data

from ..functions.html_extract import DEFAULT_CONFIG, ExtractConfig
from ..stages.extract import EXTRACTOR_VERSION, HtmlExtractor
from ..state import checkpoint as ckpt

# Payload stage sizing: HTML rows are KB-to-MB; 64 rows/batch keeps
# batch bytes bounded while amortizing per-batch overhead.
EXTRACT_BATCH_SIZE = 64


def extract_dataset(
    corpus: ray.data.Dataset,
    *,
    config: ExtractConfig = DEFAULT_CONFIG,
    n_buckets: int = 64,
    with_fields: bool = True,
    concurrency=None,
    batch_size: int = EXTRACT_BATCH_SIZE,
) -> ray.data.Dataset:
    """Attach the extraction stage (actor pool when ``concurrency`` given,
    elastic stateless tasks otherwise)."""
    from ..util import pool_size

    concurrency = pool_size(concurrency)
    return corpus.map_batches(
        HtmlExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            config=config, n_buckets=n_buckets, with_fields=with_fields
        ),
    )


def run_extraction_job(
    corpus: ray.data.Dataset,
    out_dir: str,
    *,
    run_id: str,
    input_path: str = "",
    n_buckets: int = 64,
    with_fields: bool = True,
    concurrency=None,
) -> dict:
    """End-to-end resumable job: extract -> skip committed buckets -> commit.

    Returns the commit summary; rerunning after a crash (or a no-op rerun)
    skips every committed bucket and converges to the same final table.
    """
    extracted = extract_dataset(
        corpus, n_buckets=n_buckets, with_fields=with_fields, concurrency=concurrency
    )
    resumed = extracted.map_batches(
        ckpt.make_resume_filter(out_dir), batch_format="pyarrow"
    )
    return ckpt.write_bucketed(
        resumed, out_dir, run_id=run_id, input_path=input_path,
        extractor_version=EXTRACTOR_VERSION,
    )


def status_summary(extracted: ray.data.Dataset):
    """G3 — the one true dataset-level aggregation of the reference
    (grid_detector_v4.py:410-415): success/failure accounting."""
    return extracted.groupby("status").count()
