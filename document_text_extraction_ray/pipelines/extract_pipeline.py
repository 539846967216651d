"""Flagship pipeline: corpus -> main-content extraction -> fields -> sink.

Ray-Data-native restatement of the reference lifecycle (SURVEY.md §3.4):

    read_parquet(corpus)                          # or synthetic generation
      -> map_batches(extract_batch, pyarrow)      # S2/M18 + L-analogues + M1-M13
      -> checkpointed sink                        # S7 + lineage manifests
    driver: groupby("status").count() summary     # G3

Two resumable jobs, two partitioning strategies:
  * ``run_sharded_extraction_job`` — NO shuffle; commit unit = partition of
    input files (lineage: input file + row counts); resume prunes whole input
    files before the read.  The throughput flagship.
  * ``run_extraction_job`` — one shuffle on the url-hash ``bucket`` key;
    commit unit = bucket (hash-partitioned output layout for downstream
    bucket joins / dedup); resume filters rows by committed bucket.

No stage materializes the dataset; the streaming executor pipelines read,
extraction and write with backpressure — at the default batch_size=None the
whole chain FUSES into one read->extract->write operator per block (see
EXTRACT_BATCH_SIZE note).  Giant-HTML-payload corpora are defused at the
READ with ``target_block_mb`` (and, for actor stages, a small explicit
``batch_size``) so one giant row cannot blow a worker heap
(SURVEY.md §7.5 item 2).
"""

from __future__ import annotations

import os

import ray.data

from ..functions.html_extract import DEFAULT_CONFIG, ExtractConfig
from ..stages.extract import EXTRACTOR_VERSION, HtmlExtractor
from ..state import checkpoint as ckpt

# Payload stage sizing.  The stateless task path runs at batch_size=None
# (= whole blocks): ANY explicit batch_size inserts a re-batching boundary
# that BLOCKS Ray's read->map->write operator fusion — measured 18.0 s
# unfused vs 16.2 s fused for the 400k-page headline at 16 CPUs, with the
# fused plan a single `ReadParquet->MapBatches(extract_batch)->Write`
# operator (no separate read ramp).  Block size is already bounded by
# DataContext.target_max_block_size, and the giant-payload-row defusal
# lever is `target_block_mb` (read-level splitting), which composes with
# fusion.  The actor-pool path keeps an explicit batch size (256 measured
# 13% faster than 64 at 32 CPUs; ~0.4 MB/batch at ~1.5 KB/doc) — actor
# stages never fuse with the read anyway.
EXTRACT_BATCH_SIZE = 256


def extract_dataset(
    corpus: ray.data.Dataset,
    *,
    config: ExtractConfig = DEFAULT_CONFIG,
    n_buckets: int = 64,
    with_fields: bool = True,
    concurrency=None,
    batch_size: int | None = None,
    use_actors: bool = False,
) -> ray.data.Dataset:
    """Attach the extraction stage.

    Default: stateless task pool (the kernel has no load-once state; tasks
    skip actor spin-up and scale elastically).  ``use_actors=True`` switches
    to the warm actor-pool form — the right shape once the core loads real
    state (layout models, ML stages)."""
    import functools

    from ..stages.extract import extract_batch
    from ..util import pool_size

    if use_actors:
        return corpus.map_batches(
            HtmlExtractor,
            batch_format="pyarrow",
            batch_size=batch_size or EXTRACT_BATCH_SIZE,
            concurrency=pool_size(concurrency),
            fn_constructor_kwargs=dict(
                config=config, n_buckets=n_buckets, with_fields=with_fields
            ),
        )
    return corpus.map_batches(
        functools.partial(extract_batch, config=config, n_buckets=n_buckets,
                          with_fields=with_fields),
        batch_format="pyarrow",
        batch_size=batch_size,
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


def run_sharded_extraction_job(
    corpus_path: str,
    out_dir: str,
    *,
    run_id: str,
    files_per_partition: int = 8,
    n_buckets: int = 64,
    with_fields: bool = True,
    concurrency=None,
    max_concurrent_partitions: int = 2,
    blocks_per_cpu: int | None = None,
    skip_failed_partitions: bool = False,
    target_block_mb: int | None = None,
) -> dict:
    """No-shuffle resumable job: the commit unit is a PARTITION OF INPUT FILES
    (north-star lineage: input file + row counts), not a hash bucket.

    Extraction is embarrassingly parallel, so hash-partitioning the OUTPUT is
    pure shuffle cost; instead each partition of input files streams through
    read -> extract -> write and commits atomically.  Resume prunes committed
    partitions BEFORE the read — skipped input files are never opened (cheaper
    than any row filter).  Use ``write_bucketed`` instead when downstream
    needs hash-partitioned layout (e.g. bucket-join dedup).

    ``max_concurrent_partitions`` overlaps partition pipelines (each is its
    own Dataset execution driven from a thread) so the cluster never idles
    during a partition's commit tail.

    ``skip_failed_partitions``: a partition whose READ fails (corrupt file,
    truncated footer — row-level poison is already handled in-band by the
    extractor) is recorded in ``summary["failed"]`` and the job continues;
    the partition stays uncommitted, so a rerun retries exactly it.  Default
    False: fail fast (committed partitions are still resumable).

    ``target_block_mb``: payload-skew defusal.  Giant-page corpora (multi-MB
    html rows) packed into large row groups land in one ~128 MB block and
    pin one extract task while the cluster idles; a smaller target block
    (e.g. 8) makes the read emit fine-grained blocks so giant rows spread
    across tasks (measured 30.6 s -> 20.6 s on a 20x5.6 MB-row skew
    corpus).  Leaves the global DataContext as it found it — but the
    override mutates the PROCESS-GLOBAL DataContext for the guarded
    region's duration, so it assumes ONE extraction job per driver
    process: a second concurrent ``run_sharded_extraction_job`` (or any
    other Ray Data work on the same driver) would race on the override,
    and the finally-restore can clobber the other caller's setting.  Run
    concurrent jobs from separate driver processes, or leave
    ``target_block_mb=None``.
    """
    import glob as _glob
    import shutil
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from ray.data import DataContext

    from ..util import stabilize_fsspec_http

    stabilize_fsspec_http()

    files = sorted(_glob.glob(os.path.join(corpus_path, "*.parquet")))
    partitions = [
        files[i: i + files_per_partition]
        for i in range(0, len(files), files_per_partition)
    ]
    staging_root = os.path.join(out_dir, ckpt.STAGING_DIR)
    os.makedirs(os.path.join(out_dir, ckpt.MANIFEST_DIR), exist_ok=True)
    if os.path.isdir(staging_root):
        for stale in os.listdir(staging_root):
            shutil.rmtree(os.path.join(staging_root, stale), ignore_errors=True)

    done = ckpt.committed_parts(out_dir)
    summary = {"committed": 0, "skipped": 0, "rows": 0, "partitions": len(partitions)}

    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8

    def process(pid_chunk):
        pid, chunk = pid_chunk
        staged = os.path.join(staging_root, run_id, f"part={pid}")
        os.makedirs(staged, exist_ok=True)
        # Block-count: the default (no override) lets Ray's split heuristic
        # decide — 1 block per file on cpu-saturating partitions, which
        # keeps the whole chain FUSED into one read->extract->write
        # operator (an explicit override inserts SplitBlocks and unfuses;
        # measured slower at both 16 and 32 cpus).  Pass ``blocks_per_cpu``
        # only to force finer tasks on heavy-skew corpora (the 1% giant-
        # page tail pinning coarse tasks); ``target_block_mb`` is the
        # byte-level lever for the same problem.
        read_kw = {}
        if blocks_per_cpu:
            read_kw["override_num_blocks"] = max(len(chunk), blocks_per_cpu * cpus)
        ds = extract_dataset(
            ray.data.read_parquet(chunk, **read_kw),
            n_buckets=n_buckets, with_fields=with_fields, concurrency=concurrency,
        )
        ds.write_parquet(staged)
        stats = ckpt.part_stats(staged)
        manifest = {
            "part": pid,
            "input_files": chunk,
            "row_range": [0, stats["row_count"]],
            "extractor_version": EXTRACTOR_VERSION,
            "run_id": run_id,
            "committed_at_us": int(_time.time() * 1e6),
            **stats,
        }
        ckpt.commit_part(out_dir, run_id, pid, staged, manifest)
        return stats["row_count"]

    def guarded(pid_chunk):
        if not skip_failed_partitions:
            return pid_chunk[0], process(pid_chunk), None
        try:
            return pid_chunk[0], process(pid_chunk), None
        except Exception as exc:
            return pid_chunk[0], None, f"{type(exc).__name__}: {exc}"

    todo = [(pid, chunk) for pid, chunk in enumerate(partitions) if pid not in done]
    summary["skipped"] = len(partitions) - len(todo)
    summary["failed"] = []
    # Mutate the global block-size override immediately before the guarded
    # region so no exception path can leak it process-wide.
    _ctx = DataContext.get_current()
    _prev_block = _ctx.target_max_block_size
    try:
        if target_block_mb is not None:
            _ctx.target_max_block_size = target_block_mb * 1024 * 1024
        if todo:
            with ThreadPoolExecutor(max_workers=max_concurrent_partitions) as ex:
                for pid, rows, err in ex.map(guarded, todo):
                    if err is not None:
                        summary["failed"].append({"part": pid, "error": err})
                    else:
                        summary["committed"] += 1
                        summary["rows"] += rows
    finally:
        _ctx.target_max_block_size = _prev_block
    shutil.rmtree(os.path.join(staging_root, run_id), ignore_errors=True)
    return summary


def status_summary(extracted: ray.data.Dataset):
    """G3 — the one true dataset-level aggregation of the reference
    (grid_detector_v4.py:410-415): success/failure accounting."""
    return extracted.groupby("status").count()
