"""Checkpointed, resumable Parquet output with per-partition lineage.

North-rule requirement (BASELINE.md "Resume gate"): one output partition per
url-hash bucket, each committed atomically with a lineage manifest (input
path, row counts, extractor version, commit time).  A killed-and-restarted
job skips committed buckets and produces the same final table.

Design (SURVEY.md §7.5 item 3 — sinks are at-least-once under retries):
  1. the run writes ALL output under a run-scoped staging prefix
     (``out/_staging/<run_id>/bucket=K/...``) via a streaming
     ``write_parquet(partition_cols=["bucket"])`` — no extra shuffle, blocks
     fan into partition dirs as they stream;
  2. after the sink completes, each staged bucket dir is committed by a
     driver-side atomic rename into ``out/bucket=K`` plus an atomically
     renamed manifest JSON.  **The manifest directory is the source of
     truth**, never a directory listing: files from a crashed run sit in
     staging and are ignored (and swept by the next run).
  3. resume = read manifests -> committed bucket set -> vectorized
     ``pc.is_in`` anti-filter inside map_batches (bucket pruning, no shuffle).

On an object store (S3-style, no atomic rename) step 2 becomes
"manifest lists the staged file keys" — the manifest-as-truth protocol is
unchanged; only the rename is replaced.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow.compute as pc
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifests"
STAGING_DIR = "_staging"


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"bucket={bucket}.json")


def committed_buckets(out_dir: str) -> set:
    """Buckets with a committed manifest (the only definition of 'done')."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("bucket=") and name.endswith(".json"):
            out.add(int(name[len("bucket="): -len(".json")]))
    return out


def make_resume_filter(out_dir: str):
    """Vectorized batch filter dropping rows of already-committed buckets.

    Apply *after* the bucket column exists:
    ``ds.map_batches(make_resume_filter(out), batch_format="pyarrow")``.
    The committed set is captured once in the task closure (broadcast with the
    function, never re-shipped per batch).
    """
    import pyarrow as pa

    committed = pa.array(sorted(committed_buckets(out_dir)), type=pa.int32())

    def _filter(batch):
        if len(committed) == 0:
            return batch
        mask = pc.is_in(pc.cast(batch.column("bucket"), pa.int32()),
                        value_set=committed)
        return batch.filter(pc.invert(mask))

    return _filter


def write_bucketed(
    ds,
    out_dir: str,
    run_id: str,
    input_path: str,
    extractor_version: str,
    min_rows_per_file: int = 50_000,
) -> dict:
    """Stream ``ds`` (must carry a ``bucket`` column) into checkpointed
    per-bucket Parquet under ``out_dir``; commit manifests; return summary.

    Idempotent: buckets already committed are never overwritten (their staged
    duplicates are discarded), so at-least-once task retries and job restarts
    both converge to exactly-once output.
    """
    staging_root = os.path.join(out_dir, STAGING_DIR)
    staging = os.path.join(staging_root, run_id)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    # Sweep staging left by crashed runs (single-writer protocol: only one
    # job writes a given out_dir at a time — standard for checkpoint sinks).
    if os.path.isdir(staging_root):
        for stale in os.listdir(staging_root):
            if stale != run_id:
                shutil.rmtree(os.path.join(staging_root, stale), ignore_errors=True)
    os.makedirs(staging, exist_ok=True)

    ds.write_parquet(staging, partition_cols=["bucket"],
                     min_rows_per_file=min_rows_per_file)

    committed_before = committed_buckets(out_dir)
    summary = {"committed": 0, "skipped": 0, "rows": 0}
    for name in sorted(os.listdir(staging)):
        if not name.startswith("bucket="):
            continue
        bucket = int(name.split("=", 1)[1])
        src = os.path.join(staging, name)
        if bucket in committed_before:
            shutil.rmtree(src, ignore_errors=True)
            summary["skipped"] += 1
            continue
        # Lineage stats from Parquet footers + the status column only
        # (columnar projection — cheap relative to the payload columns).
        files = sorted(
            os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
        )
        row_count = ok_count = total_chars = 0
        for f in files:
            row_count += pq.read_metadata(f).num_rows
            t = pq.read_table(f, columns=["status", "n_chars"])
            ok_count += pc.sum(
                pc.cast(pc.equal(t.column("status"), "ok"), "int64")
            ).as_py() or 0
            total_chars += pc.sum(t.column("n_chars")).as_py() or 0

        dst = os.path.join(out_dir, f"bucket={bucket}")
        if os.path.exists(dst):  # stale files from a crashed, uncommitted run
            shutil.rmtree(dst)
        os.rename(src, dst)
        manifest = {
            "bucket": bucket,
            "input_path": input_path,
            "files": [os.path.join(f"bucket={bucket}", os.path.basename(f)) for f in files],
            "row_count": row_count,
            "ok_count": ok_count,
            "error_count": row_count - ok_count,
            "total_chars": total_chars,
            "extractor_version": extractor_version,
            "run_id": run_id,
            "committed_at_us": int(time.time() * 1e6),
        }
        tmp = _manifest_path(out_dir, bucket) + f".tmp.{run_id}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, _manifest_path(out_dir, bucket))
        summary["committed"] += 1
        summary["rows"] += row_count
    shutil.rmtree(os.path.join(out_dir, STAGING_DIR, run_id), ignore_errors=True)
    return summary


def committed_files(out_dir: str) -> list:
    """The exact file list of the committed table (manifest-driven read)."""
    files = []
    for bucket in sorted(committed_buckets(out_dir)):
        with open(_manifest_path(out_dir, bucket)) as fh:
            m = json.load(fh)
        files.extend(os.path.join(out_dir, rel) for rel in m["files"])
    return files


def read_manifests(out_dir: str) -> list:
    out = []
    for bucket in sorted(committed_buckets(out_dir)):
        with open(_manifest_path(out_dir, bucket)) as fh:
            out.append(json.load(fh))
    return out
