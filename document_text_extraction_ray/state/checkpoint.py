"""Checkpointed, resumable Parquet output with per-partition lineage.

North-rule requirement (BASELINE.md "Resume gate"): one output partition per
url-hash bucket, each committed atomically with a lineage manifest (input
path, row counts, extractor version, commit time).  A killed-and-restarted
job skips committed buckets and produces the same final table.

Design (SURVEY.md §7.5 item 3 — sinks are at-least-once under retries):
  1. the run shuffles ONCE on the bucket key (``groupby("bucket")``) and each
     bucket-group task writes its own Parquet file(s) under a run-scoped
     staging prefix (``out/_staging/<run_id>/bucket=K/...``) AND computes its
     lineage stats in-task; task retries rewrite the same paths (idempotent);
     staging must be storage visible to the commit step (shared FS or object
     store on a real cluster);
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
    min_rows_per_file: int | None = None,
) -> dict:
    """Stream ``ds`` (must carry a ``bucket`` column) into checkpointed
    per-bucket Parquet under ``out_dir``; commit manifests; return summary.

    Idempotent: buckets already committed are never overwritten (their staged
    duplicates are discarded), so at-least-once task retries and job restarts
    both converge to exactly-once output.
    """
    import pyarrow as pa

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

    # One shuffle on the bucket key (the engine's single partitioning key);
    # each bucket-group task writes its own file AND computes its lineage
    # stats in-task — no per-file driver stat pass, no tiny-file explosion
    # (a naive write_parquet(partition_cols=...) fans every block into every
    # partition dir: blocks x buckets files).  Scale contract: one bucket
    # must fit in one task; size n_buckets so bucket ~ a few GB.
    stats_schema = pa.schema(
        [("bucket", pa.int32()), ("row_count", pa.int64()),
         ("ok_count", pa.int64()), ("total_chars", pa.int64()),
         ("n_files", pa.int32())]
    )

    def write_group(group: pa.Table) -> pa.Table:
        # The hash shuffle may dictionary-encode key columns in some groups;
        # decode so every committed file carries one uniform schema.
        for i, f in enumerate(group.schema):
            if pa.types.is_dictionary(f.type):
                group = group.set_column(
                    i, f.name, group.column(f.name).cast(f.type.value_type)
                )
        bucket = group.column("bucket")[0].as_py()
        bucket_dir = os.path.join(staging, f"bucket={bucket}")
        os.makedirs(bucket_dir, exist_ok=True)
        target = min_rows_per_file or group.num_rows
        n_files = 0
        for start in range(0, group.num_rows, target):
            pq.write_table(
                group.slice(start, target),
                os.path.join(bucket_dir, f"part-{n_files:05d}.parquet"),
            )
            n_files += 1
        ok = 0
        chars = 0
        if "status" in group.column_names:
            ok = pc.sum(
                pc.cast(pc.equal(group.column("status"), "ok"), "int64")
            ).as_py() or 0
        if "n_chars" in group.column_names:
            chars = pc.sum(group.column("n_chars")).as_py() or 0
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int32()),
                "row_count": pa.array([group.num_rows], pa.int64()),
                "ok_count": pa.array([ok], pa.int64()),
                "total_chars": pa.array([chars], pa.int64()),
                "n_files": pa.array([n_files], pa.int32()),
            },
            schema=stats_schema,
        )

    stats_rows = (
        ds.groupby("bucket")
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )

    committed_before = committed_buckets(out_dir)
    summary = {"committed": 0, "skipped": 0, "rows": 0}
    for row in sorted(stats_rows, key=lambda r: r["bucket"]):
        bucket = int(row["bucket"])
        src = os.path.join(staging, f"bucket={bucket}")
        if bucket in committed_before:
            shutil.rmtree(src, ignore_errors=True)
            summary["skipped"] += 1
            continue
        files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
        dst = os.path.join(out_dir, f"bucket={bucket}")
        if os.path.exists(dst):  # stale files from a crashed, uncommitted run
            shutil.rmtree(dst)
        os.rename(src, dst)
        manifest = {
            "bucket": bucket,
            "input_path": input_path,
            "files": [os.path.join(f"bucket={bucket}", f) for f in files],
            "row_count": int(row["row_count"]),
            "ok_count": int(row["ok_count"]),
            "error_count": int(row["row_count"]) - int(row["ok_count"]),
            "total_chars": int(row["total_chars"]),
            "extractor_version": extractor_version,
            "run_id": run_id,
            "committed_at_us": int(time.time() * 1e6),
        }
        tmp = _manifest_path(out_dir, bucket) + f".tmp.{run_id}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, _manifest_path(out_dir, bucket))
        summary["committed"] += 1
        summary["rows"] += int(row["row_count"])
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


def committed_parts(out_dir: str) -> set:
    """Committed input-shard partitions (sharded no-shuffle sink)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    return {
        int(n[len("part="): -len(".json")])
        for n in os.listdir(mdir)
        if n.startswith("part=") and n.endswith(".json")
    }


def commit_part(out_dir: str, run_id: str, part_id: int, staged_dir: str,
                manifest: dict) -> None:
    """Atomically promote a staged partition dir + write its manifest."""
    dst = os.path.join(out_dir, f"part={part_id}")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.rename(staged_dir, dst)
    path = os.path.join(out_dir, MANIFEST_DIR, f"part={part_id}.json")
    tmp = path + f".tmp.{run_id}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, path)


def part_stats(part_dir: str) -> dict:
    """Lineage stats from the written files (footers + two thin columns)."""
    files = sorted(
        os.path.join(part_dir, f) for f in os.listdir(part_dir)
        if f.endswith(".parquet")
    )
    rows = ok = chars = 0
    for f in files:
        rows += pq.read_metadata(f).num_rows
        t = pq.read_table(f, columns=["status", "n_chars"], partitioning=None)
        ok += pc.sum(pc.cast(pc.equal(t.column("status"), "ok"), "int64")).as_py() or 0
        chars += pc.sum(t.column("n_chars")).as_py() or 0
    return {
        "files": [os.path.basename(f) for f in files],
        "row_count": rows,
        "ok_count": ok,
        "error_count": rows - ok,
        "total_chars": chars,
    }


def committed_part_files(out_dir: str) -> list:
    files = []
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    for part in sorted(committed_parts(out_dir)):
        with open(os.path.join(mdir, f"part={part}.json")) as fh:
            m = json.load(fh)
        files.extend(
            os.path.join(out_dir, f"part={part}", f) for f in m["files"]
        )
    return files


def read_committed_table(out_dir: str, columns=None):
    """Read the committed table via the manifest file list.

    ``partitioning=None`` is required: the ``bucket=K`` directory names would
    otherwise be hive-inferred as a dictionary-typed ``bucket`` column,
    conflicting with the physical int32 column stored in the files."""
    return pq.read_table(committed_files(out_dir), columns=columns,
                         partitioning=None)


def read_committed_dataset(out_dir: str, columns=None):
    """Ray Dataset over the committed files (manifest-driven, resumable read).

    Unlike ``pq.read_table``, Ray's reader does not hive-infer partition
    columns from the ``bucket=K`` paths by default (and passing
    ``partitioning=None`` trips a Ray 2.49 UnboundLocalError), so no
    override is needed here."""
    import ray.data

    return ray.data.read_parquet(committed_files(out_dir), columns=columns)


def read_manifests(out_dir: str) -> list:
    """All committed manifests — bucket-keyed and part-keyed alike."""
    out = []
    for bucket in sorted(committed_buckets(out_dir)):
        with open(_manifest_path(out_dir, bucket)) as fh:
            out.append(json.load(fh))
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    for part in sorted(committed_parts(out_dir)):
        with open(os.path.join(mdir, f"part={part}.json")) as fh:
            out.append(json.load(fh))
    return out


def export_snapshot(out_dir: str, snap_dir: str) -> dict:
    """Publish a CONSISTENT zero-copy snapshot of the committed table:
    hardlink every committed data file and copy the manifest set into
    ``snap_dir`` (mirroring the layout, so ``read_committed_table(snap_dir)``
    and ``read_committed_dataset(snap_dir)`` work unchanged).

    Snapshot isolation on a plain filesystem: a later run that recommits a
    partition ``rmtree``s + renames the live part dir, but the hardlinked
    inodes keep the snapshot's bytes alive — readers of ``snap_dir`` see
    the table exactly as of export, forever (the Iceberg snapshot idea
    without a table format: manifests ARE the snapshot spec, hardlinks
    make the data files immutable from the snapshot's viewpoint).
    Falls back to a byte copy where hardlinks are unsupported.

    Returns {"files": n, "rows": total} for the exported manifest set."""
    os.makedirs(os.path.join(snap_dir, MANIFEST_DIR), exist_ok=True)
    files = committed_files(out_dir) + committed_part_files(out_dir)
    rows = 0
    for src in files:
        rel = os.path.relpath(src, out_dir)
        dst = os.path.join(snap_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        if os.path.exists(dst):
            os.remove(dst)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)
        rows += pq.read_metadata(dst).num_rows
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            shutil.copy2(os.path.join(mdir, name),
                         os.path.join(snap_dir, MANIFEST_DIR, name))
    return {"files": len(files), "rows": rows}
