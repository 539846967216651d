"""JSONL / CSV source-and-sink adapters (engine additions: the reference
reads folders of binary documents — S1; a web-scale corpus also arrives as
JSONL dumps and CSV manifests, so the engine needs both as first-class
Dataset sources).

Both writers are dataset-native (every block writes its own shard file —
no driver funnel); both readers are Ray's parallel readers with the
column pruning / schema the caller asks for.  Round-trip identity is
oracle-checked (`jsonl_roundtrip`, `csv_roundtrip`)."""

from __future__ import annotations

import os
import shutil

import ray.data


def write_jsonl(ds, path: str, clean: bool = True,
                compression: str | None = None) -> str:
    """Write a Dataset as JSON-Lines shards (one file per block).
    ``compression="gzip"`` writes gzipped shards (the CC-dump /
    web-corpus interchange layout) through arrow's output stream — each
    block still writes its own shard, no driver funnel."""
    if clean:
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    if compression:
        ds.write_json(path,
                      arrow_open_stream_args={"compression": compression})
    else:
        ds.write_json(path)
    return path


def read_jsonl(path: str, columns=None,
               compression: str | None = None) -> ray.data.Dataset:
    """Parallel JSONL read; prune to ``columns`` right after parse (the
    JSON reader has no column pushdown — pruning is a projection).
    Pass the writer's ``compression`` to read compressed shards."""
    if compression:
        ds = ray.data.read_json(
            path, arrow_open_stream_args={"compression": compression},
            file_extensions=None)
    else:
        ds = ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_csv(ds, path: str, clean: bool = True) -> str:
    """Write a Dataset as CSV shards (one file per block; header per
    shard; arrow CSV quoting, so embedded commas/quotes round-trip)."""
    if clean:
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    ds.write_csv(path)
    return path


def read_csv(path: str, columns=None) -> ray.data.Dataset:
    """Parallel CSV read.  CSV caveat (inherent to the format, not this
    reader): an EMPTY STRING field comes back as NULL — round-trip code
    that must distinguish them should ``fill_null("")`` after the read or
    use JSONL, which preserves the distinction."""
    ds = ray.data.read_csv(path)
    if columns:
        ds = ds.select_columns(columns)
    return ds
