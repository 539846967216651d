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


def write_arrow_ipc(ds, path: str, clean: bool = True) -> str:
    """Write a Dataset as Arrow IPC STREAM shards (one `.arrows` file per
    block, written dataset-natively via a map_batches side effect — Ray
    has no IPC sink; the pattern matches the bucketed-storage writer).
    The zero-parse interchange format: a reader mmaps straight to typed
    arrays, no decode step — the right layout for engine-to-engine
    hand-offs (Ray <-> DuckDB <-> polars all read it natively)."""
    import uuid

    import pyarrow as pa
    import pyarrow.ipc as ipc

    if clean:
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows:
            f = os.path.join(path, f"part-{uuid.uuid4().hex}.arrows")
            with ipc.new_stream(f, t.schema) as w:
                w.write_table(t)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    # consume the side-effect map; the tiny count table forces execution
    ds.map_batches(dump, batch_format="pyarrow").materialize()
    return path


def read_arrow_ipc(path: str, columns=None) -> ray.data.Dataset:
    """Parallel Arrow IPC read: one task per shard opens the stream
    zero-copy; column pruning is a projection after load (IPC streams
    have no column pushdown — use parquet when you need it)."""
    import pyarrow.ipc as ipc

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".arrows"))

    import ray

    @ray.remote
    def read_one(f):
        with ipc.open_stream(f) as r:
            t = r.read_all()
        return t if columns is None else t.select(columns)

    # from_arrow_refs: the shard tables stay in the OBJECT STORE (one ref
    # per file, read in parallel) — never driver-materialized.
    return ray.data.from_arrow_refs([read_one.remote(f) for f in files])


def write_orc(ds, path: str, clean: bool = True) -> str:
    """Write a Dataset as ORC shards (one ``.orc`` file per block,
    dataset-native side-effect write — Ray has no ORC sink): the
    Hive/Trino-ecosystem columnar interchange, with stripe-level
    statistics and real column projection on read — the format bridge
    for warehouses that don't speak parquet."""
    import uuid

    import pyarrow as pa
    from pyarrow import orc

    if clean:
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows:
            f = os.path.join(path, f"part-{uuid.uuid4().hex}.orc")
            orc.write_table(t, f)
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    ds.map_batches(dump, batch_format="pyarrow").materialize()
    return path


def read_orc(path: str, columns=None) -> ray.data.Dataset:
    """Parallel ORC read: one task per shard; ``columns`` prunes at the
    ORC reader (real pushdown, unlike the IPC stream source) so only the
    selected column streams leave storage."""
    from pyarrow import orc  # noqa: F401  (import check before remote)

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".orc"))

    import ray

    @ray.remote
    def read_one(f):
        from pyarrow import orc as _orc

        return _orc.ORCFile(f).read(columns=columns)

    return ray.data.from_arrow_refs([read_one.remote(f) for f in files])
