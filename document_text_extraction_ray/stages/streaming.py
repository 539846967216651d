"""Incremental stateful streaming over an ordered log: one @ray.remote actor
per key-hash bucket, fed batches in timestamp order (ray_guide
"Streaming-shaped workloads" — the one shape where the Dataset API genuinely
cannot express the semantics, so raw actors are the documented last resort).

Ordering contract: the INPUT stream must arrive time-ordered (here enforced
with a dataset-level sort, since Ray Data batches are otherwise unordered);
each actor then sees its keys' events in ts order and maintains open-session
state across batches — the behavior a true streaming job would have with
watermarked partitions.

The batch equivalent (`stages/windows.sessionize`) produces identical output
(tested); the streaming form exists for incremental/continuous semantics:
actors can be queried mid-stream for OPEN sessions, which no batch groupby
can express.

Two forms: ``streaming_sessionize_partitioned`` (production shape — one
pump task per key-hash bucket of a partitioned parquet layout, no data
through the driver) and ``streaming_sessionize`` (single-stream demo — the
driver routes batches; keeps the strict global-arrival-order semantics a
single ingest point implies).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


@ray.remote
class SessionActor:
    """Holds open-session state for one key-hash bucket."""

    def __init__(self, gap_s: int):
        self.gap_s = gap_s
        self.open: dict = {}       # key -> [start_s, last_s, n_events]
        self.closed: list = []

    def ingest(self, keys, secs) -> int:
        """Consume a time-ordered slice of (key, epoch-sec) events."""
        for key, sec in zip(keys, secs):
            sec = int(sec)
            state = self.open.get(key)
            if state is None:
                self.open[key] = [sec, sec, 1]
            elif sec - state[1] > self.gap_s:
                self.closed.append((key, state[0], state[1], state[2]))
                self.open[key] = [sec, sec, 1]
            else:
                state[1] = sec
                state[2] += 1
        return len(self.closed)

    def open_sessions(self) -> list:
        """Mid-stream introspection: sessions not yet closed by a gap."""
        return [(k, s[0], s[1], s[2]) for k, s in sorted(self.open.items())]

    def finalize(self) -> list:
        out = list(self.closed)
        out.extend((k, s[0], s[1], s[2]) for k, s in self.open.items())
        self.open.clear()
        self.closed = []
        return out


def streaming_sessionize_partitioned(bucket_paths, ts_col: str, key_col: str,
                                     gap_s: int = 1800,
                                     batch_size: int = 4096) -> pd.DataFrame:
    """Incremental sessionization with NO driver data path — the
    production-shaped form of ``streaming_sessionize``.

    ``bucket_paths`` is a key-hash-partitioned parquet layout (one path per
    bucket — exactly what the engine's bucketed checkpoint sink writes):
    every key's events live wholly in one bucket, so each bucket gets its
    own remote PUMP task that reads its shard, time-orders it, and feeds
    its own ``SessionActor`` in ordered slices.  All data moves
    pump->actor inside the cluster; the driver only collects the final
    (small) session table.  Mid-stream ``open_sessions`` queries still
    work per actor.  Output equals ``windows.sessionize`` (tested)."""
    actors = [SessionActor.remote(gap_s) for _ in bucket_paths]

    @ray.remote
    def pump(path, actor) -> int:
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=[key_col, ts_col])
        secs = (
            t.column(ts_col).to_pandas().to_numpy()
            .astype("datetime64[s]").astype("int64")
        )
        keys = t.column(key_col).to_pandas().to_numpy()
        order = np.argsort(secs, kind="stable")
        keys, secs = keys[order], secs[order]
        sent = []
        for lo in range(0, len(secs), batch_size):
            sent.append(actor.ingest.remote(
                keys[lo: lo + batch_size].tolist(),
                secs[lo: lo + batch_size].tolist(),
            ))
        ray.get(sent)
        return len(secs)

    ray.get([pump.remote(p, a) for p, a in zip(bucket_paths, actors)])
    rows = []
    for chunk in ray.get([a.finalize.remote() for a in actors]):
        rows.extend(chunk)
    for a in actors:
        ray.kill(a)
    df = pd.DataFrame(rows, columns=[key_col, "session_start_s",
                                     "session_end_s", "n_events"])
    return df.sort_values([key_col, "session_start_s"]).reset_index(drop=True)


def streaming_sessionize(ds, ts_col: str, key_col: str, gap_s: int = 1800,
                         n_actors: int = 8, batch_size: int = 4096) -> pd.DataFrame:
    """Gap-based sessions computed INCREMENTALLY by keyed stateful actors.

    Pipeline: dataset sort by ts (the ordering the log is assumed to have) ->
    stream batches through the driver -> route rows to bucket actors by key
    hash (ingests are async; per-actor ordering is preserved because sends
    happen in stream order and Ray orders calls per actor-pair).  Returns the
    closed+final sessions as a DataFrame (key, session_start_s, session_end_s,
    n_events) equal to the batch `sessionize` output."""
    actors = [SessionActor.remote(gap_s) for _ in range(n_actors)]
    pending = []
    for batch in (
        ds.select_columns([key_col, ts_col])
        .sort(ts_col)
        .iter_batches(batch_size=batch_size, batch_format="pandas")
    ):
        secs = batch[ts_col].to_numpy().astype("datetime64[s]").astype("int64")
        keys = batch[key_col].to_numpy()
        if keys.dtype == object:
            import zlib

            buckets = np.asarray(
                [zlib.crc32(str(k).encode()) % n_actors for k in keys],
                dtype=np.int64,
            )
        else:
            buckets = (
                (keys.astype(np.uint64) * np.uint64(2654435761))
                % np.uint64(n_actors)
            ).astype(np.int64)
        for b in range(n_actors):
            mask = buckets == b
            if mask.any():
                pending.append(actors[b].ingest.remote(keys[mask].tolist(),
                                                       secs[mask].tolist()))
    ray.get(pending)  # drain
    rows = []
    for chunk in ray.get([a.finalize.remote() for a in actors]):
        rows.extend(chunk)
    for a in actors:
        ray.kill(a)
    df = pd.DataFrame(rows, columns=[key_col, "session_start_s",
                                     "session_end_s", "n_events"])
    return df.sort_values([key_col, "session_start_s"]).reset_index(drop=True)


def late_event_stats(ds, key_col: str, ts_col: str, order_col: str,
                     allowed_lateness_s: int = 60):
    """EVENT-TIME vs ARRIVAL-ORDER accounting (the watermark half of
    streaming semantics the batch windows don't exercise): replaying the
    stream in arrival order (``order_col`` — ingestion sequence), the
    per-key WATERMARK is the running max event time; an event whose
    event time sits more than ``allowed_lateness_s`` behind the
    watermark at its arrival would be dropped/sided by a streaming
    engine.  Returns per-key (n_events, n_late, max_lateness_s) — the
    report that sizes allowed-lateness before moving a pipeline from
    batch to streaming.

    One bucketed shuffle on the key; per-key sorted cummax fold,
    deterministic because ``order_col`` is a total order."""
    import numpy as np
    import pandas as pd

    from .aggregate import bucketed_map_groups

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        us = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        wm = np.maximum.accumulate(us)
        late_by = wm - us          # >= 0; how far behind the watermark
        late = late_by > allowed_lateness_s * 1_000_000
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "n_events": np.array([len(g)], np.int64),
            "n_late": np.array([int(late.sum())], np.int64),
            "max_lateness_s": np.array([int(late_by.max() // 1_000_000)],
                                       np.int64),
        })

    return bucketed_map_groups(
        ds.select_columns([key_col, ts_col, order_col]), key_col, fold)
