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
