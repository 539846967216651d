"""Explicit pyarrow schemas for every pipeline stage (SURVEY.md §1.2).

The reference keeps schema implicit in per-script dict shapes; here each stage
declares its Arrow schema once and tests assert it.  ``large_*`` types
everywhere a column can exceed 2 GiB per block at 100 TB scale
(SURVEY.md §7.5 item 6).
"""

from __future__ import annotations

import pyarrow as pa

# Corpus input (BASELINE.json input_hint).
CORPUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

SPAN_TYPE = pa.struct(
    [("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())]
)

FIELDS_TYPE = pa.struct(
    [
        ("emails", pa.list_(pa.string())),
        ("phones", pa.list_(pa.string())),
        ("linkedin", pa.list_(pa.string())),
        ("github", pa.list_(pa.string())),
        ("skills", pa.list_(pa.string())),
        ("degrees", pa.list_(pa.string())),
        ("gpa", pa.list_(pa.string())),
    ]
)

# Output of the extraction stage. In-band error convention preserved from the
# reference (approach4_v1.py:236-243): status/error columns, batch never dies.
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("bucket", pa.int32()),           # url-hash partition (state/checkpoint.py)
        ("extracted_text", pa.large_string()),
        ("spans", pa.large_list(SPAN_TYPE)),
        ("title", pa.string()),
        ("n_blocks", pa.int32()),
        ("n_chars", pa.int64()),
        ("html_bytes", pa.int64()),
        ("status", pa.string()),          # "ok" | "error"
        ("error", pa.string()),
    ]
)

# After the field-extraction stage.
FIELDS_SCHEMA = EXTRACTED_SCHEMA.append(pa.field("fields", FIELDS_TYPE))

GOLDEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("expected_text", pa.large_string()),
        ("expected_spans", pa.large_list(SPAN_TYPE)),
        ("expected_fields", FIELDS_TYPE),
    ]
)

MANIFEST_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("input_path", pa.string()),
        ("row_count", pa.int64()),
        ("ok_count", pa.int64()),
        ("error_count", pa.int64()),
        ("total_chars", pa.int64()),
        ("extractor_version", pa.string()),
        ("committed_at_us", pa.int64()),
    ]
)
