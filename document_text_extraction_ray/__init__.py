"""Ray-Data-native main-content extraction engine.

A brand-new engine (not a port) with the data-processing capabilities of the
reference repo ``pavindranvelalagan/Document-Text-Extraction`` (see SURVEY.md),
re-expressed for web-scale corpora: streaming ``ray.data.Dataset`` pipelines
over zero-copy Arrow batches of a Common-Crawl-style Parquet table
``(url, warc_ts, html, text, lang)``.

Layout:
  functions/   pure, deterministic per-document kernels (the golden oracle AND
               the pipeline UDF bodies are the same code => byte-identity for free)
  stages/      map_batches UDFs / actor-pool callables wrapping the kernels
  sources/     corpus readers + deterministic synthetic corpus generation
  pipelines/   Dataset assembly (read -> extract -> fields -> write) and the
               driver-facing query registry
  state/       checkpoint manifests, resume filtering, lineage metadata
"""

__version__ = "0.1.0"
