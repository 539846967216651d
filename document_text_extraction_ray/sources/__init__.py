"""Corpus sources: Parquet readers and deterministic synthetic generation."""
