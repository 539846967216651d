"""Checkpoint manifests, resume filtering, per-partition lineage."""
