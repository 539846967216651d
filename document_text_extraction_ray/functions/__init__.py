"""Pure per-document kernels (no Ray imports).

Every function here is deterministic and side-effect free; the same code runs
inside the single-process golden oracle used by tests and inside the Ray Data
``map_batches`` UDFs, which is what makes byte-identical extraction under
parallelism trivial (SURVEY.md §7.5 item 1).
"""
