"""map_batches UDFs (stateless tasks and actor-pool callables) over Arrow batches."""
