"""Dataset assembly: read -> extract -> fields -> write, and the driver-facing
query registry (queries/oracle_sql)."""
