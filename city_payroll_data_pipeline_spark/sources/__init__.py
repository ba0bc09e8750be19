"""Sources & sinks: CSV/parquet readers, tenant storage, writers."""
