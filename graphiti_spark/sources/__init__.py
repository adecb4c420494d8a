"""Sources/sinks: parquet tables with Iceberg upgrade path, checkpoints."""
